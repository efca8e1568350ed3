"""Core dense image operations as statically-shaped JAX/XLA ops.

These replace the OpenCV primitives the reference leans on throughout
DynaDetect and ORBextractor (``cv::GaussianBlur``, ``cv::medianBlur``,
``cv::dilate``/``erode``, ``cv::resize``, ``cv::remap``/warping, Scharr/Sobel
gradients). Everything is pure, jit-friendly, and fuses into the surrounding
XLA graph; image layout is (H, W) or (H, W, C) float32 unless noted.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax


def rgb_to_gray(rgb: jnp.ndarray) -> jnp.ndarray:
    """uint8/float (H, W, 3) RGB -> float32 (H, W) grayscale in [0, 255].

    Uses the BT.601 weights OpenCV's ``cvtColor(RGB2GRAY)`` uses, so flow /
    FAST operate on the same intensities as the reference.
    """
    rgb = rgb.astype(jnp.float32)
    return rgb[..., 0] * 0.299 + rgb[..., 1] * 0.587 + rgb[..., 2] * 0.114


def _gaussian_kernel1d(sigma: float, ksize: int) -> jnp.ndarray:
    if sigma <= 0:
        # OpenCV convention: sigma from ksize
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = jnp.arange(ksize, dtype=jnp.float32) - (ksize - 1) / 2.0
    k = jnp.exp(-(x * x) / (2.0 * sigma * sigma))
    return k / jnp.sum(k)


def _sep_conv2d(img: jnp.ndarray, ky: jnp.ndarray, kx: jnp.ndarray) -> jnp.ndarray:
    """Separable 2-D convolution with replicate padding on an (H, W) image.

    Implemented as shift-and-add (k_y + k_x weighted shifted copies, pure VPU
    element-wise work). A single-channel ``lax.conv`` lowers to an MXU matmul
    with channel dim 1 — >97% of the systolic array idles and a 7-tap blur
    on a 1.5 Mpx image measured 11.9 ms vs ~0.5 ms for this formulation.
    """
    h, w = img.shape
    ry = ky.shape[0] // 2
    rx = kx.shape[0] // 2
    xp = jnp.pad(img, ((ry, ry), (0, 0)), mode="edge")
    out = ky[0] * xp[0:h, :]
    for i in range(1, ky.shape[0]):
        out = out + ky[i] * xp[i:i + h, :]
    xp = jnp.pad(out, ((0, 0), (rx, rx)), mode="edge")
    out = kx[0] * xp[:, 0:w]
    for i in range(1, kx.shape[0]):
        out = out + kx[i] * xp[:, i:i + w]
    return out


def gaussian_blur(img: jnp.ndarray, ksize: int = 7, sigma: float = 0.0) -> jnp.ndarray:
    """Separable Gaussian blur with replicate borders, (H, W) or (H, W, C)."""
    k = _gaussian_kernel1d(sigma, ksize)
    if img.ndim == 3:
        return jnp.stack([_sep_conv2d(img[..., c], k, k) for c in range(img.shape[-1])], axis=-1)
    return _sep_conv2d(img, k, k)


def box_filter(img: jnp.ndarray, ksize: int) -> jnp.ndarray:
    """Normalized box filter (mean) with replicate borders."""
    k = jnp.full((ksize,), 1.0 / ksize, dtype=jnp.float32)
    return _sep_conv2d(img, k, k)


def _stride_sel(n_out: int, n_in: int, stride: int, width: int = 1
                ) -> jnp.ndarray:
    """(n_out, n_in) f32 selection matrix: row i has ones at columns
    i*stride .. i*stride+width-1 (built from iota comparisons — no gathers)."""
    cols = jnp.arange(n_in)[None, :]
    lo = (jnp.arange(n_out) * stride)[:, None]
    return ((cols >= lo) & (cols < lo + width)).astype(jnp.float32)


def subsample(x: jnp.ndarray, stride: int = 2, _force_mm: bool = False
              ) -> jnp.ndarray:
    """Exact ``x[::stride, ::stride]`` without TPU gather kernels.

    On this TPU runtime a strided slice of a tiled 2-D array lowers to a
    scalar-unit point gather (~10 ns/element: 0.8 ms per 240x320 slice —
    the r3 trace showed ~10 ms/frame of these across rag/fuse). Two one-hot
    selection matmuls produce the identical result on the MXU in ~µs.
    Exact for bool/int and for f32 (one nonzero per row at HIGHEST: the
    product 1.0*v and a single-term sum are exact). ``_force_mm`` runs the
    matmul path on any backend (parity tests).
    """
    h, w = x.shape
    h2, w2 = -(-h // stride), -(-w // stride)
    if jax.default_backend() != "tpu" and not _force_mm:
        return x[::stride, ::stride]
    sr = _stride_sel(h2, h, stride)
    sc = _stride_sel(w2, w, stride)
    y = jnp.matmul(jnp.matmul(sr, x.astype(jnp.float32),
                              precision=lax.Precision.HIGHEST), sc.T,
                   precision=lax.Precision.HIGHEST)
    if x.dtype == jnp.bool_:
        return y > 0.5
    if jnp.issubdtype(x.dtype, jnp.integer):
        return jnp.round(y).astype(x.dtype)
    return y.astype(x.dtype)


def block_or2(x: jnp.ndarray, _force_mm: bool = False) -> jnp.ndarray:
    """2x2 block OR of a bool image (== the OR of its four phase slices),
    gather-free: 2-hot selection matmuls count the true cells per block."""
    h, w = x.shape
    h2, w2 = -(-h // 2), -(-w // 2)
    if jax.default_backend() != "tpu" and not _force_mm:
        p = jnp.pad(x, ((0, h2 * 2 - h), (0, w2 * 2 - w)))
        return p[::2, ::2] | p[1::2, ::2] | p[::2, 1::2] | p[1::2, 1::2]
    sr = _stride_sel(h2, h, 2, width=2)
    sc = _stride_sel(w2, w, 2, width=2)
    y = jnp.matmul(jnp.matmul(sr, x.astype(jnp.float32),
                              precision=lax.Precision.HIGHEST), sc.T,
                   precision=lax.Precision.HIGHEST)
    return y > 0.5


def resize_bilinear(img: jnp.ndarray, shape: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize to (H', W'); channels preserved."""
    out_shape = shape + img.shape[2:]
    return jax.image.resize(img.astype(jnp.float32), out_shape, method="linear")


def resize_area(img: jnp.ndarray, shape: Tuple[int, int]) -> jnp.ndarray:
    """Area-averaging downsample (cv::INTER_AREA-like) — best for pyramids."""
    h, w = img.shape[:2]
    nh, nw = shape
    if h % nh == 0 and w % nw == 0:
        fy, fx = h // nh, w // nw
        x = img.reshape((nh, fy, nw, fx) + img.shape[2:])
        return x.mean(axis=(1, 3))
    return jax.image.resize(img.astype(jnp.float32), shape + img.shape[2:], method="linear")


def warp_bilinear(img: jnp.ndarray, coords_y: jnp.ndarray, coords_x: jnp.ndarray,
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample ``img`` (H, W) at float coords; returns (samples, in-bounds mask).

    Out-of-bounds coordinates are clamped (samples stay finite); the mask marks
    pixels whose *unclamped* sample window was fully inside. This is the warp
    used by the variational-flow solver (image2 warped by current flow) and by
    reprojection checks.
    """
    h, w = img.shape[:2]
    inb = (coords_y >= 0) & (coords_y <= h - 1) & (coords_x >= 0) & (coords_x <= w - 1)
    cy = jnp.clip(coords_y, 0.0, h - 1.0)
    cx = jnp.clip(coords_x, 0.0, w - 1.0)
    y0 = jnp.floor(cy).astype(jnp.int32)
    x0 = jnp.floor(cx).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    fy = cy - y0.astype(cy.dtype)
    fx = cx - x0.astype(cx.dtype)

    flat = img.reshape(h * w, *img.shape[2:])

    # single combined gather for all four taps (one gather kernel instead of
    # four — gathers dominate the flow solver's cost on TPU)
    idx4 = jnp.stack([y0 * w + x0, y0 * w + x1, y1 * w + x0, y1 * w + x1],
                     axis=-1)                                   # (..., 4)
    taps = jnp.take(flat, idx4.reshape(-1), axis=0).reshape(idx4.shape + img.shape[2:])
    v00, v01, v10, v11 = (taps[..., 0], taps[..., 1], taps[..., 2], taps[..., 3]) \
        if img.ndim == 2 else (taps[..., 0, :], taps[..., 1, :],
                               taps[..., 2, :], taps[..., 3, :])
    if img.ndim == 3:
        fy = fy[..., None]
        fx = fx[..., None]
    out = (v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx
           + v10 * fy * (1 - fx) + v11 * fy * fx)
    return out, inb


def warp_by_flow(img: jnp.ndarray, flow_u: jnp.ndarray, flow_v: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Backward-warp: sample img at (y + v, x + u)."""
    h, w = img.shape[:2]
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    return warp_bilinear(img, ys + flow_v, xs + flow_u)


def warp_by_flow_mm(img: jnp.ndarray, flow_u: jnp.ndarray, flow_v: jnp.ndarray,
                    precision=lax.Precision.HIGH,
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gather-free bilinear backward-warp via one-hot matmuls (MXU).

    XLA point-gathers on TPU cost ~9 ns/index (scalar-unit bound): the
    4-corner gather warp runs ~3.8 ms at 288x384 and dominates the whole
    variational-flow solve. This formulation replaces the gather with two
    dense contractions that ride the MXU/VPU (~0.45 ms, 8x):

      G[i,j,m]  = sum_k Wy[i,j,k] * img[k,m]     (vertical interpolation of
                                                  EVERY column at y(i,j))
      out[i,j]  = sum_m Wx[i,j,m] * G[i,j,m]     (horizontal pick+lerp)

    Wy/Wx are two-entry-per-row one-hot interpolation weights built from
    iota comparisons; XLA fuses their construction into the contractions so
    the (H, W, max(H, W)) tensors never hit HBM at full cost. The vertical
    contraction runs at Precision.HIGH (bf16_3x): plain bf16 passes rounded
    the [0, 1] working images by ~0.4% per warp, which fed the flow data
    term every outer iteration and cost 1.4% dyn-mask IoU vs CPU (r5
    measured TPU 0.715 -> 0.729 = CPU parity at HIGH, -2.1 ms/frame).
    Still image-grade, not geometry-grade — use for images.

    Matches warp_by_flow semantics: clamped sampling + in-bounds mask.
    """
    h, w = img.shape
    ys = jnp.arange(h, dtype=jnp.float32)[:, None] + flow_v
    xs = jnp.arange(w, dtype=jnp.float32)[None, :] + flow_u
    inb = (ys >= 0) & (ys <= h - 1) & (xs >= 0) & (xs <= w - 1)
    cy = jnp.clip(ys, 0.0, h - 1.0)
    cx = jnp.clip(xs, 0.0, w - 1.0)
    y0 = jnp.floor(cy).astype(jnp.int32)
    x0 = jnp.floor(cx).astype(jnp.int32)
    fy = cy - y0
    fx = cx - x0

    k = jnp.arange(h, dtype=jnp.int32)
    wy = ((k[None, None, :] == y0[:, :, None]).astype(jnp.float32)
          * (1 - fy[:, :, None])
          + (k[None, None, :] == y0[:, :, None] + 1).astype(jnp.float32)
          * fy[:, :, None])                                   # (H, W, H)
    g = jnp.einsum("ijk,km->ijm", wy, img,
                   precision=precision)                       # (H, W, W)
    m = jnp.arange(w, dtype=jnp.int32)
    wx = ((m[None, None, :] == x0[:, :, None]).astype(jnp.float32)
          * (1 - fx[:, :, None])
          + (m[None, None, :] == x0[:, :, None] + 1).astype(jnp.float32)
          * fx[:, :, None])                                   # (H, W, W)
    out = jnp.sum(wx * g, axis=-1)
    return out, inb


def median_filter(img: jnp.ndarray, ksize: int = 5) -> jnp.ndarray:
    """ksize x ksize median with replicate borders (cv::medianBlur parity on
    interior pixels). The 3x3 case — the flow solver's per-outer-iteration
    stabilizer, ~80 calls/frame — uses Paeth's 19-exchange median-of-9
    min/max network (pure VPU element-wise ops, ~10x cheaper than the sort
    jnp.median lowers to); larger kernels fall back to the sorted stack."""
    r = ksize // 2
    p = jnp.pad(img, ((r, r), (r, r)), mode="edge")
    h, w = img.shape
    vals = [p[dy:dy + h, dx:dx + w]
            for dy in range(ksize) for dx in range(ksize)]
    if ksize == 3:
        v = vals

        def ex(i, j):
            lo = jnp.minimum(v[i], v[j])
            hi = jnp.maximum(v[i], v[j])
            v[i], v[j] = lo, hi

        ex(1, 2); ex(4, 5); ex(7, 8)
        ex(0, 1); ex(3, 4); ex(6, 7)
        ex(1, 2); ex(4, 5); ex(7, 8)
        ex(0, 3); ex(5, 8); ex(4, 7)
        ex(3, 6); ex(1, 4); ex(2, 5)
        ex(4, 7); ex(4, 2); ex(6, 4)
        ex(4, 2)
        return v[4]
    return _median_network(vals)


def _oddeven_pairs(n: int):
    """Batcher odd-even mergesort comparator list for n a power of two."""
    pairs = []

    def merge(lo, m, r):
        step = r * 2
        if step < m:
            merge(lo, m, step)
            merge(lo + r, m, step)
            pairs.extend((i, i + r) for i in range(lo + r, lo + m - r, step))
        else:
            pairs.append((lo, lo + r))

    def sort(lo, m):
        if m > 1:
            half = m // 2
            sort(lo, half)
            sort(lo + half, half)
            merge(lo, m, 1)

    sort(0, n)
    return pairs


def _median_network(vals):
    """Exact median of an odd-length list of same-shape arrays as a pruned
    min/max selection network (bit-identical to sorting and indexing the
    middle element).

    ``jnp.median`` lowers to a full 25-way per-pixel SORT on TPU (1.2 ms at
    640x480 for the 5x5 depth median, r3 trace); the pruned network is ~100
    element-wise min/max ops that XLA fuses into a couple of VPU kernels.
    Construction: Batcher's odd-even mergesort on the next power of two,
    +inf padding wires folded symbolically (min(x, inf) = x), then a
    backward sweep keeps only comparators the median output depends on.
    """
    k = len(vals)
    assert k % 2 == 1
    n = 1
    while n < k:
        n *= 2
    INF = -1  # symbolic +infinity wire value
    wires = list(range(k)) + [INF] * (n - k)
    nodes = []  # (op, a, b) with op in {"min", "max"}; ids offset by k
    for i, j in _oddeven_pairs(n):
        a, b = wires[i], wires[j]
        if b == INF:
            continue                       # min->a, max->inf: no-op
        if a == INF:
            wires[i], wires[j] = b, INF    # swap; j holds +inf again
            continue
        nodes.append(("min", a, b))
        wires[i] = k + len(nodes) - 1
        nodes.append(("max", a, b))
        wires[j] = k + len(nodes) - 1
    target = wires[k // 2]                 # median of the k real inputs
    # backward reachability: emit only nodes the median depends on
    needed = set()
    stack = [target]
    while stack:
        v = stack.pop()
        if v < k or v in needed:
            continue
        needed.add(v)
        _op, a, b = nodes[v - k]
        stack.extend((a, b))
    memo = {}

    def emit(v):
        if v < k:
            return vals[v]
        if v not in memo:
            op, a, b = nodes[v - k]
            f = jnp.minimum if op == "min" else jnp.maximum
            memo[v] = f(emit(a), emit(b))
        return memo[v]

    return emit(target)


def _window_extreme_1d(x: jnp.ndarray, k: int, axis: int, op, fill
                       ) -> jnp.ndarray:
    """Centered sliding-window max/min of width k along one axis.

    Log-doubling shift chain (ceil(log2 k)+1 element-wise passes) —
    ``lax.reduce_window`` lowers poorly on TPU (measured ~1.7 ns/px for a
    3x3 max vs ~0.1 ns/px for shift chains)."""
    if k <= 1:
        return x
    n = x.shape[axis]
    r = k // 2
    nd = x.ndim
    # front-pad by r so the forward window [i, i+k) over the padded array
    # equals the centered window [i-r, i+r] over the original
    pad = [(0, 0)] * nd
    pad[axis] = (r, 0)
    m = jnp.pad(x, pad, mode="constant", constant_values=fill)
    np_ = n + r

    def shift(a, s):
        # out[i] = a[i + s] with `fill` beyond the border (s > 0)
        pad = [(0, 0)] * nd
        pad[axis] = (0, s)
        ap = jnp.pad(a, pad, mode="constant", constant_values=fill)
        return lax.slice_in_dim(ap, s, s + np_, axis=axis)

    cov = 1
    while cov * 2 <= k:
        m = op(m, shift(m, cov))
        cov *= 2
    if cov < k:
        m = op(m, shift(m, k - cov))
    return lax.slice_in_dim(m, 0, n, axis=axis)


def _window_reduce(img: jnp.ndarray, ksize: int, init, op) -> jnp.ndarray:
    # square-window max/min is separable: rows pass then columns pass
    fill = init
    out = _window_extreme_1d(img, ksize, 0, op, fill)
    return _window_extreme_1d(out, ksize, 1, op, fill)


def dilate(img: jnp.ndarray, ksize: int = 3, iterations: int = 1) -> jnp.ndarray:
    """Grayscale/binary dilation with a square structuring element.

    N iterations of a k-window max equal ONE max over the Minkowski-summed
    window ((k-1)*N+1) — collapsed to a single reduce_window for TPU.
    """
    k_eff = (ksize - 1) * iterations + 1
    init = -jnp.inf if img.dtype.kind == "f" else jnp.iinfo(img.dtype).min
    return _window_reduce(img, k_eff, init, lax.max)


def erode(img: jnp.ndarray, ksize: int = 3, iterations: int = 1) -> jnp.ndarray:
    k_eff = (ksize - 1) * iterations + 1
    init = jnp.inf if img.dtype.kind == "f" else jnp.iinfo(img.dtype).max
    return _window_reduce(img, k_eff, init, lax.min)


def dilate_ellipse(img: jnp.ndarray, ksize: int, iterations: int = 1) -> jnp.ndarray:
    """Dilation with an elliptical (disc) structuring element, matching the
    driver's ``cv::dilate(..., MORPH_ELLIPSE 15x15)``
    (reference ``rgbd_tum_noros.cc:108,138``). Implemented as a conv with the
    disc mask > 0 test (binary inputs) / max-plus via masked max."""
    import math as _math

    r = ksize // 2
    h, w = img.shape
    x = img.astype(jnp.float32)
    # a disc decomposes into per-row contiguous runs: dilation = max over dy
    # of (vertical shift of a 1-D window max of that row's run width). This
    # is O(k log k) element-wise passes instead of a k^2 shifted-copy stack.
    half = [int(_math.floor((r + 0.5) * _math.sqrt(
        max(0.0, 1.0 - (dy / (r + 0.5)) ** 2)))) for dy in range(-r, r + 1)]
    for _ in range(iterations):
        row_max = {}
        for dy, hw in zip(range(-r, r + 1), half):
            if hw not in row_max:
                row_max[hw] = _window_extreme_1d(x, 2 * hw + 1, 1, lax.max,
                                                 -jnp.inf)
        acc = None
        for dy, hw in zip(range(-r, r + 1), half):
            m = row_max[hw]
            if dy > 0:      # out[i] = m[i + dy]
                mp = jnp.pad(m, ((0, dy), (0, 0)), mode="constant",
                             constant_values=-jnp.inf)
                m = mp[dy:dy + h, :]
            elif dy < 0:
                mp = jnp.pad(m, ((-dy, 0), (0, 0)), mode="constant",
                             constant_values=-jnp.inf)
                m = mp[:h, :]
            acc = m if acc is None else jnp.maximum(acc, m)
        x = acc
    return x.astype(img.dtype)


def morph_open(img: jnp.ndarray, ksize: int = 3) -> jnp.ndarray:
    return dilate(erode(img, ksize), ksize)


def morph_close(img: jnp.ndarray, ksize: int = 3) -> jnp.ndarray:
    return erode(dilate(img, ksize), ksize)


def local_max_abs_diff(img: jnp.ndarray, ksize: int = 5) -> jnp.ndarray:
    """Max over the window of |center - neighbor| — the depth 'occlusion edge'
    statistic of the reference (``src/DynaDetect.cc:436-482``)."""
    mx = _window_reduce(img, ksize, -jnp.inf, lax.max)
    mn = _window_reduce(img, ksize, jnp.inf, lax.min)
    return jnp.maximum(mx - img, img - mn)


def image_gradients(img: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Central-difference gradients (dx, dy) with replicate borders — the
    5-point stencil used by variational flow solvers."""
    p = jnp.pad(img, 1, mode="edge")
    h, w = img.shape
    dx = (p[1:h + 1, 2:] - p[1:h + 1, :w]) * 0.5
    dy = (p[2:, 1:w + 1] - p[:h, 1:w + 1]) * 0.5
    return dx, dy


def sobel(img: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """3x3 Sobel gradients (dx, dy), replicate borders."""
    smooth = jnp.array([1.0, 2.0, 1.0], dtype=jnp.float32)
    diff = jnp.array([-1.0, 0.0, 1.0], dtype=jnp.float32)
    return _sep_conv2d(img, smooth, diff), _sep_conv2d(img, diff, smooth)


def build_pyramid(img: jnp.ndarray, n_levels: int, scale: float = 0.5,
                  min_size: int = 16) -> list:
    """Image pyramid by repeated blur+resize. Level 0 is the input. The list
    length is static (Python int), so the XLA graph is fixed."""
    levels = [img]
    h, w = img.shape[:2]
    for _ in range(1, n_levels):
        nh, nw = max(int(round(h * scale)), min_size), max(int(round(w * scale)), min_size)
        if nh == h and nw == w:
            break
        blurred = gaussian_blur(levels[-1], ksize=5, sigma=0.8 / scale)
        levels.append(resize_bilinear(blurred, (nh, nw)))
        h, w = nh, nw
        if min(h, w) <= min_size:
            break
    return levels


def histogram_fixed(values: jnp.ndarray, n_bins: int, vmin: float, vmax: float,
                    weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Fixed-range histogram as a one-hot matmul-free segment sum (TPU-friendly
    scatter-add). ``values`` any shape; returns (n_bins,) float32."""
    v = jnp.clip((values - vmin) / (vmax - vmin), 0.0, 1.0 - 1e-7)
    idx = (v * n_bins).astype(jnp.int32).reshape(-1)
    w = jnp.ones_like(idx, dtype=jnp.float32) if weights is None else weights.reshape(-1).astype(jnp.float32)
    return jax.ops.segment_sum(w, idx, num_segments=n_bins)


def otsu_threshold(hist: jnp.ndarray) -> jnp.ndarray:
    """Otsu's threshold (bin index, float) from a histogram — replaces
    ``cv::threshold(..., THRESH_OTSU)`` (reference ``src/DynaDetect.cc:1284``)."""
    hist = hist.astype(jnp.float32)
    total = jnp.sum(hist) + 1e-12
    p = hist / total
    bins = jnp.arange(hist.shape[0], dtype=jnp.float32)
    omega = jnp.cumsum(p)
    mu = jnp.cumsum(p * bins)
    mu_t = mu[-1]
    denom = omega * (1.0 - omega)
    sigma_b = jnp.where(denom > 1e-12, (mu_t * omega - mu) ** 2 / jnp.maximum(denom, 1e-12), 0.0)
    return jnp.argmax(sigma_b).astype(jnp.float32)


def triangle_threshold(hist: jnp.ndarray) -> jnp.ndarray:
    """Triangle-method threshold (bin index, float) — replaces
    ``cv::threshold(..., THRESH_TRIANGLE)`` (reference ``src/DynaDetect.cc:1285``).

    Finds the bin maximizing distance from the line between the histogram peak
    and the far non-empty end. Implemented branch-free over the fixed bin axis.
    """
    hist = hist.astype(jnp.float32)
    n = hist.shape[0]
    bins = jnp.arange(n, dtype=jnp.float32)
    peak = jnp.argmax(hist).astype(jnp.float32)
    hpeak = jnp.max(hist)
    nz = hist > 0
    first = jnp.min(jnp.where(nz, bins, jnp.float32(n)))
    last = jnp.max(jnp.where(nz, bins, jnp.float32(-1)))
    # choose the longer tail side (OpenCV flips so the tail is to the right)
    right_len = last - peak
    left_len = peak - first
    use_right = right_len >= left_len
    end = jnp.where(use_right, last, first)
    # line from (peak, hpeak) to (end, 0); distance of (b, hist[b]) to it
    dx = end - peak
    dy = -hpeak
    norm = jnp.sqrt(dx * dx + dy * dy) + 1e-12
    # only bins strictly between peak and end count
    between = jnp.where(use_right, (bins > peak) & (bins < end), (bins < peak) & (bins > first - 1) & (bins > end))
    dist = jnp.abs(dy * (bins - peak) - dx * (hist - hpeak)) / norm
    dist = jnp.where(between & nz, dist, -1.0)
    return jnp.argmax(dist).astype(jnp.float32)


def connected_relabel(mask: jnp.ndarray, n_iters: int = 64,
                      jump_every: int = 4) -> jnp.ndarray:
    """Connected components by iterative min-label propagation on a binary
    mask (4-connectivity). Returns an int32 image where each component carries
    the minimum linear index of its pixels + 1; background = 0.

    Fixed iteration count (static for XLA). Neighbor-min sweeps are nearly
    free vector ops; every ``jump_every``-th iteration adds a pointer-jumping
    hop (label chases the label of the pixel it points at) — each hop is a
    full-image random gather (~0.9 ms per 77k px on TPU) and dominates the
    cost, so the schedule trades hop count against reach: reach is roughly
    jump_every * 2^(n_iters/jump_every) pixels of in-component path length.
    Replaces ``cv::findContours`` / flood-fill style component logic for the
    fixed-shape TPU pipeline.
    """
    h, w = mask.shape
    big = jnp.iinfo(jnp.int32).max
    idx = (jnp.arange(h * w, dtype=jnp.int32) + 1).reshape(h, w)
    labels = jnp.where(mask, idx, 0)

    def step(labels, it):
        p = jnp.pad(labels, 1, mode="constant", constant_values=0)
        neigh = jnp.stack([
            p[0:h, 1:w + 1], p[2:h + 2, 1:w + 1], p[1:h + 1, 0:w], p[1:h + 1, 2:w + 2],
        ])
        neigh = jnp.where(neigh > 0, neigh, big)
        best = jnp.minimum(jnp.min(neigh, axis=0), jnp.where(labels > 0, labels, big))
        best = jnp.where(mask, best, 0)

        def jump(b):
            j = jnp.take(b.reshape(-1), jnp.maximum(b - 1, 0).reshape(-1)).reshape(h, w)
            return jnp.where((b > 0) & (j > 0), jnp.minimum(b, j), b)

        best = lax.cond(it % jump_every == jump_every - 1, jump,
                        lambda b: b, best)
        return best, None

    labels, _ = lax.scan(step, labels, jnp.arange(n_iters))
    return labels
