"""TPU-native ORB feature extraction: pyramid FAST + IC-angle + rotated BRIEF.

Functional re-design of the reference's ``ORBextractor``
(``ORB_SLAM2/src/ORBextractor.cc``): 8-level x1.2 pyramid (``:1166-1191``),
FAST-9/16 corners, spatially-spread keypoint selection (cell-capped top-k as
the statically-shaped substitute for the ``DistributeOctTree`` quadtree,
``:539``), intensity-centroid orientation (``:108,472``), and 256-bit rotated
BRIEF descriptors (``:1034``). The dynamic-mask erasure + "<250 survivors ->
revert" lost-prevention rule (``:1063-1115``) is applied on validity flags.

Everything is fixed shape: each level has a static keypoint quota (the
ORB-SLAM per-level geometric distribution), invalid slots carry score -inf /
valid=False. The whole extractor is one jittable function.

NOTE on descriptor pattern: the canonical OpenCV bit pattern is replaced by a
procedurally generated (fixed-seed) Gaussian pair pattern of the same size
(256 pairs, patch radius 13). Descriptors are self-consistent within this
framework (matching, vocabulary, loop closing are all built on it); byte
compatibility with OpenCV is a non-goal since the reference's DBoW2
vocabulary blob is not part of the build.
"""

from __future__ import annotations

import functools
import math
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from sindslam_tpu.config import ORBConfig
from sindslam_tpu.ops import image as im

# FAST ring: 16 (dy, dx) offsets of the radius-3 Bresenham circle, clockwise.
_FAST_RING = np.array(
    [(-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
     (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1)],
    dtype=np.int32,
)

_PATCH_RADIUS = 15      # IC-angle circular patch (HALF_PATCH_SIZE)
_BRIEF_RADIUS = 13      # descriptor sampling radius (fits in patch under rotation)
_EDGE_MARGIN = 19       # keep keypoints this far from level borders
_CELL = 32              # spatial-spread cell size
_CELL_TOPK = 4          # candidates kept per cell


def _brief_pattern(seed: int = 7, n_bits: int = 256) -> np.ndarray:
    """(n_bits, 4) int8 array of (x1, y1, x2, y2) sample offsets.

    Gaussian-distributed pairs (sigma = radius/2), clipped to the disc of
    radius _BRIEF_RADIUS; deterministic across runs.
    """
    rng = np.random.default_rng(seed)
    pts = []
    while len(pts) < n_bits:
        p = rng.normal(0.0, _BRIEF_RADIUS / 2.0, 4)
        if (np.hypot(p[0], p[1]) <= _BRIEF_RADIUS and
                np.hypot(p[2], p[3]) <= _BRIEF_RADIUS):
            q = np.round(p).astype(np.int8)
            pts.append(q)
    return np.stack(pts)


_PATTERN = _brief_pattern()


class OrbFeatures(NamedTuple):
    """Fixed-capacity feature set for one image."""

    xy: jnp.ndarray        # (N, 2) float32, full-resolution pixel coords (x, y)
    level: jnp.ndarray     # (N,) int32 pyramid level
    angle: jnp.ndarray     # (N,) float32 radians
    score: jnp.ndarray     # (N,) float32 FAST score
    desc: jnp.ndarray      # (N, 8) uint32 packed 256-bit descriptors
    valid: jnp.ndarray     # (N,) bool

    @property
    def capacity(self) -> int:
        return self.xy.shape[0]


def level_shapes(h: int, w: int, n_levels: int, scale: float) -> List[Tuple[int, int]]:
    return [(int(round(h / scale ** l)), int(round(w / scale ** l)))
            for l in range(n_levels)]


def level_quotas(n_features: int, n_levels: int, scale: float) -> List[int]:
    """ORB-SLAM's geometric per-level distribution (ORBextractor.cc ctor)."""
    inv = 1.0 / scale
    total = (1.0 - inv ** n_levels) / (1.0 - inv)
    base = n_features * (1.0 - inv) / (1.0 - inv ** n_levels)
    quotas = [int(round(base * inv ** l)) for l in range(n_levels)]
    quotas[-1] = max(n_features - sum(quotas[:-1]), 0)
    return quotas


def fast_score_map(img: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """FAST-9/16 corner score for every pixel of an (H, W) float image.

    Score = the largest margin t such that 9 contiguous ring pixels are all
    brighter than center+t (or all darker than center-t); 0 where the corner
    test fails at ``threshold``. Fully vectorized: 16 shifted copies, run-min
    over the 9-windows via unrolled minima.
    """
    h, w = img.shape
    pad = 3
    p = jnp.pad(img, pad, mode="edge")
    ring = jnp.stack([p[pad + dy:pad + dy + h, pad + dx:pad + dx + w]
                      for dy, dx in _FAST_RING])           # (16, H, W)
    diff_b = ring - img[None]                               # brighter margins
    diff_d = img[None] - ring                               # darker margins

    def run9_max_min(d):
        # max over the 16 cyclic starts of (min over 9 consecutive margins)
        d2 = jnp.concatenate([d, d[:8]], axis=0)            # (24, H, W)
        m = d2[:16]
        for k in range(1, 9):
            m = jnp.minimum(m, d2[k:k + 16])
        return jnp.max(m, axis=0)

    score = jnp.maximum(run9_max_min(diff_b), run9_max_min(diff_d))
    return jnp.where(score > threshold, score, 0.0)


def _nms3(score: jnp.ndarray) -> jnp.ndarray:
    mx = im.dilate(score, 3)
    return jnp.where(score >= mx, score, 0.0)


def _topk_unrolled(x: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k along the last axis via k unrolled argmax+mask passes.

    Bit-identical to ``lax.top_k`` (argmax and top_k both break ties by
    lowest index) but stays pure VPU work — no sort. For the per-cell
    K=_CELL_TOPK=4 selection this replaced ``lax.approx_max_k`` on TPU: the
    ~95%-recall approximation silently dropped the strongest corner in ~5%
    of cells, making the TPU keypoint SET diverge from CPU's (one of the r4
    real-TPU ORB quality drift sources, verdict r4 #2). Exact top_k was
    rejected for the same spot at ~3 ms/frame (full sort of (nc, 1024));
    k argmax passes cost k max-reductions, microseconds at k=4."""
    cols = jnp.arange(x.shape[-1])
    vals, idxs = [], []
    for _ in range(k):
        i = jnp.argmax(x, axis=-1)
        vals.append(jnp.take_along_axis(x, i[..., None], -1)[..., 0])
        idxs.append(i)
        x = jnp.where(cols[None, :] == i[..., None], -jnp.inf, x)
    return jnp.stack(vals, -1), jnp.stack(idxs, -1).astype(jnp.int32)


def _cell_candidates(score: jnp.ndarray, quota: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Spatially-spread selection: top-_CELL_TOPK per 32x32 cell, then global
    top-``quota`` by score. Returns ((quota, 2) int32 yx coords, (quota,) score).

    Backend-identical by construction: the per-cell pass is the unrolled
    exact top-k, the global pass is an exact ``lax.top_k`` over the small
    (~4 x n_cells) candidate vector — no approx_max_k anywhere, so the TPU
    and CPU keypoint sets agree given equal score maps."""
    h, w = score.shape
    ch = -(-h // _CELL)
    cw = -(-w // _CELL)
    ph, pw = ch * _CELL, cw * _CELL
    s = jnp.full((ph, pw), -jnp.inf, score.dtype).at[:h, :w].set(
        jnp.where(score > 0, score, -jnp.inf))
    cells = s.reshape(ch, _CELL, cw, _CELL).transpose(0, 2, 1, 3).reshape(ch * cw, _CELL * _CELL)
    top_s, top_i = _topk_unrolled(cells, _CELL_TOPK)        # (nc, K)
    cy = (jnp.arange(ch * cw) // cw)[:, None] * _CELL + top_i // _CELL
    cx = (jnp.arange(ch * cw) % cw)[:, None] * _CELL + top_i % _CELL
    cand_s = top_s.reshape(-1)
    cand_y = cy.reshape(-1)
    cand_x = cx.reshape(-1)
    k = min(quota, cand_s.shape[0])
    best_s, best_i = lax.top_k(cand_s, k)
    yx = jnp.stack([cand_y[best_i], cand_x[best_i]], axis=-1).astype(jnp.int32)
    if k < quota:  # pad (tiny levels)
        yx = jnp.pad(yx, ((0, quota - k), (0, 0)))
        best_s = jnp.pad(best_s, (0, quota - k), constant_values=-jnp.inf)
    return yx, best_s


def _gather_patches(img: jnp.ndarray, yx: jnp.ndarray, radius: int) -> jnp.ndarray:
    """(N, 2) int centers -> (N, 2r+1, 2r+1) patches (clamped at borders)."""
    h, w = img.shape
    d = jnp.arange(-radius, radius + 1)
    ys = jnp.clip(yx[:, 0:1, None] + d[None, :, None], 0, h - 1)
    xs = jnp.clip(yx[:, 1:2, None] + d[None, None, :], 0, w - 1)
    flat_idx = ys * w + xs                                   # (N, P, P)
    return jnp.take(img.reshape(-1), flat_idx.reshape(yx.shape[0], -1), axis=0
                    ).reshape(yx.shape[0], 2 * radius + 1, 2 * radius + 1)


def _shift_rows(x: jnp.ndarray, dy: int) -> jnp.ndarray:
    """x shifted so out[y] = x[y+dy], clamped at borders."""
    if dy == 0:
        return x
    h = x.shape[0]
    if dy > 0:
        return jnp.concatenate([x[dy:], jnp.repeat(x[-1:], dy, axis=0)], 0)
    return jnp.concatenate([jnp.repeat(x[:1], -dy, axis=0), x[:dy]], 0)


def _shift_cols(x: jnp.ndarray, dx: int) -> jnp.ndarray:
    if dx == 0:
        return x
    w = x.shape[1]
    if dx > 0:
        return jnp.concatenate([x[:, dx:], jnp.repeat(x[:, -1:], dx, axis=1)], 1)
    return jnp.concatenate([jnp.repeat(x[:, :1], -dx, axis=1), x[:, :dx]], 1)


def ic_angle_fields(img: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Whole-image disc moments (m10, m01) via row cumulative sums + shifts.

    m10(p) = sum_{|d| <= r} dx * I(p + d), m01 likewise with dy — the
    reference's IC_Angle patch sums (``ORBextractor.cc:108``), computed with
    ZERO gathers/convs: per disc row dy with half-width k(dy), the window sum
    over dx comes from two shifted row-cumsum lookups. ~30 shift/add passes,
    all VPU. (A 31x31 single-channel conv wastes the MXU; per-keypoint patch
    gathers serialize on the scalar unit.)
    """
    r = _PATCH_RADIUS
    xs = jnp.arange(img.shape[1], dtype=jnp.float32)[None, :]
    S0 = jnp.cumsum(img, axis=1)
    S1 = jnp.cumsum(img * xs, axis=1)
    m10 = jnp.zeros_like(img)
    m01 = jnp.zeros_like(img)
    for dy in range(-r, r + 1):
        k = int(math.isqrt(r * r - dy * dy))
        S0r = _shift_rows(S0, dy)
        S1r = _shift_rows(S1, dy)
        win0 = _shift_cols(S0r, k) - _shift_cols(S0r, -k - 1)
        win1 = _shift_cols(S1r, k) - _shift_cols(S1r, -k - 1)
        m10 = m10 + (win1 - xs * win0)
        m01 = m01 + dy * win0
    return m10, m01


def ic_angle(img: jnp.ndarray, yx: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid orientation at the given keypoints: one gather per
    keypoint from the cumsum-based moment fields."""
    h, w = img.shape
    m10_img, m01_img = ic_angle_fields(img)
    flat_idx = yx[:, 0] * w + yx[:, 1]
    m10 = jnp.take(m10_img.reshape(-1), flat_idx, axis=0)
    m01 = jnp.take(m01_img.reshape(-1), flat_idx, axis=0)
    return jnp.arctan2(m01, m10)


def brief_descriptors(img_blur: jnp.ndarray, yx: jnp.ndarray,
                      angle: jnp.ndarray) -> jnp.ndarray:
    """Rotation-steered 256-bit BRIEF, packed to (N, 8) uint32.

    Samples the pre-blurred level image at pattern offsets rotated by the
    keypoint angle (nearest-pixel, like the reference's GET_VALUE macro).
    On TPU dispatches to the gather-free matmul formulation (point gathers
    cost ~9 ns/index on the scalar unit; 1000 kp x 512 samples = 6.9 ms,
    vs ~1.5 ms for the patch-matmul + angle-binned-table route)."""
    if jax.default_backend() == "tpu":
        return _brief_descriptors_mm(img_blur, yx, angle)
    return _brief_descriptors_gather(img_blur, yx, angle)


def _pack_bits(bits: jnp.ndarray) -> jnp.ndarray:
    lanes = bits.reshape(bits.shape[0], 8, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, None, :]
    return jnp.sum(lanes << shifts, axis=-1, dtype=jnp.uint32)       # (N, 8)


def _brief_descriptors_gather(img_blur: jnp.ndarray, yx: jnp.ndarray,
                              angle: jnp.ndarray) -> jnp.ndarray:
    h, w = img_blur.shape
    pat = jnp.asarray(_PATTERN, jnp.float32)                 # (256, 4)
    ca = jnp.cos(angle)[:, None]
    sa = jnp.sin(angle)[:, None]

    def rot(x, y):
        # (N, 256) rotated offsets
        return x[None, :] * ca - y[None, :] * sa, x[None, :] * sa + y[None, :] * ca

    rx1, ry1 = rot(pat[:, 0], pat[:, 1])
    rx2, ry2 = rot(pat[:, 2], pat[:, 3])

    def sample(rx, ry):
        xs = jnp.clip(jnp.round(yx[:, 1:2] + rx), 0, w - 1).astype(jnp.int32)
        ys = jnp.clip(jnp.round(yx[:, 0:1] + ry), 0, h - 1).astype(jnp.int32)
        return jnp.take(img_blur.reshape(-1), ys * w + xs, axis=0)

    bits = (sample(rx1, ry1) < sample(rx2, ry2)).astype(jnp.uint32)  # (N, 256)
    return _pack_bits(bits)


_N_ANGLE_BINS = 64
_PATCH = 2 * _BRIEF_RADIUS + 2   # 28: rounded rotated offsets reach +-14


@functools.lru_cache(maxsize=1)
def _binned_offset_table() -> np.ndarray:
    """(B, 512) int32 patch-linear sample indices per quantized angle.

    Entry [b, s]: pattern point s (first 256 = sample-1 of each bit, last
    256 = sample-2) rotated by angle 2*pi*b/B, rounded to the nearest pixel,
    addressed inside a (_PATCH x _PATCH) patch centered at (+14, +14)."""
    pat = _PATTERN.astype(np.float64)                        # (256, 4)
    xs = np.concatenate([pat[:, 0], pat[:, 2]])
    ys = np.concatenate([pat[:, 1], pat[:, 3]])
    out = np.zeros((_N_ANGLE_BINS, 512), np.int32)
    c0 = _PATCH // 2
    for b in range(_N_ANGLE_BINS):
        a = 2.0 * np.pi * b / _N_ANGLE_BINS
        ca, sa = np.cos(a), np.sin(a)
        rx = np.round(xs * ca - ys * sa).astype(np.int64) + c0
        ry = np.round(xs * sa + ys * ca).astype(np.int64) + c0
        assert rx.min() >= 0 and rx.max() < _PATCH
        assert ry.min() >= 0 and ry.max() < _PATCH
        out[b] = (ry * _PATCH + rx).astype(np.int32)
    return out


def _extract_patches(img_blur: jnp.ndarray, y0: jnp.ndarray, x0: jnp.ndarray
                     ) -> jnp.ndarray:
    """(N, P, P) f32 patches at per-keypoint top-left corners.

    TPU: a Pallas kernel — the atlas stays VMEM-resident and each window is
    one dynamic slice (exact f32; the one-hot-matmul route it replaces
    materialized ~100 MB of bf16 one-hot operands, ~1.9 ms at N=1500).
    Elsewhere: the one-hot contraction pair (f32 — same values as the
    kernel, used by the CPU parity tests).
    """
    P = _PATCH
    if jax.default_backend() == "tpu":
        from sindslam_tpu.ops.pallas_kernels import extract_patches_pallas

        n = y0.shape[0]
        group = 125 if n % 125 == 0 else 1
        return extract_patches_pallas(img_blur, y0, x0, patch=P, group=group)
    h, w = img_blur.shape
    ks = jnp.arange(h, dtype=jnp.int32)
    wy = (ks[None, None, :] == (y0[:, None, None] + jnp.arange(P)[None, :, None])
          ).astype(jnp.float32)                              # (N, P, H)
    tmp = jnp.einsum("nph,hw->npw", wy, img_blur,
                     precision=lax.Precision.HIGHEST)        # (N, P, W)
    ms = jnp.arange(w, dtype=jnp.int32)
    wx = (ms[None, None, :] == (x0[:, None, None] + jnp.arange(P)[None, :, None])
          ).astype(jnp.float32)                              # (N, P, W)
    return jnp.einsum("npw,nqw->npq", tmp, wx,
                      precision=lax.Precision.HIGHEST)       # (N, P, P)


def _brief_descriptors_mm(img_blur: jnp.ndarray, yx: jnp.ndarray,
                          angle: jnp.ndarray) -> jnp.ndarray:
    """Gather-free BRIEF: VMEM patch extraction + angle-binned static
    sample tables, with the bin selected BEFORE the sampling contraction.

      patches[n] = img[y0:y0+P, x0:x0+P]           (Pallas dynamic slices)
      row_w[n,s,r] = sum_b bin_oh[n,b]*(ry[b,s]==r)   (one-hot x one-hot:
      col_w[n,s,c] = sum_b bin_oh[n,b]*(rx[b,s]==c)    exact at ANY matmul
                                                       precision — 0/1
                                                       operands, one term)
      G[n,s,c] = sum_r row_w[n,s,r] * patches[n,r,c]  (HIGHEST: real image
      samples[n,s] = sum_c col_w[n,s,c] * G[n,s,c]     values, f32-exact)

    An earlier formulation computed samples for ALL 64 bins then one-hot
    selected (S[b,n,s] = M[b] @ patch[n]): 2.6e10 exact-f32 MACs/frame at
    N=1000, 64x of it discarded. Selecting the bin first drops the exact-
    precision contraction to 4e8 MACs (r5: extract_orb -1.3 ms on chip,
    bit-identical by the TPU golden gate).

    Angle is quantized to 64 bins (<= 2.9 deg, <= 0.7 px at the pattern rim
    — below the 1 px rounding the reference's GET_VALUE already applies).
    """
    h, w = img_blur.shape
    n = yx.shape[0]
    P = _PATCH
    c0 = P // 2
    y0 = jnp.clip(yx[:, 0] - c0, 0, h - P)
    x0 = jnp.clip(yx[:, 1] - c0, 0, w - P)
    patches = _extract_patches(img_blur, y0, x0)             # (N, P, P)

    table = _binned_offset_table()                           # (B, 512) np
    ry = jnp.asarray(table // P)                             # (B, 512)
    rx = jnp.asarray(table % P)
    ry_oh = (ry[:, :, None] == jnp.arange(P)[None, None, :]
             ).astype(jnp.float32)                           # (B, 512, P)
    rx_oh = (rx[:, :, None] == jnp.arange(P)[None, None, :]
             ).astype(jnp.float32)
    tau = (2.0 * jnp.pi) / _N_ANGLE_BINS
    bins = jnp.mod(jnp.round(angle / tau).astype(jnp.int32), _N_ANGLE_BINS)
    bin_oh = (bins[:, None] == jnp.arange(_N_ANGLE_BINS)[None, :]
              ).astype(jnp.float32)                          # (N, B)
    # 0/1 x 0/1 with exactly one nonzero term per output: exact in bf16
    row_w = jnp.einsum("nb,bsr->nsr", bin_oh, ry_oh)         # (N, 512, P)
    col_w = jnp.einsum("nb,bsc->nsc", bin_oh, rx_oh)         # (N, 512, P)
    # HIGHEST, not DEFAULT: bf16 MXU passes round the patch values to ~1
    # gray-level right before the bit comparisons — measured 2.7 bits
    # (p95 7) of Hamming noise per descriptor on real TPU, the round-4
    # long-horizon drift source (tools/bench_brief_variants.py).
    G = jnp.einsum("nsr,nrc->nsc", row_w, patches,
                   precision=lax.Precision.HIGHEST)          # (N, 512, P)
    samples = jnp.sum(col_w * G, axis=-1)                    # (N, 512) f32
    bits = (samples[:, :256] < samples[:, 256:]).astype(jnp.uint32)
    return _pack_bits(bits)


def _border_mask(score: jnp.ndarray, margin: int) -> jnp.ndarray:
    h, w = score.shape
    r = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    ok = (r >= margin) & (r < h - margin) & (c >= margin) & (c < w - margin)
    return jnp.where(ok, score, 0.0)


_ATLAS_GAP = 32   # inter-level gap: > patch radius, so field ops can't leak


@functools.lru_cache(maxsize=8)
def _atlas_layout(height: int, width: int, n_levels: int, scale: float):
    """Static vertical packing of pyramid levels into one canvas.

    Returns (shapes, y-offsets, atlas height). The atlas lets FAST scoring,
    the IC-angle moment fields, the descriptor blur, and the BRIEF sample
    gathers each run ONCE over all levels instead of 8 per-level op chains —
    on TPU the per-level images are small enough that kernel count, not
    FLOPs, dominates.
    """
    shapes = level_shapes(height, width, n_levels, scale)
    offs = []
    y = 0
    for (lh, lw) in shapes:
        offs.append(y)
        y += lh + _ATLAS_GAP
    return shapes, offs, y - _ATLAS_GAP


@functools.partial(jax.jit, static_argnames=("cfg", "height", "width"))
def extract_orb(
    gray: jnp.ndarray,
    dyna_mask: jnp.ndarray,
    cfg: ORBConfig,
    height: int = 480,
    width: int = 640,
) -> OrbFeatures:
    """Extract ORB features from an (H, W) grayscale image, erasing keypoints
    on dynamic pixels (mask == 255) with the <min_keypoints revert rule.

    dyna_mask: (H, W) int/uint8, 255 = dynamic (reference encoding). Pass
    zeros to disable erasure.
    """
    shapes, offs, atlas_h = _atlas_layout(height, width, cfg.n_levels,
                                          cfg.scale_factor)
    quotas = level_quotas(cfg.n_features, cfg.n_levels, cfg.scale_factor)

    g = gray.astype(jnp.float32)
    use_pallas_fast = jax.default_backend() == "tpu"
    # ---- build the level atlas (the resize chain stays sequential)
    atlas = jnp.zeros((atlas_h, width), jnp.float32)
    level_img = g
    level_scores = []
    for l, ((lh, lw), y0) in enumerate(zip(shapes, offs)):
        if l > 0:
            level_img = im.resize_bilinear(level_img, (lh, lw))
        atlas = lax.dynamic_update_slice(atlas, level_img, (y0, 0))
        if use_pallas_fast:
            # fused FAST + priority mix + NMS, VMEM-resident per level
            from sindslam_tpu.ops.pallas_kernels import fast_nms_pallas

            level_scores.append(fast_nms_pallas(
                level_img, float(cfg.min_th_fast), float(cfg.ini_th_fast)))

    if not use_pallas_fast:
        # ---- whole-atlas field passes (ONE op chain for all levels)
        s_lo = fast_score_map(atlas, float(cfg.min_th_fast))
        s_hi = jnp.where(s_lo > cfg.ini_th_fast, s_lo, 0.0)
        # low-threshold fallback only where the high threshold found nothing
        # in the local cell; a pixel-level mix with a large bonus for
        # high-threshold corners preserves their priority.
        score_atlas = jnp.where(s_hi > 0, s_hi + 1000.0, s_lo)
        score_atlas = _nms3(score_atlas)
    m10_img, m01_img = ic_angle_fields(atlas)
    blur = im.gaussian_blur(atlas, 7, 2.0)

    # ---- per-level candidate selection (top-k stays per level: quotas).
    # BUDGET REFILL under masking (r4): each level over-selects 1.5x its
    # quota, penalizes candidates on dynamic pixels, and keeps the top
    # quota — so erased mover corners are REPLACED by the next-best static
    # corners instead of shrinking the feature set. The reference detects
    # then erases (OpenCV), losing the budget; measured here on fast_cam
    # the close mover region held the best-conditioned features and the
    # un-refilled masked run tracked 2.2x worse than unmasked. With an
    # all-static mask the penalty is zero everywhere and the selection is
    # identical to the direct top-quota (same comparator twice).
    feats_xy, feats_lvl, feats_score, yx_atlas = [], [], [], []
    for l, ((lh, lw), y0, quota) in enumerate(zip(shapes, offs, quotas)):
        if use_pallas_fast:
            score = level_scores[l]
        else:
            score = lax.dynamic_slice(score_atlas, (y0, 0), (lh, lw))
        score = _border_mask(score, _EDGE_MARGIN)
        refill = max(quota // 2, 8)
        yx2, sc2 = _cell_candidates(score, quota + refill)
        scale_back = cfg.scale_factor ** l
        xy2 = jnp.stack([yx2[:, 1], yx2[:, 0]], axis=-1
                        ).astype(jnp.float32) * scale_back
        cx2 = jnp.clip(xy2[:, 0].astype(jnp.int32), 0, width - 1)
        cy2 = jnp.clip(xy2[:, 1].astype(jnp.int32), 0, height - 1)
        dyn2 = dyna_mask[cy2, cx2] == 255
        s_pen = jnp.where(dyn2, sc2 - 1e6, sc2)
        _, keep = lax.top_k(s_pen, quota)
        feats_xy.append(xy2[keep])
        feats_lvl.append(jnp.full((quota,), l, jnp.int32))
        feats_score.append(sc2[keep])
        yx_atlas.append(yx2[keep] + jnp.array([[y0, 0]], jnp.int32))

    yx_all = jnp.concatenate(yx_atlas)                   # atlas coords
    # ---- ONE moment gather + ONE descriptor sampling pass for all levels
    flat_idx = yx_all[:, 0] * width + yx_all[:, 1]
    m10 = jnp.take(m10_img.reshape(-1), flat_idx, axis=0)
    m01 = jnp.take(m01_img.reshape(-1), flat_idx, axis=0)
    ang = jnp.arctan2(m01, m10)
    desc = brief_descriptors(blur, yx_all, ang)

    xy = jnp.concatenate(feats_xy)
    lvl = jnp.concatenate(feats_lvl)
    sc = jnp.concatenate(feats_score)
    valid = jnp.isfinite(sc) & (sc > 0)

    # --- dynamic-mask erasure with lost-prevention revert
    # (reference ORBextractor.cc:1063-1115)
    mx = jnp.clip(xy[:, 0].astype(jnp.int32), 0, width - 1)
    my = jnp.clip(xy[:, 1].astype(jnp.int32), 0, height - 1)
    on_dynamic = dyna_mask[my, mx] == 255
    survivors = valid & ~on_dynamic
    revert = jnp.sum(survivors) < cfg.min_keypoints_after_mask
    valid = jnp.where(revert, valid, survivors)

    return OrbFeatures(xy=xy, level=lvl, angle=ang, score=sc, desc=desc, valid=valid)


def hamming_distance_matrix(desc_a: jnp.ndarray, desc_b: jnp.ndarray) -> jnp.ndarray:
    """(Na, 8) x (Nb, 8) uint32 -> (Na, Nb) int32 Hamming distances.

    XOR + popcount on 32-bit lanes; replaces the reference's per-pair
    DescriptorDistance loop (``ORBmatcher.cc``)."""
    x = jnp.bitwise_xor(desc_a[:, None, :], desc_b[None, :, :])
    return jnp.sum(lax.population_count(x), axis=-1).astype(jnp.int32)
