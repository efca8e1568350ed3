"""Pallas TPU kernels for the hot inner loops.

The headline kernel is :func:`sor_inner_pallas`: one variational-flow inner
solve (lagged-nonlinearity re-weighting + red-black SOR sweeps) for a whole
pyramid level, entirely VMEM-resident. The XLA formulation of the same loop
(see ops/flow.py:sor_solve_jax) issues thousands of small sequential
element-wise kernels through HBM; here the ~10 field arrays (<= 0.5 MB each
at the 288x384 working resolution) are loaded into VMEM once and the full
inner x sweeps x colors iteration runs on the VPU without touching HBM —
this is what makes the 9 Hz CUDA Brox baseline beatable by >10x.

Layout notes (see the TPU tiling constraints): arrays are padded to
(8k, 128m) f32 tiles by the wrapper; the true extent enters the kernel as
static Python ints and all boundary handling (replicate edges, zero edge
weights) is done with iota masks, so padding never leaks into the solution.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS2 = 1e-6


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _shift(x, dy: int, dx: int, h: int, w: int):
    """Shift with replicate borders inside the true (h, w) region; the array
    is (H_pad, W_pad) but only the first h rows / w cols matter."""
    # pltpu.roll requires a non-negative shift; -k mod size is equivalent
    out = pltpu.roll(x, (-dy) % x.shape[0], 0) if dy != 0 else x
    out = pltpu.roll(out, (-dx) % x.shape[1], 1) if dx != 0 else out
    rows = lax.broadcasted_iota(jnp.int32, x.shape, 0)
    cols = lax.broadcasted_iota(jnp.int32, x.shape, 1)
    if dy == 1:      # neighbor below: row h-1 replicates itself
        out = jnp.where(rows >= h - 1, x, out)
    if dy == -1:     # neighbor above
        out = jnp.where(rows <= 0, x, out)
    if dx == 1:
        out = jnp.where(cols >= w - 1, x, out)
    if dx == -1:
        out = jnp.where(cols <= 0, x, out)
    return out


def _make_kernel(true_h: int, true_w: int, alpha: float, gamma: float,
                 omega: float, inner: int, sweeps: int):
    def kernel(ix_ref, iy_ref, iz_ref, ixx_ref, ixy_ref, iyy_ref,
               ixz_ref, iyz_ref, u_ref, v_ref, du_ref, dv_ref):
        ix = ix_ref[:]
        iy = iy_ref[:]
        iz = iz_ref[:]
        ixx = ixx_ref[:]
        ixy = ixy_ref[:]
        iyy = iyy_ref[:]
        ixz = ixz_ref[:]
        iyz = iyz_ref[:]
        u = u_ref[:]
        v = v_ref[:]
        shape = ix.shape

        rows = lax.broadcasted_iota(jnp.int32, shape, 0)
        cols = lax.broadcasted_iota(jnp.int32, shape, 1)
        in_img = (rows < true_h) & (cols < true_w)
        red = ((rows + cols) % 2) == 0
        # directional edge-weight validity (Neumann at the true border)
        ok_up = rows > 0
        ok_down = rows < true_h - 1
        ok_left = cols > 0
        ok_right = cols < true_w - 1

        def sh(x, dy, dx):
            return _shift(x, dy, dx, true_h, true_w)

        def inner_body(_i, carry):
            du, dv = carry
            # lagged data weights
            r_data = iz + ix * du + iy * dv
            psi_d = lax.rsqrt(r_data * r_data + _EPS2)
            gx = ixz + ixx * du + ixy * dv
            gy = iyz + ixy * du + iyy * dv
            psi_g = lax.rsqrt(gx * gx + gy * gy + _EPS2) * gamma

            # lagged smoothness weights on the total flow
            U = u + du
            V = v + dv
            ux = (sh(U, 0, 1) - sh(U, 0, -1)) * 0.5
            uy = (sh(U, 1, 0) - sh(U, -1, 0)) * 0.5
            vx = (sh(V, 0, 1) - sh(V, 0, -1)) * 0.5
            vy = (sh(V, 1, 0) - sh(V, -1, 0)) * 0.5
            psi_s = lax.rsqrt(ux * ux + uy * uy + vx * vx + vy * vy + _EPS2)

            w_up = jnp.where(ok_up, 0.5 * (psi_s + sh(psi_s, -1, 0)), 0.0)
            w_down = jnp.where(ok_down, 0.5 * (psi_s + sh(psi_s, 1, 0)), 0.0)
            w_left = jnp.where(ok_left, 0.5 * (psi_s + sh(psi_s, 0, -1)), 0.0)
            w_right = jnp.where(ok_right, 0.5 * (psi_s + sh(psi_s, 0, 1)), 0.0)
            wsum = w_up + w_down + w_left + w_right

            a11 = psi_d * ix * ix + psi_g * (ixx * ixx + ixy * ixy)
            a12 = psi_d * ix * iy + psi_g * (ixx * ixy + ixy * iyy)
            a22 = psi_d * iy * iy + psi_g * (ixy * ixy + iyy * iyy)
            b_u = -(psi_d * ix * iz + psi_g * (ixx * ixz + ixy * iyz))
            b_v = -(psi_d * iy * iz + psi_g * (ixy * ixz + iyy * iyz))
            inv_du = 1.0 / (a11 + alpha * wsum + 1e-12)
            inv_dv = 1.0 / (a22 + alpha * wsum + 1e-12)
            # fold every sweep-invariant term: the neighbor sum over the BASE
            # flow u is constant across sweeps, so only sh(du) varies. This
            # cuts the per-sweep VMEM working set (~18 MB naive > 16 MB cap).
            su_base = (w_up * sh(u, -1, 0) + w_down * sh(u, 1, 0)
                       + w_left * sh(u, 0, -1) + w_right * sh(u, 0, 1)
                       - wsum * u)
            sv_base = (w_up * sh(v, -1, 0) + w_down * sh(v, 1, 0)
                       + w_left * sh(v, 0, -1) + w_right * sh(v, 0, 1)
                       - wsum * v)
            cu = (b_u + alpha * su_base) * inv_du
            cv = (b_v + alpha * sv_base) * inv_dv
            a12u = a12 * inv_du
            a12v = a12 * inv_dv
            wuu = alpha * w_up * inv_du
            wdu = alpha * w_down * inv_du
            wlu = alpha * w_left * inv_du
            wru = alpha * w_right * inv_du
            wuv = alpha * w_up * inv_dv
            wdv = alpha * w_down * inv_dv
            wlv = alpha * w_left * inv_dv
            wrv = alpha * w_right * inv_dv

            def color_update(carry, color_mask):
                du, dv = carry
                new_du = (cu - a12u * dv
                          + wuu * sh(du, -1, 0) + wdu * sh(du, 1, 0)
                          + wlu * sh(du, 0, -1) + wru * sh(du, 0, 1))
                new_dv = (cv - a12v * new_du
                          + wuv * sh(dv, -1, 0) + wdv * sh(dv, 1, 0)
                          + wlv * sh(dv, 0, -1) + wrv * sh(dv, 0, 1))
                m = color_mask & in_img
                du = jnp.where(m, (1 - omega) * du + omega * new_du, du)
                dv = jnp.where(m, (1 - omega) * dv + omega * new_dv, dv)
                return du, dv

            def sweep_body(_s, carry):
                carry = color_update(carry, red)
                carry = color_update(carry, ~red)
                return carry

            return lax.fori_loop(0, sweeps, sweep_body, (du, dv))

        du0 = jnp.zeros(shape, jnp.float32)
        dv0 = jnp.zeros(shape, jnp.float32)
        du, dv = lax.fori_loop(0, inner, inner_body, (du0, dv0))
        du_ref[:] = jnp.where(in_img, du, 0.0)
        dv_ref[:] = jnp.where(in_img, dv, 0.0)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("alpha", "gamma", "omega", "inner", "sweeps", "interpret"))
def sor_inner_pallas(
    ix, iy, iz, ixx, ixy, iyy, ixz, iyz, u, v,
    alpha: float, gamma: float, omega: float, inner: int, sweeps: int,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One inner solve of the variational flow level as a single TPU kernel.

    All inputs are (h, w) f32 at the level resolution; returns (du, dv).
    """
    h, w = ix.shape
    hp, wp = _round_up(h, 8), _round_up(w, 128)

    def pad(x):
        return jnp.pad(x, ((0, hp - h), (0, wp - w)))

    args = [pad(a) for a in (ix, iy, iz, ixx, ixy, iyy, ixz, iyz, u, v)]
    kernel = _make_kernel(h, w, alpha, gamma, omega, inner, sweeps)
    du, dv = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((hp, wp), jnp.float32),
                   jax.ShapeDtypeStruct((hp, wp), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 10,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        # the 288x384 working level peaks just above the default 16 MB scoped
        # window; v5e has headroom for a larger scoped allocation
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return du[:h, :w], dv[:h, :w]


def _make_cc_kernel(true_h: int, true_w: int, n_sweeps: int):
    """Connected-component min-label propagation, VMEM-resident.

    Replaces the XLA pointer-jumping relabel for the TPU pipeline: each XLA
    sweep round-trips ~15 MB of intermediates through HBM and each jump is a
    ~0.9 ms random gather, while in VMEM a masked neighbor-min sweep is ~10
    register-level vector ops — hundreds of sweeps cost well under a ms.
    Reach = n_sweeps pixels of in-component path length (no jumps), so the
    sweep count must exceed the longest geodesic path of any component at
    the call's resolution (stress-tested at the budget in
    tests/test_pallas_kernels.py::test_cc_labels_pallas_serpentine_at_budget).
    A pathological snake longer than the budget splits into multiple
    labels; in the RAG pipeline the fragments share cluster label,
    adjacency, and depth histogram, so the merge stage re-joins them —
    the failure mode is bounded, not silent corruption.
    """

    def kernel(seed_ref, mask_ref, labels_ref, comp_ref):
        mask = mask_ref[:]
        labels = labels_ref[:]
        shape = mask.shape
        rows = lax.broadcasted_iota(jnp.int32, shape, 0)
        cols = lax.broadcasted_iota(jnp.int32, shape, 1)
        in_img = (rows < true_h) & (cols < true_w) & (mask > 0)
        BIG = jnp.int32(1 << 30)

        ok_up = rows > 0
        ok_down = rows < true_h - 1
        ok_left = cols > 0
        ok_right = cols < true_w - 1

        def sh(x, dy, dx):
            return _shift(x, dy, dx, true_h, true_w)

        dirs = [(-1, 0, ok_up), (1, 0, ok_down), (0, -1, ok_left),
                (0, 1, ok_right)]
        # neighbor validity is loop-invariant: same cluster label, both in
        # mask, not across the true border
        links = []
        for dy, dx, okd in dirs:
            nlab = sh(labels, dy, dx)
            nmask = sh(mask, dy, dx)
            links.append(okd & in_img & (nmask > 0) & (nlab == labels))

        def body(_i, comp):
            best = jnp.where(comp > 0, comp, BIG)
            for (dy, dx, _okd), link in zip(dirs, links):
                ncomp = sh(comp, dy, dx)
                cand = jnp.where(link & (ncomp > 0), ncomp, BIG)
                best = jnp.minimum(best, cand)
            return jnp.where(in_img & (best < BIG), best, comp)

        comp = lax.fori_loop(0, n_sweeps, body, seed_ref[:])
        comp_ref[:] = jnp.where(in_img, comp, 0)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("n_sweeps", "interpret"))
def cc_labels_pallas(seed: jnp.ndarray, mask: jnp.ndarray,
                     labels: jnp.ndarray, n_sweeps: int = 512,
                     interpret: bool = False) -> jnp.ndarray:
    """Connected components on TPU: min-label propagation in one kernel.

    seed: (H, W) int32 initial labels (min-linear-index+1 inside mask, 0
    outside). mask: (H, W) anything castable to int32 (0 = background).
    labels: (H, W) int32 cluster image — neighbors only connect where equal
    (pass `mask` itself for plain binary connectivity).
    """
    h, w = seed.shape
    hp, wp = _round_up(h, 8), _round_up(w, 128)

    def pad(x, val=0):
        return jnp.pad(x.astype(jnp.int32), ((0, hp - h), (0, wp - w)),
                       constant_values=val)

    kernel = _make_cc_kernel(h, w, n_sweeps)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(pad(seed), pad(mask), pad(labels, val=-1))
    return out[:h, :w]


_FAST_RING_OFFS = [(-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3),
                   (2, 2), (3, 1), (3, 0), (3, -1), (2, -2), (1, -3),
                   (0, -3), (-1, -3), (-2, -2), (-3, -1)]


def _shift_k(x, dy: int, dx: int, true_h: int, true_w: int):
    """Arbitrary-offset shift with replicate borders inside the true region
    (compose the single-step border-aware _shift repeatedly is wasteful for
    |d|=3; roll once then clamp with iota masks against the source edge)."""
    out = x
    if dy != 0:
        out = pltpu.roll(out, (-dy) % x.shape[0], 0)
    if dx != 0:
        out = pltpu.roll(out, (-dx) % x.shape[1], 1)
    rows = lax.broadcasted_iota(jnp.int32, x.shape, 0)
    cols = lax.broadcasted_iota(jnp.int32, x.shape, 1)
    # positions whose source row/col fell outside [0, true) read garbage
    # from the wrap — callers mask those pixels out (FAST uses a 19 px
    # border margin downstream), so just flag in-bounds here
    src_r = rows + dy
    src_c = cols + dx
    inb = ((src_r >= 0) & (src_r < true_h) & (src_c >= 0) & (src_c < true_w))
    return out, inb


def _make_fast_kernel(true_h: int, true_w: int, min_th: float, ini_th: float):
    """FAST-9/16 max-margin score + 3x3 NMS + high-threshold priority mix,
    fused in VMEM. The XLA formulation materializes a (24, H, W) ring stack
    plus 16 min-chains through HBM (~6 ms on the ORB atlas); here the ring
    differences are recomputed from rolls on the fly, so the live set stays
    at ~5 level-sized arrays."""

    def kernel(img_ref, out_ref):
        img = img_ref[:]
        shape = img.shape
        rows = lax.broadcasted_iota(jnp.int32, shape, 0)
        cols = lax.broadcasted_iota(jnp.int32, shape, 1)
        in_img = (rows < true_h) & (cols < true_w)
        NEG = jnp.float32(-1e9)

        shifted = []
        for dy, dx in _FAST_RING_OFFS:
            s, inb = _shift_k(img, dy, dx, true_h, true_w)
            # out-of-image ring samples read the center value (margin
            # pixels are discarded downstream anyway)
            shifted.append(jnp.where(inb, s, img))

        best_b = NEG
        best_d = NEG
        for k in range(16):
            wb = shifted[k] - img
            wd = img - shifted[k]
            for j in range(1, 9):
                s = shifted[(k + j) % 16]
                wb = jnp.minimum(wb, s - img)
                wd = jnp.minimum(wd, img - s)
            best_b = jnp.maximum(best_b, wb)
            best_d = jnp.maximum(best_d, wd)
        score = jnp.maximum(best_b, best_d)
        score = jnp.where((score > min_th) & in_img, score, 0.0)
        # high-threshold corners outrank low-threshold fallbacks
        score = jnp.where(score > ini_th, score + 1000.0, score)

        # 3x3 NMS: keep pixels that equal their neighborhood max
        m = score
        for dy, dx in [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1),
                       (1, -1), (1, 0), (1, 1)]:
            s, inb = _shift_k(score, dy, dx, true_h, true_w)
            m = jnp.maximum(m, jnp.where(inb, s, 0.0))
        out_ref[:] = jnp.where((score >= m) & in_img, score, 0.0)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("min_th", "ini_th", "interpret"))
def fast_nms_pallas(img: jnp.ndarray, min_th: float, ini_th: float,
                    interpret: bool = False) -> jnp.ndarray:
    """FAST-9/16 score + priority mix + 3x3 NMS for one pyramid level."""
    h, w = img.shape
    hp, wp = _round_up(h, 8), _round_up(w, 128)
    imgp = jnp.pad(img, ((0, hp - h), (0, wp - w)))
    kernel = _make_fast_kernel(h, w, float(min_th), float(ini_th))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(imgp)
    return out[:h, :w]


def _make_patch_kernel(group: int, patch: int, nrows: int, ncols: int,
                       hp: int, wp: int):
    """Mosaic only proves in-bounds vector loads when the dynamic start of
    the sublane dim is a multiple of 8 (and the lane dim of 128) — an
    arbitrary ``img_ref[pl.ds(y0, patch), pl.ds(x0, patch)]`` fails to
    compile on real TPU ("cannot statically prove that index in dimension 0
    is a multiple of 8"; interpret mode accepts it, which is why CPU parity
    tests alone missed this). So: load an ALIGNED (nrows, ncols) superset
    block and rotate the residue away in registers (tpu.dynamic_rotate)."""

    def kernel(yx_ref, img_ref, out_ref):
        i = pl.program_id(0)

        def body(k, carry):
            y0 = yx_ref[i * group + k, 0]
            x0 = yx_ref[i * group + k, 1]
            # clamp the aligned superset start in-kernel: an out-of-contract
            # y0/x0 (caller must pre-clip to [0, dim - patch]) would
            # otherwise read past the padded image instead of merely
            # returning a shifted window. hp/wp are multiples of 8/128, so
            # the clamped start keeps its alignment.
            ya = pl.multiple_of(jnp.minimum((y0 // 8) * 8, hp - nrows), 8)
            xa = pl.multiple_of(jnp.minimum((x0 // 128) * 128, wp - ncols),
                                128)
            blk = img_ref[pl.ds(ya, nrows), pl.ds(xa, ncols)]
            # bring (y0-ya, x0-xa) to the block origin: roll is cyclic with
            # a non-negative dynamic amount, so shift by size - residue
            blk = pltpu.roll(blk, (nrows - (y0 - ya)) % nrows, 0)
            blk = pltpu.roll(blk, (ncols - (x0 - xa)) % ncols, 1)
            out_ref[k] = blk[:patch, :patch]
            return carry

        lax.fori_loop(0, group, body, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("patch", "group", "interpret"))
def extract_patches_pallas(img: jnp.ndarray, y0: jnp.ndarray,
                           x0: jnp.ndarray, patch: int = 28,
                           group: int = 125,
                           interpret: bool = False) -> jnp.ndarray:
    """(N, patch, patch) windows of ``img`` at per-point top-left corners.

    The BRIEF patch gather. The one-hot-matmul formulation this replaces
    materializes two (N, patch, atlas-dim) bf16 one-hot operands (~100 MB of
    comparisons + HBM traffic, ~1.9 ms at N=1500 on the 2434x640 ORB atlas,
    r3 trace fusion.1118) and rounds the image through bf16; here the atlas
    stays VMEM-resident across the whole grid and each window is one
    ALIGNED dynamic slice + two register rotates (see _make_patch_kernel) —
    exact f32, no HBM in the loop.

    Callers must pre-clip y0/x0 to [0, dim - patch]; N must be a multiple
    of ``group`` (the wrapper in frontend/orb.py pads).
    """
    n = y0.shape[0]
    assert n % group == 0, (n, group)
    h, w = img.shape
    # the kernel loads ALIGNED (nrows, ncols) superset blocks: row starts
    # round down to a multiple of 8 (residue < 8) and column starts to a
    # multiple of 128 (residue < 128); pad so the largest aligned block
    # stays in bounds (y0 <= h - patch, x0 <= w - patch by the caller)
    nrows = _round_up(patch, 8) + 8
    ncols = _round_up(patch, 128) + 128
    hp = _round_up(h - patch + nrows, 8)
    wp = _round_up(w - patch + ncols, 128)
    imgp = jnp.pad(img, ((0, hp - h), (0, wp - w)))
    yx = jnp.stack([y0, x0], axis=-1).astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // group,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((group, patch, patch),
                               lambda i, s_ref: (i, 0, 0)),
    )
    out = pl.pallas_call(
        _make_patch_kernel(group, patch, nrows, ncols, hp, wp),
        out_shape=jax.ShapeDtypeStruct((n, patch, patch), img.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(yx, imgp)
    return out
