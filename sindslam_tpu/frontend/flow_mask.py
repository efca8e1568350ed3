"""Flow-residual dynamic masking: camera-motion compensation by RANSAC
homography + adaptive thresholding of the residual field.

Re-implements the semantics of the reference's flow branch
(``ORB_SLAM2/src/DynaDetect.cc:1023-1374``) as a single statically-shaped JAX
stage:
  - weighted grid sampling of flow correspondences (10-px grid; weights favor
    previously-static regions, ``:1169-1204``)
  - homography via fixed-size batched RANSAC (replaces findHomography(RHO),
    ``:1235``)
  - per-pixel residual = flow - homography-induced flow (``:1252-1267``)
  - Otsu + Triangle thresholds on the residual magnitude with the clamp
    ladder: low in [1.7, 3.0] px, high in [max(3, 1.2 low), 10] px, low
    re-raised when >50% of pixels fire (``:1284-1367``)
  - the "large motion" test (>=30% of pixels moving >10 px) that tells the
    caller to recompute flow against frame n-1 instead of n-2
    (``:1086-1131``)
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from sindslam_tpu.config import DynaConfig
from sindslam_tpu.ops import image as im
from sindslam_tpu.ops.homography import homography_flow, ransac_homography

_HIST_BINS = 256
_HIST_MAX_PX = 20.0


class FlowMaskResult(NamedTuple):
    low_mask: jnp.ndarray     # bool (H, W): residual > low threshold
    high_mask: jnp.ndarray    # bool (H, W): residual > high threshold
    residual_mag: jnp.ndarray  # float32 (H, W) px
    homography: jnp.ndarray   # (3, 3)
    low_thresh: jnp.ndarray   # scalar px
    high_thresh: jnp.ndarray  # scalar px
    large_motion: jnp.ndarray  # scalar bool


def sample_weights(
    prev_dyna_mask: jnp.ndarray,
    cluster_dyn_ratio_img: jnp.ndarray,
    cfg: DynaConfig,
    key: jax.Array,
) -> jnp.ndarray:
    """Per-pixel homography-sampling weight map.

    Reference semantics (``src/DynaDetect.cc:1169-1204``): depth-invalid 1.0;
    static 1.2*(1 - cluster dynamic ratio); dynamic 0.4; plus N(0, 0.5) jitter
    (jitter only reorders similar weights; it never resurrects weight-0 pixels).
    """
    w = jnp.where(
        prev_dyna_mask == cfg.mask_invalid,
        cfg.w_invalid,
        jnp.where(
            prev_dyna_mask == cfg.mask_dynamic,
            cfg.w_dynamic,
            cfg.w_static * (1.0 - cluster_dyn_ratio_img),
        ),
    ).astype(jnp.float32)
    jitter = cfg.sample_jitter_std * jax.random.normal(key, w.shape)
    return jnp.maximum(w + jitter, 0.05)


def _threshold_ladder(mag: jnp.ndarray, valid: jnp.ndarray, cfg: DynaConfig
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Otsu+Triangle thresholds in pixels, with the reference's clamp ladder.

    The histogram runs on a 4x-subsampled field via a one-hot matmul: the
    thresholds are distribution statistics (1/16 sampling doesn't move
    them), a 307k-element scatter serializes on TPU, and the 2x-subsampled
    one-hot was still a 78 MB HBM materialization (r3 ablation).
    """
    m2 = im.subsample(mag, 4)
    w2 = im.subsample(valid, 4).astype(jnp.float32)
    idx = jnp.clip((m2 / _HIST_MAX_PX * _HIST_BINS).astype(jnp.int32),
                   0, _HIST_BINS - 1).reshape(-1)
    onehot = (idx[:, None] == jnp.arange(_HIST_BINS)[None, :]).astype(jnp.float32)
    hist = jnp.matmul(w2.reshape(1, -1), onehot,
                      precision=jax.lax.Precision.DEFAULT)[0]
    weights = valid.astype(jnp.float32)
    px_per_bin = _HIST_MAX_PX / _HIST_BINS
    otsu = im.otsu_threshold(hist) * px_per_bin
    tri = im.triangle_threshold(hist) * px_per_bin
    low = jnp.minimum(otsu, tri)
    high = jnp.maximum(otsu, tri)

    low = jnp.clip(low, cfg.low_thresh_min, cfg.low_thresh_max)
    # re-raise low if more than half the valid pixels fire
    n_valid = jnp.sum(weights) + 1e-9
    frac_fire = jnp.sum((mag > low) & valid) / n_valid
    low = jnp.where(frac_fire > cfg.low_refire_frac, cfg.low_thresh_max, low)
    high = jnp.clip(
        high,
        jnp.maximum(cfg.high_thresh_floor, cfg.high_thresh_min_scale * low),
        cfg.high_thresh_max,
    )
    return low, high


def _parallax_consistency(ru: jnp.ndarray, rv: jnp.ndarray,
                          depth_m: jnp.ndarray, valid: jnp.ndarray,
                          mag: jnp.ndarray, cfg: DynaConfig,
                          prev_dyn: jnp.ndarray | None = None
                          ) -> jnp.ndarray:
    """Pixels whose homography residual is explained by STATIC parallax.

    Goes beyond the reference (which has no defense in the 3-10 px gray zone
    between the threshold ladder and the large-motion fallback — static
    close-range structure gets masked whenever the n-2 baseline reaches a few
    cm). Camera-translation parallax after the homography obeys
        r(x) ~ (invZ(x) - invZ0) * v(x),   v(x) = f*t_xy + (x - c) * t_z,
    i.e. an inverse-depth-modulated affine field. Relaxing invZ0*v into an
    independent affine term gives a 6-parameter model LINEAR in the unknowns:
        ru ~ invZ*(a1 + a3*x) - (b1 + b3*x)
        rv ~ invZ*(a2 + a3*y) - (b2 + b3*y)
    which is fit by (two-round robust) weighted least squares on a pixel
    grid; pixels within tolerance of the prediction AND below
    ``parallax_max_px`` are classified static parallax. Independent movers
    must match both components of this depth-coupled field by coincidence to
    be excluded — and then still get caught once their motion departs from
    the epipolar direction on later frames.
    """
    h, w = ru.shape
    step = cfg.sample_grid_step
    ys = jnp.arange(step // 2, h, step)
    xs = jnp.arange(step // 2, w, step)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    yy = yy.reshape(-1)
    xx = xx.reshape(-1)

    inv_z_img = jnp.where(valid, 1.0 / jnp.maximum(depth_m, 0.05), 0.0)
    cx = (w - 1) / 2.0
    cy = (h - 1) / 2.0

    def design(yv, xv, iz):
        xt = (xv.astype(jnp.float32) - cx) / w        # normalized coords
        yt = (yv.astype(jnp.float32) - cy) / h
        z1 = jnp.zeros_like(iz)
        o = jnp.ones_like(iz)
        # rows for ru: [iz, 0, iz*xt, -1, 0, -xt]
        Au = jnp.stack([iz, z1, iz * xt, -o, z1, -xt], -1)
        # rows for rv: [0, iz, iz*yt, 0, -1, -yt]
        Av = jnp.stack([z1, iz, iz * yt, z1, -o, -yt], -1)
        return Au, Av

    iz_s = inv_z_img[yy, xx]
    ru_s = ru[yy, xx]
    rv_s = rv[yy, xx]
    ok_s = valid[yy, xx] & (jnp.sqrt(ru_s ** 2 + rv_s ** 2)
                            < cfg.parallax_max_px)
    if prev_dyn is not None:
        # known movers must not seed the camera-parallax fit: a walking
        # person's ~6 px coherent residual drags the least squares enough
        # that true background parallax lands outside tolerance (r3
        # dyn_walk frame-6 probe: oracle static-only fit p90 0.73 px vs
        # the corrupted fit missing ~13k background px)
        ok_s = ok_s & ~prev_dyn[yy, xx]
    Au, Av = design(yy, xx, iz_s)
    A = jnp.concatenate([Au, Av], 0)                  # (2N, 6)
    b = jnp.concatenate([ru_s, rv_s], 0)
    w0 = jnp.concatenate([ok_s, ok_s], 0).astype(jnp.float32)

    _HI = jax.lax.Precision.HIGHEST

    def solve(wts):
        # HIGHEST: the 6x6 normal equations mix O(1) inverse-depth terms
        # with O(1) normalized coords, but the accumulation over 6k rows in
        # bf16 shifts theta enough to flip the per-pixel miss<tol test at
        # the sub-pixel tolerances used below (r3 TPU-vs-CPU mask drift)
        Aw = A * wts[:, None]
        M = jnp.matmul(A.T, Aw, precision=_HI) + 1e-4 * jnp.eye(6)
        rhs = jnp.matmul(Aw.T, b, precision=_HI)
        return jnp.linalg.solve(M, rhs)

    theta = solve(w0)
    # robust re-fit by HARD rejection at a shrinking radius (3 -> 1.5 ->
    # 1 px): soft 1/err weights let a coherent mover keep pulling the fit
    # (its residual is bounded, so its weight never vanishes), which pushed
    # true background parallax outside tolerance on dyn_walk frames 6-9;
    # a shrinking trust region cuts the mover out entirely after round one
    # while keeping thousands of static rows
    w1 = w0
    for cut in (3.0, 1.5, 1.0):
        err = jnp.abs(jnp.matmul(A, theta, precision=_HI) - b)
        w1 = w0 * (err < cut).astype(jnp.float32)
        theta = solve(w1)

    # model validity: if the (robust) fit does not explain the candidate
    # residuals, disable the exclusion entirely (never weaken real movers)
    err2 = jnp.abs(jnp.matmul(A, theta, precision=_HI) - b)
    med_err = jnp.nanmedian(jnp.where(w0 > 0, err2, jnp.nan))
    model_ok = jnp.nan_to_num(med_err, nan=1e9) < cfg.parallax_fit_med_px

    # dense prediction + per-pixel test — written ELEMENTWISE (materializing
    # the (2HW, 6) design matrix is a 15 MB x2 HBM round trip; these fuse
    # into one VPU pass)
    xtf = (jnp.arange(w, dtype=jnp.float32)[None, :] - cx) / w
    ytf = (jnp.arange(h, dtype=jnp.float32)[:, None] - cy) / h
    t0, t1, t2, t3, t4, t5 = (theta[i] for i in range(6))
    pu = inv_z_img * (t0 + t2 * xtf) - (t3 + t5 * xtf)
    pv = inv_z_img * (t1 + t2 * ytf) - (t4 + t5 * ytf)
    miss = jnp.sqrt((ru - pu) ** 2 + (rv - pv) ** 2)
    pred_mag = jnp.sqrt(pu * pu + pv * pv)
    tol = jnp.maximum(cfg.parallax_tol_px, cfg.parallax_tol_rel * pred_mag)
    consistent = (miss < tol) & (mag < cfg.parallax_max_px) & valid
    return consistent & model_ok


def flow_residual_mask(
    flow_u: jnp.ndarray, flow_v: jnp.ndarray,
    weight_map: jnp.ndarray,
    valid: jnp.ndarray,
    cfg: DynaConfig,
    key: jax.Array,
    depth_m: jnp.ndarray | None = None,
    unreliable: jnp.ndarray | None = None,
    prev_dyn: jnp.ndarray | None = None,
) -> FlowMaskResult:
    """Compute the dynamic low/high masks from a dense flow field.

    flow_u/v: (H, W) full-resolution flow. weight_map: (H, W) sampling weights
    (see :func:`sample_weights`). valid: (H, W) bool, pixels with valid depth.
    depth_m enables the parallax-consistency exclusion (static structure
    whose residual matches the camera-translation/inverse-depth law is not
    masked). ``unreliable`` (bool, H, W) marks pixels whose flow has no real
    correspondence (photometric warp failure — disocclusion bands); their
    residual is excluded from both masks.
    """
    h, w = flow_u.shape
    step = cfg.sample_grid_step

    # --- grid correspondences (static count: (h//step) * (w//step))
    gy = jnp.arange(step // 2, h - step // 2 + 1, step, dtype=jnp.int32)
    gx = jnp.arange(step // 2, w - step // 2 + 1, step, dtype=jnp.int32)
    yy, xx = jnp.meshgrid(gy, gx, indexing="ij")
    yy = yy.reshape(-1)
    xx = xx.reshape(-1)
    src = jnp.stack([xx, yy], axis=-1).astype(jnp.float32)
    fu = flow_u[yy, xx]
    fv = flow_v[yy, xx]
    dst = src + jnp.stack([fu, fv], axis=-1)
    wts = weight_map[yy, xx] * valid[yy, xx].astype(jnp.float32)

    # --- large-motion test on sampled flow magnitudes (DynaDetect.cc:1086-1114):
    # fires when the `large_motion_frac`-quantile (30th pct) of flow exceeds
    # `large_motion_flow_px`, i.e. when the fraction of pixels BELOW the
    # threshold drops under the quantile.
    fmag = jnp.sqrt(fu * fu + fv * fv)
    n_ok = jnp.sum(valid[yy, xx]) + 1e-9
    frac_below = jnp.sum((fmag <= cfg.large_motion_flow_px) & valid[yy, xx]) / n_ok
    large_motion = frac_below < cfg.large_motion_frac

    # --- camera-motion homography
    H, _inl = ransac_homography(src, dst, wts, key,
                                thresh_px=cfg.ransac_thresh_px,
                                n_hypotheses=cfg.ransac_iters)

    # --- dense residual
    hu, hv = homography_flow(H, h, w)
    ru = flow_u - hu
    rv = flow_v - hv
    mag = jnp.sqrt(ru * ru + rv * rv)

    low, high = _threshold_ladder(mag, valid, cfg)
    low_mask = (mag > low) & valid
    high_mask = (mag > high) & valid

    if depth_m is not None and cfg.parallax_filter:
        parallax = _parallax_consistency(ru, rv, depth_m, valid, mag, cfg,
                                         prev_dyn=prev_dyn)
        low_mask = low_mask & ~parallax
        high_mask = high_mask & ~parallax
    if unreliable is not None and cfg.photo_filter:
        low_mask = low_mask & ~unreliable
        high_mask = high_mask & ~unreliable
    return FlowMaskResult(low_mask, high_mask, mag, H, low, high, large_motion)
