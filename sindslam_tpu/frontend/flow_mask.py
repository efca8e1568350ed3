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

    The histogram runs on a 2x-subsampled field via a one-hot matmul: the
    thresholds are distribution statistics (quarter sampling doesn't move
    them), and a 307k-element scatter serializes on TPU.
    """
    m2 = mag[::2, ::2]
    w2 = valid[::2, ::2].astype(jnp.float32)
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


def flow_residual_mask(
    flow_u: jnp.ndarray, flow_v: jnp.ndarray,
    weight_map: jnp.ndarray,
    valid: jnp.ndarray,
    cfg: DynaConfig,
    key: jax.Array,
) -> FlowMaskResult:
    """Compute the dynamic low/high masks from a dense flow field.

    flow_u/v: (H, W) full-resolution flow. weight_map: (H, W) sampling weights
    (see :func:`sample_weights`). valid: (H, W) bool, pixels with valid depth.
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
    return FlowMaskResult(low_mask, high_mask, mag, H, low, high, large_motion)
