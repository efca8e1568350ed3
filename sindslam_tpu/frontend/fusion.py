"""Mask fusion: combine flow-residual masks with geometric clusters.

Re-implements the final fusion stage of ``DetectDynaArea``
(reference ``ORB_SLAM2/src/DynaDetect.cc:1560-1634``):

- the low mask is OR'd with the previous frame's high mask (``:1560-1561``),
  restricted to the valid-depth area and dilated x5 (``:1563-1565``);
- per cluster, if enough high-residual evidence exists (area > 100 with
  roundness > 0.2, or area > 2000), the high seed is geodesically grown
  through the low mask inside the cluster (the TPU reformulation of the
  bounded flood fill, ``:1566-1608``);
- a cluster whose filled fraction exceeds 50% becomes entirely dynamic
  (``:1610-1619``); the result is dilated x9 and encoded 255=dynamic,
  125=static valid, 0=depth-invalid (``:1622-1634``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from sindslam_tpu.config import DynaConfig
from sindslam_tpu.ops import image as im

_K_LABELS = 33   # label ids 0..32 (0 invalid + up to 32 clusters)
_FILL_ITERS = 12
_FILL_K = 9


class FusionResult(NamedTuple):
    dyna_mask: jnp.ndarray        # (H, W) int32: 255 / 125 / 0
    dynamic_ratio: jnp.ndarray    # (_K_LABELS,) per-label dynamic fraction
    filled: jnp.ndarray           # (H, W) bool pre-dilation dynamic region


def _per_label_sum(values: jnp.ndarray, label_img: jnp.ndarray) -> jnp.ndarray:
    """Per-label sums via a one-hot matmul (MXU) — scatters serialize on TPU."""
    lab = jnp.clip(label_img.reshape(-1), 0, _K_LABELS - 1)
    onehot = (lab[:, None] == jnp.arange(_K_LABELS)[None, :]).astype(jnp.float32)
    return jnp.matmul(values.reshape(1, -1).astype(jnp.float32), onehot,
                      precision=jax.lax.Precision.DEFAULT)[0]


@functools.partial(jax.jit, static_argnames=("cfg",))
def fuse_masks(
    low_mask: jnp.ndarray,        # bool (H, W) from flow_residual_mask
    high_mask: jnp.ndarray,       # bool (H, W)
    prev_high_mask: jnp.ndarray,  # bool (H, W) previous frame's high mask
    label_img: jnp.ndarray,       # int32 (H, W) cluster labels (0 invalid)
    valid: jnp.ndarray,           # bool (H, W) valid depth
    cfg: DynaConfig,
) -> FusionResult:
    h, w = low_mask.shape

    low = (low_mask | prev_high_mask) & valid
    low = im.dilate(low.astype(jnp.float32), 3,
                    iterations=cfg.fuse_dilate_iters) > 0.5
    high = high_mask & valid

    # --- per-contour high-evidence gate: the reference tests each connected
    # high-error region's area/roundness (DynaDetect.cc:1566-1608), NOT the
    # per-cluster total — scattered parallax noise summed over a big cluster
    # must not pass the 'big blob' branch.
    ones = jnp.ones((h, w), jnp.float32)
    clus_area = _per_label_sum(ones, label_img)
    high_in = high & (label_img > 0)
    # component analysis at QUARTER resolution (area x1/16, perimeter x1/4,
    # roundness invariant): the eligible regions are fat blobs (min area 100
    # at full res), so granularity survives, and the pointer-jumping gathers
    # + segment_sums that dominate fusion cost shrink 4x vs half res.
    high_2 = high_in[::2, ::2] | high_in[1::2, ::2] | high_in[::2, 1::2] | high_in[1::2, 1::2]
    high_h = high_2[::2, ::2] | high_2[1::2, ::2] | high_2[::2, 1::2] | high_2[1::2, 1::2]
    if jax.default_backend() == "tpu":
        from sindslam_tpu.ops.pallas_kernels import cc_labels_pallas

        qh, qw = high_h.shape
        idx0 = (jnp.arange(qh * qw, dtype=jnp.int32) + 1).reshape(qh, qw)
        seed = jnp.where(high_h, idx0, 0)
        comp_h = cc_labels_pallas(seed, high_h, high_h, n_sweeps=256)
    else:
        comp_h = im.connected_relabel(high_h, n_iters=24)
    hh, hw = comp_h.shape
    comp_flat_h = comp_h.reshape(-1)
    n_seg = hh * hw + 1
    area_c = jax.ops.segment_sum(high_h.reshape(-1).astype(jnp.float32),
                                 comp_flat_h, num_segments=n_seg)
    interior_h = im.erode(high_h.astype(jnp.float32), 3) > 0.5
    perim_c = jax.ops.segment_sum((high_h & ~interior_h).reshape(-1).astype(jnp.float32),
                                  comp_flat_h, num_segments=n_seg)
    roundness_c = 4.0 * jnp.pi * area_c / jnp.maximum(perim_c * perim_c, 1.0)
    eligible_c = ((area_c > cfg.flood_min_area / 16.0)
                  & (roundness_c > cfg.flood_roundness)) \
        | (area_c > cfg.flood_big_area / 16.0)
    eligible_c = eligible_c.at[0].set(False)

    # --- geodesic growth of eligible high seeds through the low mask
    elig_h = eligible_c[comp_flat_h].reshape(hh, hw)
    elig_full = jnp.repeat(jnp.repeat(elig_h, 4, axis=0), 4, axis=1)[:h, :w]
    seed = high_in & elig_full
    grow_zone = low & (label_img > 0)

    # label-preserving growth: dilate the (label * seed) image and require the
    # grown label to match the pixel's own label, so fill never jumps clusters
    def grow_labeled(state, _):
        s = state
        lab_seed = jnp.where(s, label_img, 0)
        g = im.dilate(lab_seed, _FILL_K)
        ok = (g == label_img) & (g > 0) & grow_zone
        return ok | s, None

    filled, _ = lax.scan(grow_labeled, seed, None, length=_FILL_ITERS)

    # --- whole-cluster promotion
    fill_area = _per_label_sum(filled.astype(jnp.float32), label_img)
    frac = fill_area / jnp.maximum(clus_area, 1.0)
    full_dyn = frac > cfg.cluster_dynamic_frac
    full_dyn = full_dyn.at[0].set(False)
    dynamic = filled | (full_dyn[jnp.clip(label_img, 0, _K_LABELS - 1)] & (label_img > 0))

    dynamic_ratio = _per_label_sum(dynamic.astype(jnp.float32), label_img) / \
        jnp.maximum(clus_area, 1.0)

    # --- final dilation + encoding
    dyn_wide = im.dilate(dynamic.astype(jnp.float32), 3,
                         iterations=cfg.final_dilate_iters) > 0.5
    mask = jnp.where(dyn_wide & valid, cfg.mask_dynamic,
                     jnp.where(valid, cfg.mask_static, cfg.mask_invalid))
    return FusionResult(dyna_mask=mask.astype(jnp.int32),
                        dynamic_ratio=dynamic_ratio, filled=dynamic)
