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
_FILL_K_H = 5    # growth kernel at HALF res (~= the r2 full-res 9)


class FusionResult(NamedTuple):
    dyna_mask: jnp.ndarray        # (H, W) int32: 255 / 125 / 0
    dynamic_ratio: jnp.ndarray    # (_K_LABELS,) per-label dynamic fraction
    ratio_img: jnp.ndarray        # (H, W) f32 per-pixel cluster dynamic
    #   ratio (dynamic_ratio[label_img], computed in-graph by a one-hot
    #   matmul — a full-res 307k-index gather costs ~2.8 ms on the TPU
    #   scalar unit, the matmul rides the MXU)
    filled: jnp.ndarray           # (H, W) bool pre-dilation dynamic region
    dyn_score: jnp.ndarray        # (H, W) f32 decaying per-pixel dynamic
    #   evidence (temporal persistence state; feed back as prev_dyn_score)
    dyn_depth: jnp.ndarray        # (H, W) f32 depth at which the evidence
    #   was observed (persistence releases where depth has since changed)


def _label_onehot(label_img: jnp.ndarray) -> jnp.ndarray:
    """(H*W, K) one-hot of the label image — built ONCE per call and shared
    by every per-label sum (scatters serialize on TPU; the matmul rides the
    MXU)."""
    lab = jnp.clip(label_img.reshape(-1), 0, _K_LABELS - 1)
    return (lab[:, None] == jnp.arange(_K_LABELS)[None, :]).astype(jnp.float32)


def _per_label_sums(values: jnp.ndarray, onehot: jnp.ndarray) -> jnp.ndarray:
    """(B, H*W) stacked value images -> (B, K) per-label sums in one matmul.

    HIGHEST precision: these are COUNTS (areas, coverages) feeding
    promotion thresholds — bf16 accumulation over 77k elements drifts ~1%
    and flips knife-edge promotions between CPU and TPU runs. The matmul
    is (B, HW/4) x (HW/4, 33): negligible either way."""
    return jnp.matmul(values.astype(jnp.float32), onehot,
                      precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnames=("cfg", "debug_skip"))
def fuse_masks(
    low_mask: jnp.ndarray,        # bool (H, W) from flow_residual_mask
    high_mask: jnp.ndarray,       # bool (H, W)
    prev_high_mask: jnp.ndarray,  # bool (H, W) previous frame's high mask
    label_img: jnp.ndarray,       # int32 (H, W) cluster labels (0 invalid)
    valid: jnp.ndarray,           # bool (H, W) valid depth
    cfg: DynaConfig,
    prev_ratio_img: jnp.ndarray | None = None,  # (H, W) f32 prev per-pixel
    #   cluster dynamic ratio (persistence evidence); None disables
    prev_dyn_score: jnp.ndarray | None = None,  # (H, W) f32 decaying pixel
    #   dynamic score from the previous frame; None disables persistence
    prev_dyn_depth: jnp.ndarray | None = None,  # (H, W) f32 evidence depth
    depth_m: jnp.ndarray | None = None,         # (H, W) f32 current depth
    flow_w: tuple | None = None,  # (u, v, ok) RAW working-scale flow
    #   n->prev target + scalar moderate-motion verdict (the trailing
    #   elements of the flow_fallback_from_pyramids return); motion-
    #   compensates the persisted evidence so it follows the mover instead
    #   of ghosting at its stale position. Applied only where ok: at
    #   extreme motion the flow is too unreliable to move masks by
    #   (fast_cam at 4x walking speed lost tracking when warped)
    flow_scale: jnp.ndarray | None = None,  # scalar: 1.0 when the raw flow
    #   is n->n-1 (large motion), 0.5 when it is n->n-2 (constant-velocity
    #   estimate of the one-frame displacement the persisted state needs)
    debug_skip: tuple = (),  # dev-only: internal stages to stub out when
    #   profiling marginal costs (tools/profile_fuse_ablation.py)
) -> FusionResult:
    h, w = low_mask.shape

    # --- everything between here and the final dilation runs at HALF
    # resolution: the fill structures are fat (dilated low mask, min blob
    # area 100 full-res px) and the output mask gets a wide final dilation
    # anyway, while the per-label one-hot matmuls (307k x 33 f32 = 40 MB a
    # piece at full res) and the 12-iteration grow loop dominate the
    # stage's HBM traffic (r3 ablation: fuse ~2nd-hottest stage).
    # NB: every 2x downsample here goes through im.subsample/block_or2 —
    # a strided slice of a tiled image lowers to a ~0.8 ms scalar-unit
    # gather on this TPU runtime (r3 trace: ~7 ms/frame of [::2] slices in
    # this stage alone); the selection matmuls are ~µs on the MXU.
    label_h = im.subsample(label_img)
    valid_h = im.subsample(valid)
    onehot_h = _label_onehot(label_h)                   # (HW/4, 33), shared

    low_h = im.subsample((low_mask | prev_high_mask) & valid)
    low_h = im.dilate(low_h.astype(jnp.float32), 3,
                      iterations=max(cfg.fuse_dilate_iters // 2, 1)) > 0.5
    high = high_mask & valid

    # --- per-contour high-evidence gate: the reference tests each connected
    # high-error region's area/roundness (DynaDetect.cc:1566-1608), NOT the
    # per-cluster total — scattered parallax noise summed over a big cluster
    # must not pass the 'big blob' branch.
    clus_area = _per_label_sums(jnp.ones((1, low_h.size), jnp.float32),
                                onehot_h)[0]            # half-res px counts
    high_in = high & (label_img > 0)
    # component analysis at QUARTER resolution (area x1/16, perimeter x1/4,
    # roundness invariant): the eligible regions are fat blobs (min area 100
    # at full res), so granularity survives, and the pointer-jumping gathers
    # + segment_sums that dominate fusion cost shrink 4x vs half res.
    high_2 = im.block_or2(high_in)
    high_h = im.block_or2(high_2)
    if "cc" in debug_skip:
        elig_half = high_2
    else:
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

        # --- geodesic growth of eligible high seeds through the low mask, at
        # half res (kernel halved to cover the same metric reach per iteration)
        elig_q = eligible_c[comp_flat_h].reshape(hh, hw)
        elig_half = jnp.repeat(jnp.repeat(elig_q, 2, axis=0), 2, axis=1)[
            :label_h.shape[0], :label_h.shape[1]]
    seed_h = high_2 & elig_half
    grow_zone_h = low_h & (label_h > 0)

    # label-preserving growth: dilate the (label * seed) image and require the
    # grown label to match the pixel's own label, so fill never jumps clusters
    def grow_labeled(state, _):
        s = state
        lab_seed = jnp.where(s, label_h, 0)
        g = im.dilate(lab_seed, _FILL_K_H)
        ok = (g == label_h) & (g > 0) & grow_zone_h
        return ok | s, None

    if "grow" in debug_skip:
        filled_h = seed_h
    else:
        filled_h, _ = lax.scan(grow_labeled, seed_h, None,
                               length=_FILL_ITERS, unroll=_FILL_ITERS)

    # --- whole-cluster promotion (ratios are resolution-invariant).
    # Temporal persistence: the promotion test uses the MAX of current fill
    # evidence and the decayed previous-frame dynamic ratio averaged over
    # the cluster, so a mover that momentarily stops (zero flow residual,
    # e.g. the dyn_walk board at its turning point) stays masked and is
    # released after ~2-3 evidence-free frames (persist_ratio_decay).
    if prev_ratio_img is None:
        prev_ratio_h = jnp.zeros_like(label_h, dtype=jnp.float32)
    else:
        prev_ratio_h = im.subsample(prev_ratio_img).astype(jnp.float32)
    if "promote" in debug_skip:
        sums = jnp.zeros((3, _K_LABELS), jnp.float32)
    else:
        sums = _per_label_sums(
            jnp.stack([filled_h.reshape(-1).astype(jnp.float32),
                       prev_ratio_h.reshape(-1),
                       high_2.reshape(-1).astype(jnp.float32)]), onehot_h)
    fill_area = sums[0]
    frac = fill_area / jnp.maximum(clus_area, 1.0)
    prev_mean = sums[1] / jnp.maximum(clus_area, 1.0)
    high_cover = sums[2] / jnp.maximum(clus_area, 1.0)
    # A first-time promotion needs HIGH-residual corroboration over the
    # cluster (promote_min_high_cover): a fill that carpets a cluster
    # through the low mask alone is residual parallax, not a mover. The
    # evidence fraction of unsupported fills is capped just below the
    # promotion threshold, so they can neither promote now nor (after
    # decay) sustain a promotion later — this breaks the false-positive
    # accumulation spiral parallax carpets caused at full res.
    frac_ev = jnp.where(high_cover > cfg.promote_min_high_cover, frac,
                        jnp.minimum(frac, cfg.cluster_dynamic_frac))
    # ramp limiter: the evidence ratio climbs at most promote_ratio_ramp
    # per frame above the cluster's decayed history, so one-frame residual
    # bursts over a long-static cluster cannot reach promotion
    frac_ev = jnp.minimum(frac_ev, prev_mean + cfg.promote_ratio_ramp)
    persist = jnp.maximum(frac_ev, prev_mean * cfg.persist_ratio_decay)
    full_dyn = persist > cfg.cluster_dynamic_frac
    full_dyn = full_dyn.at[0].set(False)
    # per-pixel lookup of the 33-entry per-label tables by ONE one-hot
    # matmul (label gathers at half res cost ~0.7 ms each on the scalar
    # unit; the (HW/4, 33) x (33, 2) contraction is MXU work). Column 0 is
    # zeroed in both tables, so invalid pixels read 0.
    dynamic_ratio = persist.at[0].set(0.0)
    tables = jnp.stack([full_dyn.astype(jnp.float32), dynamic_ratio], -1)
    px_tab = jnp.matmul(onehot_h, tables,
                        precision=jax.lax.Precision.HIGHEST)
    full_dyn_px = px_tab[:, 0].reshape(label_h.shape) > 0.5
    ratio_h = px_tab[:, 1].reshape(label_h.shape)
    dynamic_h = filled_h | (full_dyn_px & (label_h > 0))

    # --- per-pixel temporal persistence: dynamic evidence decays over
    # frames instead of vanishing the instant the flow residual does. A
    # mover pausing mid-stride (residual < the 1.7 px noise floor the
    # reference also clamps at, DynaDetect.cc:1309-1367) stays masked for
    # ~log(0.5)/log(decay) frames, then releases. Evidence-only update: the
    # score never feeds on its own thresholded output, so it cannot
    # self-sustain.
    if "persist" in debug_skip:
        prev_dyn_score = None
        prev_dyn_depth = None
        depth_m = None
    if prev_dyn_score is None:
        prev_score_h = jnp.zeros_like(label_h, dtype=jnp.float32)
    else:
        prev_score_h = im.subsample(prev_dyn_score).astype(jnp.float32)
    # motion-compensate the persisted evidence: sample the previous score/
    # depth where the flow says each pixel's content was last frame, so a
    # bridged mover keeps its mask AT ITS CURRENT POSITION instead of
    # leaving a ghost trail on disoccluded background (which keeps its own
    # stable depth, so the depth release below cannot evict it). Score out
    # of warp bounds = no evidence. Half-res warps; mm path on TPU (two
    # ~0.3 ms contractions vs a ~77k-index scalar-unit gather each).
    warp_uv_h = None
    if flow_w is not None and prev_dyn_score is not None \
            and "persistwarp" not in debug_skip:
        fw_u, fw_v, flow_ok = flow_w
        wh, ww = fw_u.shape
        h2, w2 = label_h.shape
        sc = 1.0 if flow_scale is None else flow_scale
        u_h = im.resize_bilinear(fw_u, (h2, w2)) * ((w2 / ww) * sc)
        v_h = im.resize_bilinear(fw_v, (h2, w2)) * ((h2 / wh) * sc)
        warp_uv_h = (u_h, v_h, flow_ok)
        if jax.default_backend() == "tpu" and min(h2, w2) >= 96:
            warped_s, s_inb = im.warp_by_flow_mm(prev_score_h, u_h, v_h)
        else:
            warped_s, s_inb = im.warp_by_flow(prev_score_h, u_h, v_h)
        prev_score_h = jnp.where(flow_ok & s_inb, warped_s, prev_score_h)
        prev_score_h = jnp.where(flow_ok & ~s_inb, 0.0, prev_score_h)
    # Persistence EVIDENCE is ELIGIBLE high-residual blobs (seed_h: the
    # area+roundness-gated components) and promoted clusters — NOT raw
    # high pixels and NOT low-mask fills: on large-motion (n->n-1) frames
    # the raw high mask is mostly scattered parallax/noise (measured
    # precision 0.04-0.15 while the mover sits under the threshold
    # ladder's noise clamp), and every such pixel fed to the score paints
    # stable-depth background the depth release can never evict; fills
    # carpet through the low mask the same way (50k+ FP px by frame 7 at
    # full res when fill-fed). The blob gate keeps only mover-shaped
    # evidence; promotions are corroborated by high coverage.
    evidence_h = seed_h | (full_dyn_px & (label_h > 0))
    # depth-change release (the reference's own 13% occlusion-veto law,
    # octomap_pub/src/pubPointCloud.cc:600): evidence remembers the depth
    # it was observed at; where the scene depth has since changed, the
    # object LEFT (its trail now shows background) and the persisted score
    # is evicted instead of decayed. A paused mover keeps its depth, so it
    # keeps its mask.
    if depth_m is not None:
        d_h = im.subsample(depth_m).astype(jnp.float32)
        if prev_dyn_depth is None:
            prev_depth_h = d_h
        else:
            prev_depth_h = im.subsample(prev_dyn_depth).astype(jnp.float32)
            if warp_uv_h is not None:
                # evidence depth rides with its score (same warp): the
                # depth-release compares the CURRENT depth under the mover
                # against the depth the evidence was observed at
                wu_h, wv_h, flow_ok = warp_uv_h
                if jax.default_backend() == "tpu" \
                        and min(prev_depth_h.shape) >= 96:
                    warped_d, d_inb = im.warp_by_flow_mm(
                        prev_depth_h, wu_h, wv_h)
                else:
                    warped_d, d_inb = im.warp_by_flow(
                        prev_depth_h, wu_h, wv_h)
                prev_depth_h = jnp.where(
                    flow_ok, jnp.where(d_inb, warped_d, d_h), prev_depth_h)
        depth_ok = jnp.abs(d_h - prev_depth_h) < \
            jnp.maximum(0.12, 0.13 * prev_depth_h)
        carried = prev_score_h * cfg.persist_ratio_decay * depth_ok
        depth_store_h = jnp.where(evidence_h, d_h, prev_depth_h)
    else:
        d_h = jnp.zeros_like(label_h, dtype=jnp.float32)
        carried = prev_score_h * cfg.persist_ratio_decay
        depth_store_h = d_h
    score_h = jnp.maximum(evidence_h.astype(jnp.float32), carried)
    score_h = jnp.where(valid_h, score_h, 0.0)
    dynamic_h = dynamic_h | ((score_h > 0.5) & (label_h > 0))

    # --- upsample, final dilation + encoding (full res)
    dynamic = jnp.repeat(jnp.repeat(dynamic_h, 2, axis=0), 2, axis=1)[:h, :w]
    dynamic = dynamic & (label_img > 0)
    dyn_score = jnp.repeat(jnp.repeat(score_h, 2, axis=0), 2, axis=1)[:h, :w]
    dyn_depth = jnp.repeat(jnp.repeat(depth_store_h, 2, axis=0), 2,
                           axis=1)[:h, :w]
    ratio_img = jnp.repeat(jnp.repeat(ratio_h, 2, axis=0), 2, axis=1)[:h, :w]
    if "dilate" in debug_skip:
        dyn_wide = dynamic
    else:
        dyn_wide = im.dilate(dynamic.astype(jnp.float32), 3,
                             iterations=cfg.final_dilate_iters) > 0.5
    mask = jnp.where(dyn_wide & valid, cfg.mask_dynamic,
                     jnp.where(valid, cfg.mask_static, cfg.mask_invalid))
    return FusionResult(dyna_mask=mask.astype(jnp.int32),
                        dynamic_ratio=dynamic_ratio, ratio_img=ratio_img,
                        filled=dynamic,
                        dyn_score=dyn_score, dyn_depth=dyn_depth)
