"""The fused per-frame front-end: ONE jitted XLA computation per frame.

This is the TPU answer to the reference's thread+promise overlap
(``DynaDetect.cc:1396-1398``): dense flow, k-means re-clustering, edges, RAG
merge, homography/residual masking, fusion, and masked ORB extraction are all
branches of a single XLA graph — the compiler schedules the overlap, state
stays device-resident, and the host sees exactly one dispatch per frame.

``frontend_step`` is the benchmark unit for bench.py (flow + recluster + ORB
at 640x480, the BASELINE.json metric) and the flagship ``entry()`` for
__graft_entry__.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from sindslam_tpu.config import SystemConfig
from sindslam_tpu.frontend.clustering import seg_by_kmeans
from sindslam_tpu.frontend.edges import cal_occluded
from sindslam_tpu.frontend.flow_mask import flow_residual_mask, sample_weights
from sindslam_tpu.frontend.fusion import fuse_masks
from sindslam_tpu.frontend.orb import OrbFeatures, extract_orb
from sindslam_tpu.frontend.rag_merge import rag_merge
from sindslam_tpu.ops import flow as flow_ops
from sindslam_tpu.ops import image as im


class FrontendState(NamedTuple):
    """Device-resident recurrent state of the front-end."""

    pyr_m1: Tuple[jnp.ndarray, ...]  # working-scale flow pyramid, frame n-1
    pyr_m2: Tuple[jnp.ndarray, ...]  # working-scale flow pyramid, frame n-2
    prev_large: jnp.ndarray  # scalar bool: last frame's large-motion verdict
    prev_labels: jnp.ndarray  # (H, W) int32 k-means warm start
    prev_mask: jnp.ndarray   # (H, W) int32 previous dyna mask (255/125/0)
    prev_high: jnp.ndarray   # (H, W) bool previous high-residual mask
    ratio_img: jnp.ndarray   # (H, W) float32 per-pixel cluster dynamic ratio
    dyn_score: jnp.ndarray   # (H, W) float32 decaying per-pixel dynamic
    #                          evidence (temporal persistence)
    dyn_depth: jnp.ndarray   # (H, W) float32 depth at which the dynamic
    #                          evidence was observed (trail release)
    flow_u_w: jnp.ndarray    # (wh, ww) float32 previous frame's RAW
    flow_v_w: jnp.ndarray    # working-scale flow (wide-baseline composition
    #                          on large-motion frames + persistence warp)
    key: jax.Array


class FrontendOutput(NamedTuple):
    dyna_mask: jnp.ndarray   # (H, W) int32 255/125/0 (pre driver-dilation)
    label_img: jnp.ndarray   # (H, W) int32 cluster labels
    features: OrbFeatures    # masked ORB features
    large_motion: jnp.ndarray
    kp_depth: jnp.ndarray    # (N,) per-keypoint depth (0 = invalid) — the
    #                          Frame's ComputeStereoFromRGBD fused in, so the
    #                          tracker needs no extra build_frame dispatch
    kp_ur: jnp.ndarray       # (N,) virtual-right u (-1 = mono)


def init_state(cfg: SystemConfig, gray0: jnp.ndarray) -> FrontendState:
    h, w = cfg.camera.height, cfg.camera.width
    pyr0 = flow_ops.working_pyramid(gray0, cfg.flow)
    return FrontendState(
        pyr_m1=pyr0,
        pyr_m2=pyr0,
        prev_large=jnp.asarray(False),
        prev_labels=jnp.full((h, w), -1, jnp.int32),
        prev_mask=jnp.zeros((h, w), jnp.int32),
        prev_high=jnp.zeros((h, w), bool),
        ratio_img=jnp.zeros((h, w), jnp.float32),
        dyn_score=jnp.zeros((h, w), jnp.float32),
        dyn_depth=jnp.zeros((h, w), jnp.float32),
        flow_u_w=jnp.zeros((cfg.flow.working_height, cfg.flow.working_width),
                           jnp.float32),
        flow_v_w=jnp.zeros((cfg.flow.working_height, cfg.flow.working_width),
                           jnp.float32),
        key=jax.random.PRNGKey(0),
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def frontend_step(
    rgb: jnp.ndarray,        # (H, W, 3) uint8
    depth_m: jnp.ndarray,    # (H, W) float32 metres
    state: FrontendState,
    cfg: SystemConfig,
) -> Tuple[FrontendOutput, FrontendState]:
    """Full front-end for one frame: flow + recluster + masking + masked ORB.

    (State donation is deliberately NOT used: donated buffers trip an
    InvalidArgument in the axon tunnel runtime; the copies are cheap
    relative to the compute.)
    """
    gray = im.rgb_to_gray(rgb)
    valid = (depth_m > 0.05) & (depth_m <= cfg.dyna.max_depth_m)

    # flow n -> n-2 preferred; large-motion fallback to n -> n-1 (reference
    # DynaDetect.cc:1086-1131). The coarse levels pre-solve against the
    # target PREDICTED by the previous frame's verdict and the magnitude
    # test then either continues the same solve or (regime flip only)
    # restarts against the other frame — steady state pays exactly ONE
    # coarse-to-fine solve (round 2 solved the flow twice on 93% of
    # benchmark frames). Target pyramids come cached from the state.
    pyr_cur = flow_ops.working_pyramid(gray, cfg.flow)
    u, v, large_motion, photo_err, flow_raw_w = \
        flow_ops.flow_fallback_from_pyramids(
            pyr_cur, state.pyr_m1, state.pyr_m2, valid, state.prev_large,
            cfg.flow, cfg.dyna.large_motion_flow_px,
            cfg.dyna.large_motion_frac,
            (cfg.camera.height, cfg.camera.width),
            prev_flow_w=(state.flow_u_w, state.flow_v_w),
            compose_max_flow_px=cfg.dyna.compose_max_flow_px)
    unreliable = photo_err > cfg.dyna.photo_err_max

    # geometry branch (dataflow-parallel with the flow branch inside XLA)
    kml, _centers = seg_by_kmeans(depth_m, cfg.camera, cfg.dyna, state.prev_labels)
    er = cal_occluded(depth_m, cfg.camera, cfg.dyna)
    rr = rag_merge(kml, er.occluded1, er.occluded2, er.total_area, depth_m, cfg.dyna)

    key, k1, k2 = jax.random.split(state.key, 3)
    wmap = sample_weights(state.prev_mask, state.ratio_img, cfg.dyna, k1)
    fm = flow_residual_mask(u, v, wmap, valid, cfg.dyna, k2, depth_m=depth_m,
                            unreliable=unreliable,
                            prev_dyn=state.prev_mask == cfg.dyna.mask_dynamic)
    fu = fuse_masks(fm.low_mask, fm.high_mask, state.prev_high, rr.label_img,
                    valid, cfg.dyna, prev_ratio_img=state.ratio_img,
                    prev_dyn_score=state.dyn_score,
                    prev_dyn_depth=state.dyn_depth, depth_m=depth_m,
                    flow_w=flow_raw_w,
                    flow_scale=jnp.where(large_motion, 1.0, 0.5))

    # driver-side dilation fused in (reference rgbd_tum_noros.cc:138) —
    # applied only to the FEATURE-erasure mask: the 15x15 ellipse is the
    # reference driver's tracking-safety margin, while the detector's
    # product (returned dyna_mask, evaluated for IoU, fed to mapping) is
    # the fused mask itself, matching the stateful DynaDetector API
    dyn_wide = im.dilate_ellipse((fu.dyna_mask == cfg.dyna.mask_dynamic
                                  ).astype(jnp.float32),
                                 cfg.dyna.mask_dilate_ksize) > 0.5
    mask_for_orb = jnp.where(dyn_wide, cfg.dyna.mask_dynamic, fu.dyna_mask)

    feats = extract_orb(gray, mask_for_orb, cfg.orb,
                        height=cfg.camera.height, width=cfg.camera.width)
    # per-keypoint depth + virtual-stereo uR (Frame::ComputeStereoFromRGBD)
    # fused into the same graph: one fewer dispatch on the tracking path
    from sindslam_tpu.slam.frame import _depth_ur

    kp_depth, kp_ur = _depth_ur(feats.xy, depth_m, cfg.camera)

    new_state = FrontendState(
        pyr_m1=pyr_cur,
        pyr_m2=state.pyr_m1,
        prev_large=large_motion,
        prev_labels=kml,
        prev_mask=fu.dyna_mask,
        prev_high=fm.high_mask,
        ratio_img=fu.ratio_img,
        dyn_score=fu.dyn_score,
        dyn_depth=fu.dyn_depth,
        flow_u_w=flow_raw_w[0],
        flow_v_w=flow_raw_w[1],
        key=key,
    )
    out = FrontendOutput(dyna_mask=fu.dyna_mask.astype(jnp.int32),
                         label_img=rr.label_img, features=feats,
                         large_motion=large_motion,
                         kp_depth=kp_depth, kp_ur=kp_ur)
    return out, new_state
