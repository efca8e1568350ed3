#!/usr/bin/env python3
"""Marginal cost of each front-end stage INSIDE the fused graph (dev tool).

Standalone per-stage timings include dispatch overhead and miss XLA's
cross-stage overlap; this measures the fused step with single stages
disabled (replaced by shape-compatible constants), so the delta vs the full
step is the stage's true marginal cost.
"""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from sindslam_tpu.utils import setup_compilation_cache
setup_compilation_cache()

from sindslam_tpu.config import SystemConfig
from sindslam_tpu.datasets.synthetic import generate_sequence
from sindslam_tpu.frontend import pipeline as P
from sindslam_tpu.frontend.clustering import seg_by_kmeans
from sindslam_tpu.frontend.edges import cal_occluded, EdgeResult
from sindslam_tpu.frontend.flow_mask import flow_residual_mask, sample_weights
from sindslam_tpu.frontend.fusion import fuse_masks
from sindslam_tpu.frontend.orb import extract_orb
from sindslam_tpu.frontend.rag_merge import rag_merge
from sindslam_tpu.ops import flow as flow_ops
from sindslam_tpu.ops import image as im

cfg = SystemConfig()
frames = list(generate_sequence(n_frames=8, seed=0, amplitude=0.2))
rgbs = [jnp.asarray(f[0]) for f in frames]
depths = [jnp.asarray(f[1]) for f in frames]

SKIP = os.environ.get("SKIP", "").split(",")


@functools.partial(jax.jit, static_argnames=("cfg", "skip"))
def step_ablated(rgb, depth_m, state, cfg, skip=()):
    gray = im.rgb_to_gray(rgb)
    valid = (depth_m > 0.05) & (depth_m <= cfg.dyna.max_depth_m)
    H, W = cfg.camera.height, cfg.camera.width

    if "flow" in skip:
        u = jnp.zeros((H, W)); v = jnp.zeros((H, W))
        large_motion = jnp.asarray(False)
        pyr_cur = state.pyr_m1
        unreliable = None
    else:
        pyr_cur = flow_ops.working_pyramid(gray, cfg.flow)
        u, v, large_motion, photo_err, _raw = flow_ops.flow_fallback_from_pyramids(
            pyr_cur, state.pyr_m1, state.pyr_m2, valid, state.prev_large,
            cfg.flow, cfg.dyna.large_motion_flow_px,
            cfg.dyna.large_motion_frac, (H, W))
        unreliable = photo_err > cfg.dyna.photo_err_max

    if "kmeans" in skip:
        kml = jnp.zeros((H, W), jnp.int32)
    else:
        kml, _c = seg_by_kmeans(depth_m, cfg.camera, cfg.dyna,
                                state.prev_labels)
    if "edges" in skip:
        z = jnp.zeros((H, W), bool)
        er = EdgeResult(total_area=valid, occluded1=z, occluded2=z,
                        grad_edge=z, endpoints=z,
                        plane_labels=jnp.zeros((H, W), jnp.int32))
    else:
        er = cal_occluded(depth_m, cfg.camera, cfg.dyna)
    if "rag" in skip:
        class RR:
            label_img = jnp.ones((H, W), jnp.int32)
        rr = RR()
    else:
        rr = rag_merge(kml, er.occluded1, er.occluded2, er.total_area,
                       depth_m, cfg.dyna)

    key, k1, k2 = jax.random.split(state.key, 3)
    if "mask" in skip:
        class FM:
            low_mask = jnp.zeros((H, W), bool)
            high_mask = jnp.zeros((H, W), bool)
        fm = FM()
    else:
        wmap = sample_weights(state.prev_mask, state.ratio_img, cfg.dyna, k1)
        fm = flow_residual_mask(u, v, wmap, valid, cfg.dyna, k2,
                                depth_m=depth_m, unreliable=unreliable)
    if "fuse" in skip:
        class FU:
            dyna_mask = jnp.where(valid, cfg.dyna.mask_static, 0
                                  ).astype(jnp.int32)
            dynamic_ratio = jnp.zeros(cfg.dyna.max_clusters + 1)
            ratio_img = jnp.zeros((H, W), jnp.float32)
            dyn_score = jnp.zeros((H, W), jnp.float32)
            dyn_depth = jnp.zeros((H, W), jnp.float32)
        fu = FU()
    else:
        fu = fuse_masks(fm.low_mask, fm.high_mask, state.prev_high,
                        rr.label_img, valid, cfg.dyna,
                        prev_ratio_img=state.ratio_img,
                        prev_dyn_score=state.dyn_score,
                        prev_dyn_depth=state.dyn_depth, depth_m=depth_m)

    dyn_wide = im.dilate_ellipse((fu.dyna_mask == cfg.dyna.mask_dynamic
                                  ).astype(jnp.float32),
                                 cfg.dyna.mask_dilate_ksize) > 0.5
    mask_for_orb = jnp.where(dyn_wide, cfg.dyna.mask_dynamic, fu.dyna_mask)

    if "orb" in skip:
        feats = mask_for_orb.sum()
    else:
        feats = extract_orb(gray, mask_for_orb, cfg.orb, height=H, width=W)

    new_state = P.FrontendState(
        pyr_m1=pyr_cur, pyr_m2=state.pyr_m1, prev_large=large_motion,
        prev_labels=kml, prev_mask=fu.dyna_mask, prev_high=fm.high_mask,
        ratio_img=fu.ratio_img,
        dyn_score=fu.dyn_score,
        dyn_depth=fu.dyn_depth,
        key=key)
    return mask_for_orb, feats, new_state


def timeit(name, skip):
    state = P.init_state(cfg, im.rgb_to_gray(rgbs[0]))
    for i in range(3):
        mask, feats, state = step_ablated(rgbs[i % 8], depths[i % 8], state,
                                          cfg, skip)
    _ = np.asarray(mask[0, 0])
    n = 20
    t0 = time.perf_counter()
    for i in range(n):
        mask, feats, state = step_ablated(rgbs[i % 8], depths[i % 8], state,
                                          cfg, skip)
    _ = np.asarray(mask[0, 0])
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:42s} {dt:7.2f} ms/frame")
    return dt


full = timeit("FULL fused step", ())
for s in ["flow", "kmeans", "edges", "rag", "mask", "fuse", "orb"]:
    d = timeit(f"without {s}", (s,))
    print(f"    -> marginal {s}: {full - d:.2f} ms")
