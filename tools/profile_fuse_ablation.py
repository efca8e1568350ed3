#!/usr/bin/env python3
"""Marginal cost of fuse_masks' INTERNAL stages (dev tool).

fuse_masks measured 16.8 ms marginal inside the fused front-end (r3
ablation) — 2x its standalone time. This times the standalone stage with
single internal pieces stubbed (debug_skip) to find the hot part:
  cc       — quarter-res Pallas CC + segment-sum stats + eligibility
  grow     — the 12-iteration label-preserving growth scan
  promote  — the 3-image per-label one-hot matmul + promotion logic
  persist  — per-pixel temporal persistence (score/depth carry)
  dilate   — the final full-res k3 x9 dilation
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from sindslam_tpu.utils import setup_compilation_cache
setup_compilation_cache()

from sindslam_tpu.config import SystemConfig
from sindslam_tpu.datasets.synthetic import generate_sequence
from sindslam_tpu.frontend.clustering import seg_by_kmeans
from sindslam_tpu.frontend.edges import cal_occluded
from sindslam_tpu.frontend.flow_mask import flow_residual_mask
from sindslam_tpu.frontend.fusion import fuse_masks
from sindslam_tpu.frontend.rag_merge import rag_merge
from sindslam_tpu.ops import flow as flow_ops
from sindslam_tpu.ops import image as im

cfg = SystemConfig()
frames = list(generate_sequence(n_frames=4, seed=0, amplitude=0.05))
rgb = jnp.asarray(frames[1][0])
rgb0 = jnp.asarray(frames[0][0])
depth = jnp.asarray(frames[1][1])
gray = im.rgb_to_gray(rgb)
gray0 = im.rgb_to_gray(rgb0)
valid = (depth > 0.05) & (depth <= cfg.dyna.max_depth_m)
key = jax.random.PRNGKey(0)
H, W = cfg.camera.height, cfg.camera.width

u, v = jax.jit(lambda a, b: flow_ops.flow_at_working_scale(a, b, cfg.flow))(
    gray, gray0)
kml, _ = jax.jit(lambda d: seg_by_kmeans(d, cfg.camera, cfg.dyna, None))(depth)
er = jax.jit(lambda d: cal_occluded(d, cfg.camera, cfg.dyna))(depth)
rr = jax.jit(lambda k, o1, o2, ta, d: rag_merge(k, o1, o2, ta, d, cfg.dyna))(
    kml, er.occluded1, er.occluded2, er.total_area, depth)
fm = jax.jit(lambda u, v, w, va, k: flow_residual_mask(
    u, v, w, va, cfg.dyna, k))(u, v, jnp.ones_like(gray), valid, key)

prev_high = jnp.zeros((H, W), bool)
ratio = jnp.zeros((H, W), jnp.float32)
score = jnp.zeros((H, W), jnp.float32)
ddep = jnp.zeros((H, W), jnp.float32)

N = int(os.environ.get("PROF_ITERS", "30"))


def timeit(name, skip):
    fn = jax.jit(lambda lm, hm, ph, li, va, ri, sc, dd, d: fuse_masks(
        lm, hm, ph, li, va, cfg.dyna, prev_ratio_img=ri, prev_dyn_score=sc,
        prev_dyn_depth=dd, depth_m=d, debug_skip=skip))
    out = fn(fm.low_mask, fm.high_mask, prev_high, rr.label_img, valid,
             ratio, score, ddep, depth)
    _ = np.asarray(out.dyna_mask).ravel()[0]
    t0 = time.perf_counter()
    for _i in range(N):
        out = fn(fm.low_mask, fm.high_mask, prev_high, rr.label_img, valid,
                 ratio, score, ddep, depth)
    _ = np.asarray(out.dyna_mask).ravel()[0]
    dt = (time.perf_counter() - t0) / N * 1000
    print(f"{name:40s} {dt:8.2f} ms", flush=True)
    return dt


full = timeit("fuse FULL", ())
for s in ("cc", "grow", "promote", "persist", "dilate"):
    dt = timeit(f"without {s}", (s,))
    print(f"    -> marginal {s}: {full - dt:.2f} ms", flush=True)
timeit("without everything", ("cc", "grow", "promote", "persist", "dilate"))
