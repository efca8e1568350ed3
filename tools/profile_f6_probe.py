#!/usr/bin/env python3
"""Why does the dyn_walk background promote at frame 6? (dev probe)

Re-derives the flow-mask internals for one frame by replaying frontend_step
states and calling the stages with the same keys the pipeline used.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from sindslam_tpu.utils import setup_compilation_cache
setup_compilation_cache()

import jax
import jax.numpy as jnp

from sindslam_tpu.evaluation.benchmark import scaled_system_config
from sindslam_tpu.datasets.synthetic import make_benchmark_sequence
from sindslam_tpu.frontend.pipeline import frontend_step, init_state
from sindslam_tpu.frontend.flow_mask import (flow_residual_mask,
                                             sample_weights,
                                             _parallax_consistency)
from sindslam_tpu.ops import flow as flow_ops
from sindslam_tpu.ops import image as im

PROBE = int(os.environ.get("PROBE_FRAME", "6"))
cfg = scaled_system_config(1.0)
frames, _ = make_benchmark_sequence("dyn_walk", n_frames=10, scale=1.0)

state = init_state(cfg, im.rgb_to_gray(jnp.asarray(frames[0][0])))
for i in range(PROBE):
    out, state = frontend_step(jnp.asarray(frames[i][0]),
                               jnp.asarray(frames[i][1]), state, cfg)

# replay frame PROBE by hand
rgb = jnp.asarray(frames[PROBE][0])
depth_m = jnp.asarray(frames[PROBE][1])
gray = im.rgb_to_gray(rgb)
valid = (depth_m > 0.05) & (depth_m <= cfg.dyna.max_depth_m)
pyr_cur = flow_ops.working_pyramid(gray, cfg.flow)
u, v, large, photo_err, _raw = flow_ops.flow_fallback_from_pyramids(
    pyr_cur, state.pyr_m1, state.pyr_m2, valid, state.prev_large,
    cfg.flow, cfg.dyna.large_motion_flow_px, cfg.dyna.large_motion_frac,
    (cfg.camera.height, cfg.camera.width))
unreliable = photo_err > cfg.dyna.photo_err_max
key, k1, k2 = jax.random.split(state.key, 3)
wmap = sample_weights(state.prev_mask, state.ratio_img, cfg.dyna, k1)
fm = flow_residual_mask(u, v, wmap, valid, cfg.dyna, k2, depth_m=depth_m,
                        unreliable=unreliable)
par = _parallax_consistency(u - u + fm.residual_mag * 0, u * 0, depth_m,
                            valid, fm.residual_mag, cfg.dyna)  # placeholder

print(f"frame {PROBE}: prev_large={bool(np.asarray(state.prev_large))} "
      f"large={bool(np.asarray(large))}")
print(f"low={float(fm.low_thresh):.2f} high={float(fm.high_thresh):.2f} px")
mag = np.asarray(fm.residual_mag)
vv = np.asarray(valid)
print(f"residual mag: p50={np.percentile(mag[vv], 50):.2f} "
      f"p90={np.percentile(mag[vv], 90):.2f} p99={np.percentile(mag[vv], 99):.2f}")
print(f"low_mask={int(np.asarray(fm.low_mask).sum())} "
      f"high_mask={int(np.asarray(fm.high_mask).sum())} "
      f"unreliable={int(np.asarray(unreliable & valid).sum())}")

# parallax exclusion actually used inside flow_residual_mask:
from sindslam_tpu.frontend import flow_mask as fmod
hu_hv = fmod.homography_flow(fm.homography, *mag.shape)
ru = u - hu_hv[0]
rv = v - hu_hv[1]
cons = fmod._parallax_consistency(ru, rv, depth_m, valid, fm.residual_mag,
                                  cfg.dyna)
cons_np = np.asarray(cons)
print(f"parallax-consistent px: {cons_np.sum()}")
gt = np.asarray(frames[PROBE][2]) > 0
raw_high = (mag > float(fm.high_thresh)) & vv
print(f"raw high (pre-filters): {raw_high.sum()}  on GT: {(raw_high & gt).sum()}  "
      f"off GT: {(raw_high & ~gt).sum()}")
off = raw_high & ~gt
print(f"off-GT high killed by parallax: {(off & cons_np).sum()}, "
      f"by photo: {(off & np.asarray(unreliable)).sum()}")
print(f"residual mag off-GT p50/p90: {np.percentile(mag[~gt & vv], 50):.2f} "
      f"{np.percentile(mag[~gt & vv], 90):.2f}")
