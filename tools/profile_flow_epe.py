#!/usr/bin/env python3
"""On-TPU flow validation: EPE + timing with the mm-warp fast path (dev tool).

Renders two synthetic frames with known camera motion, computes dense flow,
and reports end-point error against the analytic ground-truth flow plus the
full-pipeline timing. Run after any flow-path change.
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
from sindslam_tpu.datasets.synthetic import (dynamic_offsets,
                                             make_default_scene,
                                             make_trajectory)
from sindslam_tpu.ops import flow as flow_ops
from sindslam_tpu.ops import image as im

if os.environ.get("WARP_MODE") == "gather":
    im.warp_by_flow_mm = im.warp_by_flow  # force the gather warp everywhere

cfg = SystemConfig()
scene = make_default_scene(0, with_dynamic=True)
amp = float(os.environ.get("EPE_AMP", "0.25"))
poses = make_trajectory(8, amp, 0)
offs = dynamic_offsets(8)
rgb1, depth1, dyn1 = scene.render(poses[2], offs[2])
rgb2, depth2, dyn2 = scene.render(poses[4], offs[4])

# analytic ground-truth flow for STATIC pixels: reproject frame-1 points
# into frame 2
H, W = depth1.shape
cam = scene
ys, xs = np.mgrid[0:H, 0:W].astype(np.float64)
z = depth1.astype(np.float64)
x = (xs - cam.cx) / cam.fx * z
y = (ys - cam.cy) / cam.fy * z
pts_c1 = np.stack([x, y, z], -1)
T12 = np.linalg.inv(poses[4]) @ poses[2]       # cam1 -> cam2
p2 = pts_c1 @ T12[:3, :3].T + T12[:3, 3]
u_gt = p2[..., 0] / p2[..., 2] * cam.fx + cam.cx - xs
v_gt = p2[..., 1] / p2[..., 2] * cam.fy + cam.cy - ys
valid_gt = (z > 0.1) & ~dyn1 & (p2[..., 2] > 0.1)

g1 = im.rgb_to_gray(jnp.asarray(rgb1))
g2 = im.rgb_to_gray(jnp.asarray(rgb2))

f = jax.jit(lambda a, b: flow_ops.flow_at_working_scale(a, b, cfg.flow))
u, v = f(g1, g2)
_ = np.asarray(u)[0, 0]
t0 = time.perf_counter()
for _i in range(10):
    u, v = f(g1, g2)
un = np.asarray(u)
dt = (time.perf_counter() - t0) / 10 * 1000
vn = np.asarray(v)

epe = np.sqrt((un - u_gt) ** 2 + (vn - v_gt) ** 2)
sel = valid_gt & (np.hypot(u_gt, v_gt) < 60)
print(f"flow time: {dt:.2f} ms")
print(f"EPE mean {epe[sel].mean():.3f}  median {np.median(epe[sel]):.3f}  "
      f"p90 {np.percentile(epe[sel], 90):.3f}  "
      f"gt mag mean {np.hypot(u_gt, v_gt)[sel].mean():.2f} px")
