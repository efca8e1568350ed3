#!/usr/bin/env python3
"""Where does the TPU mask diverge from the CPU mask? (dev tool)

Runs the fused front-end over the dyn_walk benchmark frames on THIS
process's default backend and dumps per-frame masks + stage products to an
.npz. Run once under TPU and once under CPU
(JAX_PLATFORMS="" JAX_PLATFORM_NAME=cpu), then compare with --compare.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

if "--compare" in sys.argv:
    a = np.load(sys.argv[2])
    b = np.load(sys.argv[3])
    for k in sorted(a.files):
        if k not in b.files:
            continue
        x, y = a[k], b[k]
        if x.shape != y.shape:
            print(f"{k}: shape {x.shape} vs {y.shape}")
            continue
        if x.dtype == bool or "mask" in k:
            xm = x.astype(bool)
            ym = y.astype(bool)
            inter = (xm & ym).sum()
            union = (xm | ym).sum()
            print(f"{k}: IoU(cpu,tpu)={inter / max(union, 1):.3f} "
                  f"(cpu {xm.sum()} px, other {ym.sum()} px)")
        else:
            d = np.abs(x.astype(np.float64) - y.astype(np.float64))
            print(f"{k}: max|d|={d.max():.4g} mean|d|={d.mean():.4g}")
    sys.exit(0)

from sindslam_tpu.utils import setup_compilation_cache
setup_compilation_cache()

import jax
import jax.numpy as jnp

from sindslam_tpu.evaluation.benchmark import scaled_system_config
from sindslam_tpu.datasets.synthetic import make_benchmark_sequence
from sindslam_tpu.frontend.pipeline import frontend_step, init_state
from sindslam_tpu.ops import image as im
from sindslam_tpu.ops import flow as flow_ops

out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mask_drift.npz"
cfg = scaled_system_config(1.0)
frames, _scene = make_benchmark_sequence("dyn_walk", n_frames=10, scale=1.0)

state = init_state(cfg, im.rgb_to_gray(jnp.asarray(frames[0][0])))
dump = {}
ious = []
for i, (rgb, depth, gt_dyn, _pose, _ts) in enumerate(frames):
    out, state = frontend_step(jnp.asarray(rgb), jnp.asarray(depth),
                               state, cfg)
    mask = np.asarray(out.dyna_mask)
    pred = mask == cfg.dyna.mask_dynamic
    gt = np.asarray(gt_dyn) > 0
    iou = (pred & gt).sum() / max((pred | gt).sum(), 1)
    ious.append(iou)
    dump[f"mask{i:02d}"] = pred
    dump[f"ratio{i:02d}"] = np.asarray(state.ratio_img)
    dump[f"score{i:02d}"] = np.asarray(state.dyn_score)
    dump[f"labels{i:02d}"] = np.asarray(state.prev_labels)
    dump[f"high{i:02d}"] = np.asarray(state.prev_high)

# isolated flow check on the worst frame pair
g0 = im.rgb_to_gray(jnp.asarray(frames[4][0]))
g1 = im.rgb_to_gray(jnp.asarray(frames[6][0]))
p0 = flow_ops.working_pyramid(g0, cfg.flow)
p1 = flow_ops.working_pyramid(g1, cfg.flow)
valid = jnp.asarray(frames[6][1]) > 0.05
u, v, lm, pe, _raw = flow_ops.flow_fallback_from_pyramids(
    p1, p0, p0, valid, jnp.asarray(False), cfg.flow, 10.0, 0.1,
    (cfg.camera.height, cfg.camera.width))
dump["flow_u"] = np.asarray(u)
dump["flow_v"] = np.asarray(v)

np.savez_compressed(out_path, **dump)
print(f"backend={jax.default_backend()} mean IoU={np.mean(ious):.3f} "
      f"per-frame={[round(x, 3) for x in ious]}")
print(f"dumped -> {out_path}")
