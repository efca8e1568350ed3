#!/usr/bin/env python3
"""Long-horizon odometry drift on the current backend (dev tool).

The r4 known issue: TPU-backend tracking drifted 2-4x faster than CPU on the
rotation-heavy room orbit (suspects: approx_max_k keypoint selection — fixed
in r5 with the exact unrolled top-k — and bf16 MXU passes in the BRIEF
sampling chain — fixed with precision=HIGHEST). This tool quantifies the
residual: runs loop-closing-OFF SLAM over the orbit on THIS process's
default backend and prints ATE + error-vs-frame checkpoints.

Run once under TPU, once under CPU (JAX_PLATFORMS="" JAX_PLATFORM_NAME=cpu),
compare:  python tools/profile_tpu_drift.py [n_frames]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from sindslam_tpu.utils import setup_compilation_cache
setup_compilation_cache()

import jax

from sindslam_tpu.datasets.synthetic import make_orbit_sequence
from sindslam_tpu.evaluation.benchmark import (ate_rmse, run_sequence_slam,
                                               scaled_system_config)


def main() -> None:
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    scale = float(os.environ.get("DRIFT_SCALE", "0.5"))
    frames, _scene = make_orbit_sequence(n_frames=n_frames, scale=scale,
                                         orbits=1.3 * n_frames / 330.0,
                                         seed=0)
    cfg = scaled_system_config(scale, n_features=800)
    ts, est, info = run_sequence_slam(frames, cfg, use_dyna=False,
                                      loop_closing=False)
    gt = {f[4]: f[3] for f in frames}
    # first-frame-relative translation error (drift from start): compare
    # T_gt0^-1 T_gt,t vs T_est0^-1 T_est,t — frame-convention independent
    g0inv = np.linalg.inv(gt[ts[0]])
    e0inv = np.linalg.inv(est[0])
    errs = []
    for t, p in zip(ts, est):
        rel_g = g0inv @ gt[t]
        rel_e = e0inv @ p
        errs.append(float(np.linalg.norm(rel_e[:3, 3] - rel_g[:3, 3])))
    ck = {str(k): round(errs[k] * 1000, 1) for k in
          (10, 20, 40, len(errs) - 1) if k < len(errs)}
    print(json.dumps({
        "backend": jax.default_backend(),
        "n_frames": n_frames,
        "ate_m": round(ate_rmse(frames, ts, est), 4),
        "err_mm_at_frame": ck,
        "max_err_mm": round(max(errs) * 1000, 1),
        "n_keyframes": info["n_keyframes"],
    }))


if __name__ == "__main__":
    main()
