#!/usr/bin/env python3
"""Benchmark: end-to-end front-end FPS (flow + recluster + ORB) at 640x480.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline: the reference's CUDA front-end runs at ~9 Hz (BroxOpticalFlow path,
``README.md:31``); vs_baseline = our FPS / 9.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from sindslam_tpu.config import SystemConfig
    from sindslam_tpu.datasets.synthetic import generate_sequence
    from sindslam_tpu.frontend.pipeline import frontend_step, init_state
    from sindslam_tpu.ops import image as im

    cfg = SystemConfig()
    n_warm = 2
    n_meas = int(os.environ.get("BENCH_FRAMES", "30"))

    # A real moving sequence (fast-walking-rate camera + mover), NOT
    # near-identical frames: flow magnitudes are representative and the
    # in-graph large-motion fallback can fire (its rate is reported).
    frames = list(generate_sequence(n_frames=8, seed=0, amplitude=0.2))
    rgbs = [jnp.asarray(f[0]) for f in frames]
    depths = [jnp.asarray(f[1]) for f in frames]

    state = init_state(cfg, im.rgb_to_gray(rgbs[0]))

    # warmup / compile. NOTE: on the axon tunnel platform block_until_ready
    # returns immediately — a host readback is the only true sync point.
    for i in range(n_warm):
        out, state = frontend_step(rgbs[i % len(rgbs)], depths[i % len(depths)],
                                   state, cfg)
    _ = int(np.asarray(out.dyna_mask[0, 0]))

    lm_flags = []
    t0 = time.perf_counter()
    for i in range(n_meas):
        out, state = frontend_step(rgbs[i % len(rgbs)], depths[i % len(depths)],
                                   state, cfg)
        lm_flags.append(out.large_motion)
    _ = int(np.asarray(out.dyna_mask[0, 0]))   # force execution of the chain
    dt = time.perf_counter() - t0
    lm_rate = float(np.mean([bool(np.asarray(f)) for f in lm_flags]))

    fps = n_meas / dt

    # Accuracy companion line (VERDICT r1 #6): masked-vs-unmasked ATE on the
    # dyn_walk benchmark sequence, full SLAM, so rounds track accuracy too.
    # Printed BEFORE the fps line — the driver parses the LAST JSON line.
    if os.environ.get("BENCH_SKIP_ACCURACY") != "1":
        try:
            from sindslam_tpu.evaluation.benchmark import accuracy_pair

            acc = accuracy_pair("dyn_walk", n_frames=10, scale=1.0)
            print(json.dumps({
                "metric": "ATE rmse, dynamic masking ON (dyn_walk synthetic)",
                "value": round(acc["ate_masked_m"], 5),
                "unit": "m",
                "ate_unmasked_m": round(acc["ate_unmasked_m"], 5),
                "mask_iou": round(acc["mask_iou"], 3),
            }), flush=True)
        except Exception as e:  # accuracy must never break the fps metric
            print(f"accuracy pair failed: {e!r}", file=sys.stderr)

    print(json.dumps({
        "metric": "front-end FPS at 640x480 (flow+recluster+ORB)",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 9.0, 2),
        "large_motion_fallback_rate": round(lm_rate, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
