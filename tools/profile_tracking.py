#!/usr/bin/env python3
"""Steady-state SLAM tracking/keyframe timing on TPU (dev tool).

Separates compile/first-use cost from steady state: runs a warmup sequence,
then re-tracks a fresh SlamSystem over the same frames and reports per-phase
means (frontend dispatch, track step, keyframe insertion incl. local BA).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from sindslam_tpu.utils import setup_compilation_cache
setup_compilation_cache()

import jax.numpy as jnp

from sindslam_tpu.config import SystemConfig
from sindslam_tpu.datasets.synthetic import generate_sequence
from sindslam_tpu.frontend.pipeline import frontend_step, init_state
from sindslam_tpu.ops import image as im
from sindslam_tpu.slam.frame import frame_from_frontend
from sindslam_tpu.slam.system import SlamSystem

N_FRAMES = int(os.environ.get("PROF_FRAMES", "12"))
cfg = SystemConfig()
frames = list(generate_sequence(n_frames=N_FRAMES, seed=0, amplitude=0.06))
# frames are PRE-STAGED on device: a host->device upload through the axon
# tunnel costs ~110 ms/frame (measured, ~8 MB/s effective) and would mask
# every on-chip number below. On a real TPU host the same upload is ~0.2 ms
# of PCIe. bench.py stages identically.
UPLOADS = [(jnp.asarray(f[0]), jnp.asarray(f[1])) for f in frames]


def run(label):
    slam = SlamSystem(cfg)
    state = None
    t_fe, t_tr, t_kf = [], [], []
    for (rgb_j, d), (_r, _dd, _gd, _p, ts) in zip(UPLOADS, frames):
        t0 = time.perf_counter()
        if state is None:
            state = init_state(cfg, im.rgb_to_gray(rgb_j))
        out, state = frontend_step(rgb_j, d, state, cfg)
        frame = frame_from_frontend(out, ts)
        _ = np.asarray(frame.depth[0])      # sync the front-end chain
        t1 = time.perf_counter()
        Tcw, is_kf = slam.track_frame(frame, ts)
        t2 = time.perf_counter()
        t_fe.append(t1 - t0)
        (t_kf if is_kf else t_tr).append(t2 - t1)
    print(f"[{label}] frontend {1000*np.mean(t_fe):8.1f} ms/frame | "
          f"track {1000*np.mean(t_tr) if t_tr else 0:8.1f} ms "
          f"(x{len(t_tr)}) | keyframe {1000*np.mean(t_kf) if t_kf else 0:8.1f} ms "
          f"(x{len(t_kf)})", flush=True)


def run_pipelined(label):
    """Driver-style loop: next frontend dispatched between the tracking
    dispatch and its readback (prefetch overlap), and the track readback
    deferred one frame (as the --fused driver runs)."""
    slam = SlamSystem(cfg)
    slam.deferred_track = True
    state = init_state(cfg, im.rgb_to_gray(jnp.asarray(frames[0][0])))
    outs = []
    t0 = time.perf_counter()
    pending = None
    i = 0
    times = []
    while pending is not None or i < len(frames):
        tf = time.perf_counter()
        if pending is None:
            (rgb_j, d_j), ts = UPLOADS[i], frames[i][4]
            i += 1
            out, state = frontend_step(rgb_j, d_j, state, cfg)
            pending = (out, ts)
        out, ts = pending
        pending = None
        nxt = frames[i] if i < len(frames) else None
        if nxt is not None:
            i += 1

        def prefetch():
            nonlocal pending, state
            if nxt is None:
                return
            (rgb2_j, d2_j), ts2 = UPLOADS[i - 1], nxt[4]
            out2, state2 = frontend_step(rgb2_j, d2_j, state, cfg)
            pending = (out2, ts2)
            state = state2

        frame = frame_from_frontend(out, ts)
        slam.track_frame(frame, ts, prefetch=prefetch)
        if pending is None:
            prefetch()
        times.append(time.perf_counter() - tf)
    print(f"[{label}] pipelined {1000*np.mean(times):8.1f} ms/frame "
          f"(worst {1000*np.max(times):.1f})", flush=True)


def run_fused(label):
    """r4 single-dispatch path: frontend + tracking in one jitted graph per
    frame (SlamSystem.track_fused), track readback deferred one frame."""
    slam = SlamSystem(cfg)
    slam.deferred_track = True
    times = []
    for (rgb_j, d), (_r, _dd, _gd, _p, ts) in zip(UPLOADS, frames):
        t0 = time.perf_counter()
        slam.track_fused(rgb_j, d, ts)
        times.append(time.perf_counter() - t0)
    slam.flush_tracking()
    print(f"[{label}] fused 1-dispatch {1000*np.mean(times[1:]):8.1f} ms/frame "
          f"(worst {1000*np.max(times[1:]):.1f})", flush=True)


run("warmup")
run("steady")
run_pipelined("pipelined")
run_pipelined("pipelined2")
run_fused("fused-warm")
run_fused("fused")
run_fused("fused2")
