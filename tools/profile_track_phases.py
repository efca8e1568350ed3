#!/usr/bin/env python3
"""Fine-grained phase timing of the steady-state tracked frame (dev tool).

Splits one tracked frame into: front-end dispatch (host tracing), readback
of the packed track result (the tunnel round trip + any un-overlapped device
compute), and host bookkeeping. Run on TPU.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from sindslam_tpu.utils import setup_compilation_cache
setup_compilation_cache()

import jax.numpy as jnp

from sindslam_tpu.config import SystemConfig
from sindslam_tpu.datasets.synthetic import generate_sequence
from sindslam_tpu.frontend.pipeline import frontend_step, init_state
from sindslam_tpu.ops import image as im
from sindslam_tpu.slam.frame import frame_from_frontend
from sindslam_tpu.slam.system import SlamSystem
from sindslam_tpu.slam.tracking import full_track_step, unpack_track_out

N_FRAMES = int(os.environ.get("PROF_FRAMES", "20"))
cfg = SystemConfig()
frames = list(generate_sequence(n_frames=N_FRAMES, seed=0, amplitude=0.06))
UPLOADS = [(jnp.asarray(f[0]), jnp.asarray(f[1])) for f in frames]


def run(label):
    slam = SlamSystem(cfg)
    state = init_state(cfg, im.rgb_to_gray(UPLOADS[0][0]))
    t_fed, t_track_dispatch, t_readback, t_book, t_kf = [], [], [], [], []
    for (rgb_j, d), (_r, _dd, _gd, _p, ts) in zip(UPLOADS, frames):
        t0 = time.perf_counter()
        out, state = frontend_step(rgb_j, d, state, cfg)
        frame = frame_from_frontend(out, ts)
        t1 = time.perf_counter()
        if not slam.map.keyframes:
            slam._initialize(frame, ts)
            slam.prev_frame = frame
            continue
        # replicate track_frame's hot path with timers
        Tcw_pred = (slam.velocity @ slam.Tcw).astype(np.float32)
        prev_Twc = np.linalg.inv(slam.Tcw).astype(np.float32)
        pos, desc, ok, ids = slam.map.local_point_tensors()
        P = pos.shape[0]
        outt = full_track_step(slam.prev_frame, jnp.asarray(prev_Twc),
                               frame, jnp.asarray(Tcw_pred),
                               pos, desc, ok, slam.cam, slam.tcfg,
                               slam.tcfg.search_radius_fine)
        t2 = time.perf_counter()
        packed = np.asarray(outt.packed)
        t3 = time.perf_counter()
        poses, counts, out_idx, flags = unpack_track_out(packed, P)
        # full host bookkeeping via the real track_frame (re-dispatch is
        # cached on-device? no — it re-runs; accept for the phase split)
        slam.track_frame(frame, ts)
        t4 = time.perf_counter()
        t_fed.append(t1 - t0)
        t_track_dispatch.append(t2 - t1)
        t_readback.append(t3 - t2)
        t_book.append(t4 - t3)
    print(f"[{label}] fe-dispatch {1000*np.mean(t_fed):7.1f} | "
          f"track-dispatch {1000*np.mean(t_track_dispatch):7.1f} | "
          f"readback {1000*np.mean(t_readback):7.1f} "
          f"(p95 {1000*np.percentile(t_readback, 95):.1f}) | "
          f"track_frame-redo {1000*np.mean(t_book):7.1f}", flush=True)


run("warmup")
run("steady")
run("steady2")
