"""Host map-bookkeeping scaling regression (VERDICT r1 #3 done-criterion):
a map with tens of keyframes must not slow down over time.

Pure host-side test: synthetic keyframes with overlapping point sets are
inserted directly into LocalMap; the per-keyframe cost of the bookkeeping
pipeline (covisibility, duplicate fusion, point/keyframe culling, BA-window
assembly) is compared between the first and last third of insertions.
Catches O(n^2)-per-keyframe regressions (python loops over all keyframes /
observations) without needing the front-end.
"""

import time

import numpy as np
import pytest

import jax.numpy as jnp

from sindslam_tpu.config import CameraConfig, TrackingConfig
from sindslam_tpu.slam.frame import FrameData, HostFrame
from sindslam_tpu.slam.local_map import LocalMap

CAM = CameraConfig()
CFG = TrackingConfig()


def _make_frame(rng, n=400):
    xy = rng.uniform([20, 20], [620, 460], (n, 2)).astype(np.float32)
    depth = rng.uniform(0.8, 5.0, n).astype(np.float32)
    host = HostFrame(xy=xy, level=np.zeros(n, np.int32),
                     angle=np.zeros(n, np.float32),
                     desc=rng.integers(0, 2 ** 32, (n, 8),
                                       dtype=np.uint32).astype(np.uint32),
                     valid=np.ones(n, bool), depth=depth,
                     ur=xy[:, 0] - CAM.bf / depth)
    frame = FrameData(xy=jnp.asarray(xy),
                      level=jnp.zeros(n, jnp.int32),
                      angle=jnp.zeros(n, jnp.float32),
                      desc=jnp.asarray(host.desc),
                      valid=jnp.ones(n, bool),
                      depth=jnp.asarray(depth),
                      ur=jnp.asarray(host.ur), timestamp=0.0)
    return frame, host


def test_bookkeeping_does_not_slow_down_with_keyframes():
    rng = np.random.default_rng(0)
    m = LocalMap(CAM, CFG)
    n_kf = 48
    n_pts = 400
    per_kf = []
    prev_ids = None
    for k in range(n_kf):
        frame, host = _make_frame(rng, n_pts)
        t0 = time.perf_counter()
        # half the observations re-use the previous keyframe's points
        # (covisibility), half are new allocations — like real tracking
        pts_w = np.stack([ (host.xy[:, 0] - CAM.cx) / CAM.fx * host.depth,
                           (host.xy[:, 1] - CAM.cy) / CAM.fy * host.depth,
                           host.depth], -1) + [0.02 * k, 0, 0]
        point_ids = np.full(n_pts, -1, np.int64)
        if prev_ids is not None:
            reuse = n_pts // 2
            point_ids[:reuse] = prev_ids[rng.permutation(n_pts)[:reuse]]
        new_sel = point_ids < 0
        ids = m.allocate_points(pts_w[new_sel],
                                host.desc[new_sel], k)
        point_ids[new_sel] = ids
        Tcw = np.eye(4, dtype=np.float32)
        Tcw[0, 3] = 0.02 * k
        kf = m.insert_keyframe(frame, Tcw, point_ids, float(k), host=host)
        # the host bookkeeping pipeline a keyframe pays (minus the device BA)
        m.covisible_keyframes(kf)
        m.fuse_duplicates(kf)
        m.cull_points(k)
        m.cull_keyframes()
        m.build_ba_window()
        per_kf.append(time.perf_counter() - t0)
        prev_ids = point_ids

    third = n_kf // 3
    early = float(np.median(per_kf[2:third]))
    late = float(np.median(per_kf[-third:]))
    # allow growth (bigger covisibility graph) but not runaway scaling
    assert late < max(6.0 * early, early + 0.25), \
        f"bookkeeping slowed down: early {early*1000:.1f} ms -> " \
        f"late {late*1000:.1f} ms over {n_kf} keyframes"
    # absolute budget: stays well under the device keyframe step
    assert late < 0.4, f"late keyframe bookkeeping {late*1000:.0f} ms"
