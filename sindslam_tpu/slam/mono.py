"""Monocular tracking pipeline (``System::TrackMonocular`` parity).

The reference exposes monocular tracking through the stock ROS node
(``Examples/ROS/ORB_SLAM2/src/ros_mono.cc``) on top of
``Tracking::MonocularInitialization`` / ``CreateInitialMapMonocular``
(``src/Tracking.cc:510-608``): hold a reference frame, match against each
new frame, solve the two-view H/F initialization, scale the initial map to
unit median depth, then track normally with mono-only observations.

Here the same flow composes the existing TPU-native machinery: ORB
extraction, mutual-NN matching, the batched H/F RANSAC initializer
(``slam/initializer.py``), and the full ``SlamSystem`` tracker — whose
pose optimizer, triangulation, BA, and loop closing all already handle
``ur = -1`` mono observations. New map points after initialization come
exclusively from epipolar triangulation against covisible keyframes (no
depth channel exists), exactly like the reference's monocular LocalMapping
path. Scale is fixed by the initialization convention (median scene depth
= 1); accumulated Sim(3) scale drift IS modeled at loop closures — the
map's ``mono`` flag routes ``Relocalizer._close_with`` to the
scale-estimating Horn RANSAC (``ransac_sim3``) and the 7-DoF essential
graph (``pose_graph.optimize_pose_graph_sim3``), matching the reference's
``bFixScale=false`` monocular configuration (``Sim3Solver.cc``,
``Optimizer.cc:781``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax.numpy as jnp

from sindslam_tpu.config import SystemConfig
from sindslam_tpu.frontend import orb
from sindslam_tpu.slam import matching
from sindslam_tpu.slam.frame import FrameData, to_host
from sindslam_tpu.slam.initializer import initialize_monocular
from sindslam_tpu.slam.system import SlamSystem


class MonocularSystem:
    """Monocular SLAM facade: ``track(gray, t) -> (Tcw, is_keyframe)``."""

    def __init__(self, cfg: SystemConfig, min_init_matches: int = 100):
        import dataclasses

        # monocular thresholds: cnThObs = mbMonocular ? 2 : 3
        # (LocalMapping.cc), keyframe policy thRefRatio = 0.9 and the
        # 15-inlier c2 floor (Tracking.cc:1062-1072) — mono maps are
        # sparse (points only from keyframe triangulation), so the RGB-D
        # floor of 30 deadlocks keyframe insertion (see
        # TrackingConfig.kf_min_inliers)
        cfg = dataclasses.replace(
            cfg, tracking=dataclasses.replace(
                cfg.tracking, cull_th_obs=2, kf_ref_ratio=0.9,
                kf_min_inliers=15))
        self.cfg = cfg
        self.cam = cfg.camera
        self.slam = SlamSystem(cfg)
        self.slam.mono_depth_from_map = True
        self.slam.map.mono = True
        self.min_init_matches = min_init_matches
        self.initialized = False
        self._ref: Optional[Tuple[FrameData, float]] = None
        self._init_attempts = 0

    # ------------------------------------------------------------- track

    def track(self, image: jnp.ndarray, timestamp: float = 0.0
              ) -> Tuple[np.ndarray, bool]:
        """image: (H, W) grayscale or (H, W, 3) RGB."""
        from sindslam_tpu.ops import image as im

        g = im.rgb_to_gray(image) if image.ndim == 3 else image
        mask = jnp.zeros((self.cam.height, self.cam.width), jnp.int32)
        feats = orb.extract_orb(g, mask, self.cfg.orb,
                                height=self.cam.height, width=self.cam.width)
        n = feats.xy.shape[0]
        frame = FrameData(
            xy=feats.xy, level=feats.level, angle=feats.angle,
            desc=feats.desc, valid=feats.valid,
            depth=jnp.zeros(n, jnp.float32),          # no depth channel
            ur=jnp.full(n, -1.0, jnp.float32),        # mono observations
            timestamp=timestamp)
        if not self.initialized:
            return self._try_initialize(frame, timestamp)
        return self.slam.track_frame(frame, timestamp)

    # ---------------------------------------------------- initialization

    def _try_initialize(self, frame: FrameData, timestamp: float
                        ) -> Tuple[np.ndarray, bool]:
        eye = np.eye(4, dtype=np.float32)
        if self._ref is None:
            if int(np.asarray(frame.valid).sum()) >= self.min_init_matches:
                self._ref = (frame, timestamp)
            return eye, False

        ref, ref_ts = self._ref
        m = matching.match_mutual_nn(
            ref.desc, ref.valid, frame.desc, frame.valid,
            max_dist=self.cfg.tracking.hamming_th_low)
        mv = np.asarray(m.valid)
        tgt = np.asarray(m.idx)
        src = np.where(mv)[0]
        if len(src) < self.min_init_matches:
            # too little overlap left: re-anchor, like the reference's
            # reference-frame reset (Tracking.cc:529-535)
            self._ref = (frame, timestamp)
            return eye, False

        ref_h = to_host(ref)
        cur_h = to_host(frame)
        p1 = ref_h.xy[src].astype(np.float32)
        p2 = cur_h.xy[tgt[src]].astype(np.float32)
        self._init_attempts += 1
        res = initialize_monocular(
            p1, p2, np.ones(len(p1), bool), self.cam,
            seed=self._init_attempts,
            min_inliers=max(50, self.min_init_matches // 2))
        if res is None or not res.ok:
            return eye, False

        # scale the initial reconstruction to unit median depth
        # (CreateInitialMapMonocular, Tracking.cc:660-668)
        X = np.asarray(res.points3d, np.float32)
        med = float(np.median(X[:, 2]))
        if med <= 1e-6:
            return eye, False
        X = X / med
        t = np.asarray(res.t, np.float32) / med
        Tcw1 = np.eye(4, dtype=np.float32)
        Tcw1[:3, :3] = res.R
        Tcw1[:3, 3] = t

        inl = np.asarray(res.inliers)           # over the p1/p2 pairing
        kp_ref = src[inl]
        kp_cur = tgt[src[inl]]

        slam = self.slam
        ids = slam.map.allocate_points(X, cur_h.desc[kp_cur], 0)
        ok = ids >= 0
        pid_ref = np.full(ref.xy.shape[0], -1, np.int64)
        pid_cur = np.full(frame.xy.shape[0], -1, np.int64)
        pid_ref[kp_ref[ok]] = ids[ok]
        pid_cur[kp_cur[ok]] = ids[ok]

        slam.Tcw = np.eye(4, dtype=np.float32)
        slam.map.insert_keyframe(ref, np.eye(4, dtype=np.float32), pid_ref,
                                 ref_ts, host=ref_h)
        slam._record(ref_ts)
        slam.map.insert_keyframe(frame, Tcw1, pid_cur, timestamp, host=cur_h)
        slam.Tcw = Tcw1
        slam._record(timestamp)
        # prev_frame carries virtual depths of its map points (cam-1 frame z)
        # so the next frame's motion-model stage can unproject it
        depth = np.zeros(frame.xy.shape[0], np.float32)
        Xc1 = X[ok] @ Tcw1[:3, :3].T + Tcw1[:3, 3]
        depth[kp_cur[ok]] = np.maximum(Xc1[:, 2], 0.0)
        slam.prev_frame = frame._replace(depth=jnp.asarray(depth))
        slam.ref_tracked = int(ok.sum())
        slam.frames_since_kf = 0
        # refine the two-view reconstruction with one local BA pass
        slam.map.run_local_ba()
        slam.Tcw = slam.map.keyframes[-1].Tcw.astype(np.float32)
        self.initialized = True
        return slam.Tcw.copy(), True

    # ----------------------------------------------------------- passthru

    def trajectory(self):
        return self.slam.trajectory()

    def save_trajectory_tum(self, path: str) -> None:
        self.slam.save_trajectory_tum(path)

    def shutdown(self) -> None:
        self.slam.shutdown()

    @property
    def lost(self) -> bool:
        return self.slam.lost
