"""Debug the stereo slow-test GBA divergence: per-frame pose error,
keyframe centers before/after shutdown, point depth stats."""
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax.numpy as jnp

from sindslam_tpu.config import CameraConfig, ORBConfig, SystemConfig, TrackingConfig
from sindslam_tpu.datasets.synthetic import make_default_scene, make_trajectory
from sindslam_tpu.slam.stereo import StereoSystem

CAM = CameraConfig(cx=319.5, cy=239.5)
CFG = SystemConfig(
    camera=CAM,
    orb=ORBConfig(n_features=800, n_levels=4),
    tracking=TrackingConfig(ba_max_keyframes=8, ba_max_points=2048,
                            max_frames_between_kf=3),
)


def _stereo_pair(scene, T_wc):
    b = CAM.baseline
    T_right = T_wc.copy()
    T_right[:3, 3] = T_wc[:3, 3] + T_wc[:3, :3] @ np.array([b, 0.0, 0.0])
    rgbL, depthL, _ = scene.render(T_wc)
    rgbR, _dR, _ = scene.render(T_right)
    return rgbL, rgbR, depthL


def centers(slam):
    out = []
    for kf in slam.map.keyframes:
        T = np.asarray(kf.Tcw)
        c = -T[:3, :3].T @ T[:3, 3]
        out.append(c)
    return np.array(out)


def main():
    scene = make_default_scene(seed=7, with_dynamic=False)
    n = 10
    poses = make_trajectory(n, amplitude=0.2, seed=7)
    sys_ = StereoSystem(CFG)
    for i in range(n):
        rgbL, rgbR, _d = _stereo_pair(scene, poses[i])
        t = i / 30.0
        Tcw, kf = sys_.track(jnp.asarray(rgbL), jnp.asarray(rgbR), timestamp=t)
        Twc_gt = poses[i]
        c_est = -np.asarray(Tcw)[:3, :3].T @ np.asarray(Tcw)[:3, 3]
        err = np.linalg.norm(c_est - Twc_gt[:3, 3])
        m = sys_.slam.map
        pts = m.pos[m.valid]
        rmax = np.linalg.norm(pts, axis=1).max() if len(pts) else 0.0
        nfar = (np.linalg.norm(pts, axis=1) > 20).sum() if len(pts) else 0
        kcs = [np.linalg.norm(-k.Tcw[:3, :3].T @ k.Tcw[:3, 3]) for k in m.keyframes]
        print(f"frame {i}: track err {err*1000:.1f} mm kf={kf} "
              f"rmax={rmax:.1f} nfar={nfar} |kf centers|="
              + ",".join(f"{c:.2f}" for c in kcs))

    slam = sys_.slam
    print("\nkeyframe centers BEFORE shutdown:")
    c0 = centers(slam)
    for i, c in enumerate(c0):
        print(f"  kf{i}: {c}")
    # point stats
    m = slam.map
    pts = m.pos[m.valid]
    if len(pts):
        r = np.linalg.norm(pts, axis=1)
        print(f"points: n={len(pts)} |p| p50={np.median(r):.2f} p95={np.percentile(r,95):.2f} max={r.max():.2f}")

    sys_.shutdown()
    print("\nkeyframe centers AFTER shutdown:")
    c1 = centers(slam)
    for i, c in enumerate(c1):
        print(f"  kf{i}: {c}")

    ts_arr, est = sys_.trajectory()
    gt = poses[:, :3, 3]
    est_c = est[:, :3, 3]
    print("\ntrajectory vs gt:")
    for i in range(len(est_c)):
        print(f"  {i}: est {est_c[i]} gt {gt[i] if i < len(gt) else '?'}")


if __name__ == "__main__":
    main()
