"""Map save/load (checkpoint/resume) tests — a capability the reference left
as a TODO stub (``include/System.h:117-119``)."""

import numpy as np
import pytest

import jax.numpy as jnp

from sindslam_tpu.config import CameraConfig, ORBConfig, SystemConfig, TrackingConfig
from sindslam_tpu.datasets.synthetic import generate_sequence
from sindslam_tpu.slam.system import SlamSystem

CAM = CameraConfig(cx=319.5, cy=239.5)
CFG = SystemConfig(camera=CAM, orb=ORBConfig(n_features=600, n_levels=4),
                   tracking=TrackingConfig(ba_max_keyframes=6,
                                           ba_max_points=2048,
                                           max_frames_between_kf=3))


@pytest.mark.slow
def test_map_save_load_resume(tmp_path):
    frames = list(generate_sequence(n_frames=8, seed=3, with_dynamic=False,
                                    amplitude=0.05))
    sys1 = SlamSystem(CFG)
    for rgb, depth, _, _, t in frames[:5]:
        sys1.track_rgbd(jnp.asarray(rgb), jnp.asarray(depth), timestamp=t)
    path = str(tmp_path / "map.npz")
    sys1.save_map(path)
    n_pts = int(sys1.map.valid.sum())
    n_kfs = len(sys1.map.keyframes)
    assert n_pts > 200 and n_kfs >= 2

    # fresh system resumes from the saved map and keeps tracking
    sys2 = SlamSystem(CFG)
    sys2.load_map(path)
    assert int(sys2.map.valid.sum()) == n_pts
    assert len(sys2.map.keyframes) == n_kfs
    np.testing.assert_allclose(sys2.map.keyframes[-1].Tcw,
                               sys1.map.keyframes[-1].Tcw, atol=1e-6)

    for rgb, depth, _, _, t in frames[5:]:
        Tcw, _ = sys2.track_rgbd(jnp.asarray(rgb), jnp.asarray(depth),
                                 timestamp=t)
        assert not sys2.lost
    # resumed trajectory stays consistent with the original world frame
    gt_rel = np.linalg.inv(frames[-1][3]) @ frames[0][3]
    est_rel = Tcw  # world = first camera frame
    err = np.linalg.norm(est_rel[:3, 3] - gt_rel[:3, 3])
    assert err < 0.05
