"""Epipolar triangulation of new map points (slam/triangulation.py).

Parity anchor: LocalMapping::CreateNewMapPoints
(/root/reference/ORB_SLAM2/src/LocalMapping.cc:207-452) — structure beyond
the RGB-D depth range must be mapped from motion parallax.
"""

import jax.numpy as jnp
import numpy as np

from sindslam_tpu.config import CameraConfig, TrackingConfig
from sindslam_tpu.slam.frame import FrameData
from sindslam_tpu.slam.triangulation import triangulate_with_neighbors

CAM = CameraConfig(fx=525.0, fy=525.0, cx=319.5, cy=239.5,
                   width=640, height=480)
TCFG = TrackingConfig()


def _project(pts_w, Tcw):
    pc = pts_w @ Tcw[:3, :3].T + Tcw[:3, 3]
    u = pc[:, 0] / pc[:, 2] * CAM.fx + CAM.cx
    v = pc[:, 1] / pc[:, 2] * CAM.fy + CAM.cy
    inb = (pc[:, 2] > 0.1) & (u >= 0) & (u < 640) & (v >= 0) & (v < 480)
    return np.stack([u, v], -1).astype(np.float32), inb


def _frame(xy, desc, valid):
    n = len(xy)
    return FrameData(
        xy=jnp.asarray(xy), level=jnp.zeros(n, jnp.int32),
        angle=jnp.zeros(n, jnp.float32), desc=jnp.asarray(desc),
        valid=jnp.asarray(valid), depth=jnp.zeros(n, jnp.float32),
        ur=jnp.full(n, -1.0, jnp.float32))


def _scene(n=128, seed=0, baseline=0.6):
    rng = np.random.default_rng(seed)
    pts = np.stack([rng.uniform(-2.5, 2.5, n), rng.uniform(-1.8, 1.8, n),
                    rng.uniform(6.0, 18.0, n)], -1).astype(np.float32)
    Tcw1 = np.eye(4, dtype=np.float32)
    Tcw2 = np.eye(4, dtype=np.float32)
    Tcw2[0, 3] = -baseline      # camera 2 shifted +x in world
    xy1, in1 = _project(pts, Tcw1)
    xy2, in2 = _project(pts, Tcw2)
    valid = in1 & in2
    desc = rng.integers(0, 2 ** 32, (n, 8), dtype=np.uint32)
    return pts, Tcw1, Tcw2, xy1, xy2, desc, valid


def test_triangulation_recovers_far_structure():
    """Points at 6-18 m (beyond typical RGB-D range) are recovered to <2 cm
    and reproject to <0.5 px in both views."""
    pts, Tcw1, Tcw2, xy1, xy2, desc, valid = _scene()
    cur = _frame(xy1, desc, valid)
    packed = np.asarray(triangulate_with_neighbors(
        cur, jnp.asarray(valid), jnp.asarray(Tcw1),
        jnp.asarray(xy2)[None], jnp.asarray(desc)[None],
        jnp.zeros((1, len(pts)), jnp.int32), jnp.asarray(valid)[None],
        jnp.asarray(Tcw2)[None], CAM, TCFG))
    ok = packed[:, 3] > 0.5
    assert ok[valid].mean() > 0.9, f"accepted only {ok[valid].mean():.2f}"
    err = np.linalg.norm(packed[ok, :3] - pts[ok], axis=1)
    assert err.max() < 0.02, err.max()
    uv1, _ = _project(packed[ok, :3], Tcw1)
    uv2, _ = _project(packed[ok, :3], Tcw2)
    assert np.abs(uv1 - xy1[ok]).max() < 0.5
    assert np.abs(uv2 - xy2[ok]).max() < 0.5


def test_triangulation_rejects_zero_baseline():
    """Pure-rotation / same-pose pairs have no parallax: nothing accepted."""
    pts, Tcw1, _, xy1, _, desc, valid = _scene()
    cur = _frame(xy1, desc, valid)
    packed = np.asarray(triangulate_with_neighbors(
        cur, jnp.asarray(valid), jnp.asarray(Tcw1),
        jnp.asarray(xy1)[None], jnp.asarray(desc)[None],
        jnp.zeros((1, len(pts)), jnp.int32), jnp.asarray(valid)[None],
        jnp.asarray(Tcw1)[None], CAM, TCFG))
    assert not (packed[:, 3] > 0.5).any()


def test_triangulation_respects_free_mask():
    """Keypoints already bound to map points (free=False) are not touched."""
    pts, Tcw1, Tcw2, xy1, xy2, desc, valid = _scene()
    free = valid.copy()
    free[::2] = False
    cur = _frame(xy1, desc, valid)
    packed = np.asarray(triangulate_with_neighbors(
        cur, jnp.asarray(free), jnp.asarray(Tcw1),
        jnp.asarray(xy2)[None], jnp.asarray(desc)[None],
        jnp.zeros((1, len(pts)), jnp.int32), jnp.asarray(valid)[None],
        jnp.asarray(Tcw2)[None], CAM, TCFG))
    ok = packed[:, 3] > 0.5
    assert not ok[::2].any()
    assert ok[1::2].mean() > 0.8
