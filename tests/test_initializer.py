"""Monocular initializer tests (ref ORB_SLAM2/src/Initializer.cc).

Analytic two-view geometry: project known 3-D structure into two cameras,
add noise + outliers, and require the H/F model selection, recovered
rotation, translation direction, and triangulated structure to match.
"""

import numpy as np
import pytest

from sindslam_tpu.config import CameraConfig
from sindslam_tpu.slam.initializer import initialize_monocular

CAM = CameraConfig()
K = np.array([[CAM.fx, 0, CAM.cx], [0, CAM.fy, CAM.cy], [0, 0, 1]])


def _project(X, R, t):
    Xc = X @ R.T + t
    p = (Xc / Xc[:, 2:]) @ K.T
    return p[:, :2], Xc[:, 2]


def _rot_y(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


def _make_pair(planar: bool, seed=0, n=300, noise=0.3, outlier_frac=0.1):
    rng = np.random.default_rng(seed)
    if planar:
        # points on the z=4 plane
        X = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                      np.full(n, 4.0)], -1)
    else:
        X = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                      rng.uniform(2.5, 7.0, n)], -1)
    R = _rot_y(0.06)
    t = np.array([0.25, 0.02, 0.01])
    p1, z1 = _project(X, np.eye(3), np.zeros(3))
    p2, z2 = _project(X, R, t)
    inb = ((p1 > 10).all(1) & (p1 < [630, 470]).all(1)
           & (p2 > 10).all(1) & (p2 < [630, 470]).all(1) & (z1 > 0) & (z2 > 0))
    p1 = p1 + rng.normal(0, noise, p1.shape)
    p2 = p2 + rng.normal(0, noise, p2.shape)
    n_out = int(outlier_frac * n)
    out_idx = rng.choice(n, n_out, replace=False)
    p2[out_idx] = rng.uniform([0, 0], [640, 480], (n_out, 2))
    return p1.astype(np.float32), p2.astype(np.float32), inb, R, t, out_idx


def _check_pose(res, R_gt, t_gt):
    # rotation error (deg)
    dR = res.R @ R_gt.T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 1.5, f"rotation error {ang} deg"
    # translation direction (scale is unobservable)
    tn = res.t / np.linalg.norm(res.t)
    tg = t_gt / np.linalg.norm(t_gt)
    assert abs(np.dot(tn, tg)) > 0.995, f"t direction {tn} vs {tg}"


def test_general_scene_selects_f_and_recovers_pose():
    p1, p2, inb, R_gt, t_gt, out_idx = _make_pair(planar=False)
    res = initialize_monocular(p1, p2, inb, CAM, seed=1)
    assert res is not None
    assert res.model == "F"
    _check_pose(res, R_gt, t_gt)
    assert res.inliers.sum() > 150
    # injected outliers must be rejected
    assert res.inliers[out_idx].mean() < 0.1
    # triangulated depths are positive and near the true depth range
    assert (res.points3d[:, 2] > 0).all()


def test_planar_scene_selects_h_and_recovers_pose():
    p1, p2, inb, R_gt, t_gt, _ = _make_pair(planar=True)
    res = initialize_monocular(p1, p2, inb, CAM, seed=1)
    assert res is not None
    assert res.model == "H"
    _check_pose(res, R_gt, t_gt)
    assert res.inliers.sum() > 150


def test_degenerate_pure_rotation_rejected():
    """Pure rotation: no parallax, no valid reconstruction — must refuse."""
    rng = np.random.default_rng(2)
    X = np.stack([rng.uniform(-2, 2, 300), rng.uniform(-1.5, 1.5, 300),
                  rng.uniform(2.5, 7.0, 300)], -1)
    R = _rot_y(0.04)
    p1, z1 = _project(X, np.eye(3), np.zeros(3))
    p2, z2 = _project(X, R, np.zeros(3))
    inb = ((p1 > 10).all(1) & (p1 < [630, 470]).all(1)
           & (p2 > 10).all(1) & (p2 < [630, 470]).all(1))
    p1 += rng.normal(0, 0.3, p1.shape)
    p2 += rng.normal(0, 0.3, p2.shape)
    res = initialize_monocular(p1.astype(np.float32), p2.astype(np.float32),
                               inb, CAM, seed=3)
    # either refused outright, or (noise-induced) accepted with a tiny
    # baseline — both are safe; a confident large-baseline answer is the bug
    if res is not None:
        dR = res.R @ R.T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        assert ang < 2.0
