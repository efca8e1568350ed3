"""Tests for config, geometry, association, trajectory IO, and ATE/RPE eval."""

import os

import numpy as np
import pytest

from sindslam_tpu.config import CameraConfig, SystemConfig, system_config_from_yaml
from sindslam_tpu.datasets.associate import associate, associate_window
from sindslam_tpu.datasets.tum import write_tum_trajectory
from sindslam_tpu.evaluation import evaluate_ate, evaluate_ate_files, evaluate_rpe, horn_align
from sindslam_tpu.evaluation.trajectory import (
    quat_to_rotation_np,
    read_trajectory,
    rotation_to_quat_np,
)


# ---------------------------------------------------------------- geometry


def test_se3_exp_log_roundtrip():
    import jax.numpy as jnp

    from sindslam_tpu.geometry import se3

    rng = np.random.default_rng(0)
    xi = jnp.asarray(rng.normal(0, 0.5, (32, 6)).astype(np.float32))
    T = se3.se3_exp(xi)
    xi2 = se3.se3_log(T)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=2e-5)
    # group property: exp(xi) @ exp(-xi) = I
    eye = np.asarray(T @ se3.se3_exp(-xi))
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(4), eye.shape), atol=1e-5)


def test_se3_tiny_angle():
    import jax.numpy as jnp

    from sindslam_tpu.geometry import se3

    xi = jnp.array([[0.1, -0.2, 0.3, 1e-9, -1e-9, 1e-9]], dtype=jnp.float32)
    T = se3.se3_exp(xi)
    np.testing.assert_allclose(np.asarray(T[0, :3, :3]), np.eye(3), atol=1e-6)
    np.testing.assert_allclose(np.asarray(T[0, :3, 3]), [0.1, -0.2, 0.3], atol=1e-6)


def test_quat_rotation_roundtrip():
    import jax.numpy as jnp

    from sindslam_tpu.geometry import se3

    rng = np.random.default_rng(1)
    q = rng.normal(size=(16, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    q = np.where(q[:, 3:4] < 0, -q, q)
    R = se3.quat_to_rotation(jnp.asarray(q))
    q2 = np.asarray(se3.rotation_to_quat(R))
    np.testing.assert_allclose(q2, q, atol=1e-5)


def test_quat_np_matches_jax():
    import jax.numpy as jnp

    from sindslam_tpu.geometry import se3

    rng = np.random.default_rng(2)
    for _ in range(10):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        R_np = quat_to_rotation_np(q)
        R_jx = np.asarray(se3.quat_to_rotation(jnp.asarray(q[None])))[0]
        np.testing.assert_allclose(R_np, R_jx, atol=1e-6)
        q_back = rotation_to_quat_np(R_np)
        if q[3] < 0:
            q = -q
        np.testing.assert_allclose(q_back, q, atol=1e-6)


def test_camera_project_backproject():
    import jax.numpy as jnp

    from sindslam_tpu.geometry import camera

    cam = CameraConfig()
    depth = jnp.full((480, 640), 2.5, dtype=jnp.float32)
    pts = camera.backproject_grid(depth, cam)
    uv, valid = camera.project_points(pts, cam)
    us = np.arange(640)[None, :].repeat(480, 0)
    vs = np.arange(480)[:, None].repeat(640, 1)
    np.testing.assert_allclose(np.asarray(uv[..., 0]), us, atol=1e-3)
    np.testing.assert_allclose(np.asarray(uv[..., 1]), vs, atol=1e-3)
    assert bool(np.asarray(valid).all())


# ---------------------------------------------------------------- associate


def test_associate_basic():
    a = [0.0, 1.0, 2.0, 3.0]
    b = [0.01, 1.015, 2.5, 3.005]
    m = associate(a, b, offset=0.0, max_difference=0.02)
    assert m == [(0.0, 0.01), (1.0, 1.015), (3.0, 3.005)]


def test_associate_offset():
    a = [0.0, 1.0]
    b = [0.033, 1.033]
    assert associate(a, b, offset=-0.033, max_difference=0.001) == [(0.0, 0.033), (1.0, 1.033)]


def test_associate_window_matches_exact():
    rng = np.random.default_rng(3)
    a = np.sort(rng.uniform(0, 100, 200)).tolist()
    b = (np.array(a[:150]) + rng.normal(0, 0.005, 150)).tolist()
    exact = associate(a, b, 0.0, 0.02)
    fast = associate_window(a, b, 0.0, 0.02)
    assert exact == fast


# ---------------------------------------------------------------- config


def test_config_yaml_roundtrip(tmp_path):
    y = tmp_path / "cam.yaml"
    y.write_text(
        "%YAML:1.0\n\nCamera.fx: 520.9\nCamera.fy: 521.0\nCamera.cx: 325.1\n"
        "Camera.cy: 249.7\nCamera.fps: 30.0\nCamera.bf: 40.0\nCamera.RGB: 1\n"
        "ThDepth: 40.0\nDepthMapFactor: 5208.0\nORBextractor.nFeatures: 1000\n"
        "ORBextractor.scaleFactor: 1.2\nORBextractor.nLevels: 8\n"
        "ORBextractor.iniThFAST: 15\nORBextractor.minThFAST: 5\n"
    )
    cfg = system_config_from_yaml(str(y))
    assert cfg.camera.fx == 520.9
    assert cfg.camera.depth_factor == 5208.0
    assert cfg.orb.n_features == 1000
    assert cfg.orb.ini_th_fast == 15


def test_config_defaults():
    cfg = SystemConfig()
    assert cfg.dyna.n_clusters == 12
    assert cfg.dyna.mask_dynamic == 255
    assert cfg.associate_offset == -0.033
    assert cfg.flow.alpha == pytest.approx(0.197)


# ---------------------------------------------------------------- eval


def _synthetic_trajectories(n=100, noise=0.0, seed=0):
    rng = np.random.default_rng(seed)
    ts = np.arange(n) / 30.0
    t = np.stack([np.sin(ts), np.cos(ts), 0.1 * ts], axis=-1)
    # ground truth in a different frame: rotate + translate
    ang = 0.8
    R = np.array([[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
    gt = t @ R.T + np.array([5.0, -2.0, 1.0])
    est = t + rng.normal(0, noise, t.shape)
    return ts, gt, est


def test_horn_align_exact():
    ts, gt, est = _synthetic_trajectories(noise=0.0)
    R, t, s, err = horn_align(est.T, gt.T)
    assert err.max() < 1e-9
    assert s == 1.0


def test_ate_zero_on_perfect():
    ts, gt, est = _synthetic_trajectories(noise=0.0)
    res = evaluate_ate(ts, gt, ts, est)
    assert res.rmse < 1e-9
    assert res.n_pairs == 100


def test_ate_reflects_noise():
    ts, gt, est = _synthetic_trajectories(noise=0.01, seed=1)
    res = evaluate_ate(ts, gt, ts, est)
    # rmse of 3-D gaussian noise with sigma=0.01 per axis ~ 0.017
    assert 0.01 < res.rmse < 0.03


def test_rpe_zero_on_perfect():
    n = 60
    ts = np.arange(n) / 30.0
    rows = np.zeros((n, 7))
    rows[:, 0] = np.linspace(0, 2, n)
    rows[:, 6] = 1.0
    res = evaluate_rpe(ts, rows, ts, rows, delta=1, delta_unit="f")
    assert res.trans_rmse < 1e-12
    assert res.rot_rmse < 1e-9


def test_trajectory_write_read(tmp_path):
    rng = np.random.default_rng(4)
    n = 10
    poses = np.zeros((n, 4, 4))
    for i in range(n):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        poses[i, :3, :3] = quat_to_rotation_np(q)
        poses[i, :3, 3] = rng.normal(size=3)
        poses[i, 3, 3] = 1.0
    ts = np.arange(n) * 0.1
    path = str(tmp_path / "traj.txt")
    write_tum_trajectory(path, ts, poses)
    ts2, rows = read_trajectory(path)
    np.testing.assert_allclose(ts2, ts, atol=1e-6)
    for i in range(n):
        R = quat_to_rotation_np(rows[i, 3:7])
        np.testing.assert_allclose(R, poses[i, :3, :3], atol=1e-5)
        np.testing.assert_allclose(rows[i, :3], poses[i, :3, 3], atol=1e-6)


def test_ate_files_pipeline(tmp_path):
    ts, gt, est = _synthetic_trajectories(noise=0.005, seed=2)
    for name, xyz in [("gt.txt", gt), ("est.txt", est)]:
        with open(tmp_path / name, "w") as f:
            for t, p in zip(ts, xyz):
                f.write(f"{t:.6f} {p[0]:.7f} {p[1]:.7f} {p[2]:.7f} 0 0 0 1\n")
    res = evaluate_ate_files(str(tmp_path / "gt.txt"), str(tmp_path / "est.txt"))
    assert 0.003 < res.rmse < 0.02


# ---------------------------------------------------------------- synthetic


def test_synthetic_scene_renders(synthetic_frames):
    rgb, depth, dyn, pose, t = synthetic_frames[0]
    assert rgb.shape == (480, 640, 3) and rgb.dtype == np.uint8
    assert depth.shape == (480, 640) and depth.dtype == np.float32
    valid = depth > 0
    assert valid.mean() > 0.95          # almost everything hits the room
    assert 0.001 < dyn.mean() < 0.2      # dynamic board is a modest region
    assert depth[valid].max() < 12.0
    assert rgb.std() > 20                # textured enough for features/flow


def test_synthetic_dynamic_moves(synthetic_frames):
    masks = [f[2] for f in synthetic_frames]
    centers = [np.argwhere(m).mean(axis=0) for m in masks if m.any()]
    assert len(centers) >= 2
    disp = np.linalg.norm(centers[-1] - centers[0])
    assert disp > 3.0  # board visibly moves over the clip
