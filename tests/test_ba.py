"""Tests for the batched dense-Schur local bundle adjustment."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sindslam_tpu.config import CameraConfig, TrackingConfig
from sindslam_tpu.geometry import se3
from sindslam_tpu.slam.ba import BAProblem, local_bundle_adjustment

CAM = CameraConfig()
CFG = TrackingConfig(ba_iterations=10)


def _make_problem(rng, n_kf=5, n_pts=200, obs_noise=0.3,
                  pose_noise=0.02, point_noise=0.05, pad_pts=256, pad_obs=2048):
    # ground truth: poses along x, points in front
    gt_poses = np.stack([np.eye(4) for _ in range(n_kf)])
    for k in range(n_kf):
        gt_poses[k][:3, 3] = [-0.1 * k, 0.01 * k, 0.0]   # Tcw translation
    gt_pts = rng.uniform([-2.5, -2, 2.5], [2.5, 2, 7.0], (n_pts, 3))

    obs_kf, obs_pt, obs_uv, obs_ur, obs_lvl = [], [], [], [], []
    for k in range(n_kf):
        R, t = gt_poses[k][:3, :3], gt_poses[k][:3, 3]
        pc = gt_pts @ R.T + t
        u = CAM.fx * pc[:, 0] / pc[:, 2] + CAM.cx
        v = CAM.fy * pc[:, 1] / pc[:, 2] + CAM.cy
        ur = u - CAM.bf / pc[:, 2]
        ok = (u > 10) & (u < 630) & (v > 10) & (v < 470)
        for p in np.where(ok)[0]:
            obs_kf.append(k)
            obs_pt.append(p)
            obs_uv.append([u[p] + rng.normal(0, obs_noise),
                           v[p] + rng.normal(0, obs_noise)])
            obs_ur.append(ur[p] + rng.normal(0, obs_noise))
            obs_lvl.append(0)
    m = len(obs_kf)
    assert m <= pad_obs

    # perturb initial estimate (keep pose 0 exact: it is the gauge anchor)
    init_poses = gt_poses.copy()
    for k in range(1, n_kf):
        xi = rng.normal(0, pose_noise, 6).astype(np.float32)
        init_poses[k] = np.asarray(se3.se3_exp(jnp.asarray(xi)[None]))[0] @ gt_poses[k]
    init_pts = gt_pts + rng.normal(0, point_noise, gt_pts.shape)

    def pad(arr, n, fill=0):
        arr = np.asarray(arr)
        out = np.full((n,) + arr.shape[1:], fill, arr.dtype)
        out[:len(arr)] = arr
        return out

    pts_padded = np.zeros((pad_pts, 3), np.float32)
    pts_padded[:n_pts] = init_pts

    problem = BAProblem(
        poses=jnp.asarray(init_poses.astype(np.float32)),
        points=jnp.asarray(pts_padded),
        obs_kf=jnp.asarray(pad(obs_kf, pad_obs)),
        obs_pt=jnp.asarray(pad(obs_pt, pad_obs)),
        obs_uv=jnp.asarray(pad(np.array(obs_uv, np.float32), pad_obs)),
        obs_ur=jnp.asarray(pad(np.array(obs_ur, np.float32), pad_obs, fill=-1)),
        obs_level=jnp.asarray(pad(obs_lvl, pad_obs)),
        obs_valid=jnp.asarray(pad(np.ones(m, bool), pad_obs, fill=False)),
        fixed_mask=jnp.asarray(np.arange(n_kf) == 0),
    )
    return problem, gt_poses, gt_pts, n_pts


def test_ba_reduces_error():
    rng = np.random.default_rng(0)
    problem, gt_poses, gt_pts, n_pts = _make_problem(rng)
    res = local_bundle_adjustment(problem, CAM, CFG)
    out_poses = np.asarray(res.poses)

    err_before = err_after = 0.0
    for k in range(1, len(gt_poses)):
        e0 = np.asarray(se3.se3_log(jnp.asarray(
            (np.asarray(problem.poses)[k] @ np.linalg.inv(gt_poses[k]))[None]
            .astype(np.float32))))[0]
        e1 = np.asarray(se3.se3_log(jnp.asarray(
            (out_poses[k] @ np.linalg.inv(gt_poses[k]))[None].astype(np.float32))))[0]
        err_before += np.linalg.norm(e0)
        err_after += np.linalg.norm(e1)
    assert err_after < 0.25 * err_before, (err_before, err_after)
    # points improved too
    p0 = np.asarray(problem.points)[:n_pts]
    p1 = np.asarray(res.points)[:n_pts]
    # depth components are weakly constrained by 0.3 px observation noise;
    # ~45-55% reduction is the expected regime here
    assert np.linalg.norm(p1 - gt_pts, axis=1).mean() < \
        0.62 * np.linalg.norm(p0 - gt_pts, axis=1).mean()
    assert float(res.mean_chi2) < 3.0


def test_ba_low_parallax_far_point_does_not_destabilize():
    """Regression (r3 stereo divergence): a far point observed with
    near-zero ray parallax leaves its 3x3 Hessian block near-singular along
    the ray; fixed absolute damping let GN take ~1e4 m point steps whose
    Schur coupling dragged keyframe poses meters per iteration (measured
    1e2..1e8 m keyframe centers on the stereo 10-frame sequence). The LM
    accept/reject loop + Marquardt-scaled damping must keep both the poses
    and the far point bounded."""
    rng = np.random.default_rng(3)
    problem, gt_poses, gt_pts, n_pts = _make_problem(rng)

    # fabricate a 35 m point (fake near-zero-disparity stereo match /
    # low-parallax triangulation) with mildly inconsistent mono
    # observations from every keyframe — residuals small enough to survive
    # the chi2 trim, parallax ~0.16 deg over the 0.4 m window baseline
    far = np.array([0.5, -0.3, 35.0], np.float32)
    pid = n_pts                      # first padded slot
    pts = np.array(problem.points)
    pts[pid] = far
    obs_kf = np.array(problem.obs_kf)
    obs_pt = np.array(problem.obs_pt)
    obs_uv = np.array(problem.obs_uv)
    obs_ur = np.array(problem.obs_ur)
    obs_valid = np.array(problem.obs_valid)
    m = int(obs_valid.sum())
    for k in range(len(gt_poses)):
        R, t = gt_poses[k][:3, :3], gt_poses[k][:3, 3]
        pc = far @ R.T + t
        obs_kf[m + k] = k
        obs_pt[m + k] = pid
        obs_uv[m + k] = [CAM.fx * pc[0] / pc[2] + CAM.cx + rng.normal(0, 2.0),
                         CAM.fy * pc[1] / pc[2] + CAM.cy + rng.normal(0, 2.0)]
        obs_ur[m + k] = -1.0
        obs_valid[m + k] = True
    problem = problem._replace(
        points=jnp.asarray(pts), obs_kf=jnp.asarray(obs_kf),
        obs_pt=jnp.asarray(obs_pt), obs_uv=jnp.asarray(obs_uv),
        obs_ur=jnp.asarray(obs_ur), obs_valid=jnp.asarray(obs_valid))

    res = local_bundle_adjustment(problem, CAM, CFG)
    assert np.isfinite(np.asarray(res.packed)).all()
    # the far point may slide along its (unconstrained) ray but must stay
    # bounded — under the old GN it reached hundreds of meters
    assert np.linalg.norm(np.asarray(res.points)[pid]) < 120.0
    # poses still converge to ground truth despite the bad point
    for k in range(1, len(gt_poses)):
        e = np.asarray(se3.se3_log(jnp.asarray(
            (np.asarray(res.poses)[k] @ np.linalg.inv(gt_poses[k]))[None]
            .astype(np.float32))))[0]
        assert np.linalg.norm(e) < 0.02, (k, np.linalg.norm(e))


def test_joint_gba_matches_dense_schur_on_small_problem():
    """The matrix-free PCG joint solver (gba.py) and the dense-Schur local
    solver optimize the same objective; on a problem small enough for both,
    their solutions must agree (PCG machinery parity check)."""
    from sindslam_tpu.slam.gba import joint_global_ba

    rng = np.random.default_rng(0)
    problem, gt_poses, _gt_pts, _n = _make_problem(rng)
    res_l = local_bundle_adjustment(problem, CAM, CFG)
    res_j = joint_global_ba(problem, CAM, CFG, n_iters=10, n_cg=40)
    assert np.isfinite(np.asarray(res_j.packed)).all()
    for k in range(1, len(gt_poses)):
        d = np.asarray(se3.se3_log(jnp.asarray(
            (np.asarray(res_j.poses)[k]
             @ np.linalg.inv(np.asarray(res_l.poses)[k]))[None]
            .astype(np.float32))))[0]
        assert np.linalg.norm(d) < 1e-4, (k, np.linalg.norm(d))
    assert abs(float(res_j.mean_chi2) - float(res_l.mean_chi2)) < 0.01


def test_global_ba_windowed_sweep_refines_whole_map():
    """run_global_ba (role of Optimizer.cc:41 GlobalBundleAdjustemnt):
    overlapping windows refine a map LONGER than one BA window end-to-end."""
    from sindslam_tpu.slam.frame import FrameData, HostFrame
    from sindslam_tpu.slam.local_map import LocalMap

    rng = np.random.default_rng(5)
    tcfg = TrackingConfig(ba_max_keyframes=4, ba_max_points=256,
                          ba_iterations=8)
    m = LocalMap(CAM, tcfg)
    n_kf, n_pts = 10, 150
    gt_poses = np.stack([np.eye(4, dtype=np.float32) for _ in range(n_kf)])
    for k in range(n_kf):
        gt_poses[k][:3, 3] = [-0.12 * k, 0.01 * k, 0.0]
    gt_pts = rng.uniform([-2.5, -2, 2.5], [2.5, 2, 7.0],
                         (n_pts, 3)).astype(np.float32)

    noisy_pts = gt_pts + rng.normal(0, 0.04, gt_pts.shape).astype(np.float32)
    ids = m.allocate_points(noisy_pts, rng.integers(
        0, 2 ** 32, (n_pts, 8), dtype=np.uint32), 0)

    for k in range(n_kf):
        R, t = gt_poses[k][:3, :3], gt_poses[k][:3, 3]
        pc = gt_pts @ R.T + t
        u = CAM.fx * pc[:, 0] / pc[:, 2] + CAM.cx
        v = CAM.fy * pc[:, 1] / pc[:, 2] + CAM.cy
        ur = u - CAM.bf / pc[:, 2]
        ok = (u > 10) & (u < 630) & (v > 10) & (v < 470)
        xy = np.stack([u, v], -1).astype(np.float32)
        init = gt_poses[k].copy()
        if k > 0:
            xi = rng.normal(0, 0.015, 6).astype(np.float32)
            init = np.asarray(se3.se3_exp(jnp.asarray(xi)[None]))[0] @ init
        host = HostFrame(xy=xy, level=np.zeros(n_pts, np.int32),
                         angle=np.zeros(n_pts, np.float32),
                         desc=m.desc[:n_pts].copy(), valid=ok,
                         depth=pc[:, 2].astype(np.float32),
                         ur=ur.astype(np.float32))
        frame = FrameData(
            xy=jnp.asarray(xy), level=jnp.zeros(n_pts, jnp.int32),
            angle=jnp.zeros(n_pts, jnp.float32),
            desc=jnp.asarray(host.desc), valid=jnp.asarray(ok),
            depth=jnp.asarray(host.depth), ur=jnp.asarray(host.ur))
        pids = np.where(ok, ids, -1)
        m.insert_keyframe(frame, init.astype(np.float32), pids, float(k),
                          host=host)

    def pose_err():
        e = 0.0
        for k in range(1, n_kf):
            d = np.asarray(se3.se3_log(jnp.asarray(
                (m.keyframes[k].Tcw @ np.linalg.inv(gt_poses[k]))[None]
                .astype(np.float32))))[0]
            e += np.linalg.norm(d)
        return e

    before = pose_err()
    m.run_global_ba(passes=2)
    after = pose_err()
    assert after < 0.35 * before, (before, after)
    # EVERY keyframe (not just the last window) improved
    for k in range(4, n_kf):
        d = np.asarray(se3.se3_log(jnp.asarray(
            (m.keyframes[k].Tcw @ np.linalg.inv(gt_poses[k]))[None]
            .astype(np.float32))))[0]
        assert np.linalg.norm(d) < 0.02


def test_ba_fixed_pose_untouched():
    rng = np.random.default_rng(1)
    problem, gt_poses, _, _ = _make_problem(rng)
    res = local_bundle_adjustment(problem, CAM, CFG)
    np.testing.assert_allclose(np.asarray(res.poses)[0],
                               np.asarray(problem.poses)[0], atol=1e-7)


def test_ba_rejects_outlier_observations():
    rng = np.random.default_rng(2)
    problem, gt_poses, gt_pts, n_pts = _make_problem(rng, obs_noise=0.2)
    # corrupt 10% of the observations grossly
    uv = np.array(problem.obs_uv)
    valid = np.asarray(problem.obs_valid)
    m = valid.sum()
    bad = rng.choice(np.where(valid)[0], m // 10, replace=False)
    uv[bad] += rng.uniform(40, 120, (len(bad), 2))
    problem = problem._replace(obs_uv=jnp.asarray(uv))
    res = local_bundle_adjustment(problem, CAM, CFG)
    inl = np.asarray(res.obs_inlier)
    assert inl[bad].mean() < 0.1           # outliers classified out
    good = np.setdiff1d(np.where(valid)[0], bad)
    assert inl[good].mean() > 0.85
    # accuracy survives the corruption
    err = 0.0
    for k in range(1, len(gt_poses)):
        e = np.asarray(se3.se3_log(jnp.asarray(
            (np.asarray(res.poses)[k] @ np.linalg.inv(gt_poses[k]))[None]
            .astype(np.float32))))[0]
        err += np.linalg.norm(e)
    assert err < 0.02
