"""Long-loop global-BA regression (VERDICT r2 weak #7).

``LocalMap.run_global_ba`` now has two paths: a JOINT solve over the whole
map (matrix-free PCG Schur, ``slam/gba.py``) for maps up to
``gba_max_keyframes``, and the overlapping anchored windowed sweeps as the
fallback beyond that. These tests build closed loops with odometry drift
and loop-closure co-observations between the loop ends, and check that

1. the sweep FALLBACK still propagates the correction end-to-end on a
   120-keyframe loop (6x the 20-keyframe BA window) — forced by setting
   ``gba_max_keyframes`` below the map size;
2. the joint solver closes the same class of loop tighter than sweeps on
   identical data (the r2 verdict's open question: window seams leave
   residual bending a joint solve removes).

Observations are exact projections of the true structure under the true
poses, so ground truth is the global optimum (zero residual); initial poses
carry accumulated random-walk drift and initial points are back-projected
from the drifted poses (structure consistent with the drift, as after real
tracking).
"""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from sindslam_tpu.config import CameraConfig, TrackingConfig
from sindslam_tpu.slam.frame import FrameData, HostFrame
from sindslam_tpu.slam.local_map import LocalMap

CAM = CameraConfig()
CFG = TrackingConfig()

RADIUS = 3.0


def _true_pose(k: int, n_kf: int) -> np.ndarray:
    """World->camera for keyframe k on a closed circle, looking tangentially."""
    th = 2.0 * np.pi * k / n_kf
    p = np.array([RADIUS * np.cos(th), RADIUS * np.sin(th), 0.0])
    z = np.array([-np.sin(th), np.cos(th), 0.0])      # forward = tangent
    y = np.array([0.0, 0.0, 1.0])
    x = np.cross(y, z)
    Rwc = np.stack([x, y, z], axis=1)
    Tcw = np.eye(4, dtype=np.float64)
    Tcw[:3, :3] = Rwc.T
    Tcw[:3, 3] = -Rwc.T @ p
    return Tcw


def _rot(axis_angle: np.ndarray) -> np.ndarray:
    th = float(np.linalg.norm(axis_angle))
    if th < 1e-12:
        return np.eye(3)
    a = axis_angle / th
    K = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]])
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)


def _project(Tcw: np.ndarray, pw: np.ndarray):
    pc = pw @ Tcw[:3, :3].T + Tcw[:3, 3]
    z = pc[:, 2]
    u = CAM.fx * pc[:, 0] / z + CAM.cx
    v = CAM.fy * pc[:, 1] / z + CAM.cy
    return u, v, z


def _backproject(Tcw: np.ndarray, u, v, z):
    pc = np.stack([(u - CAM.cx) / CAM.fx * z, (v - CAM.cy) / CAM.fy * z, z], -1)
    Rcw, t = Tcw[:3, :3], Tcw[:3, 3]
    return (pc - t) @ Rcw


def _centers(Tcws) -> np.ndarray:
    return np.stack([-T[:3, :3].T @ T[:3, 3] for T in Tcws])


def _build_loop_map(cfg: TrackingConfig, n_kf: int, n_new: int, n_reuse: int,
                    n_loop: int, seed: int, px_noise: float = 0.0):
    """A closed-loop LocalMap with odometry drift: observations of the
    true structure (exact, or with ``px_noise``-sigma pixel noise), drifted
    keyframe poses, points back-projected from the drifted poses.
    Returns (map, kfs, true_poses, drift_rmse)."""
    rng = np.random.default_rng(seed)
    m = LocalMap(CAM, cfg)

    true_poses = [_true_pose(k, n_kf) for k in range(n_kf)]
    # odometry drift: estimated chain composes true relative motion plus a
    # small random-walk twist each step
    est_poses = [true_poses[0].copy()]
    for k in range(1, n_kf):
        rel = true_poses[k] @ np.linalg.inv(true_poses[k - 1])
        noise = np.eye(4)
        noise[:3, :3] = _rot(rng.normal(0, 1.2e-3, 3))
        noise[:3, 3] = rng.normal(0, 2.0e-3, 3)
        est_poses.append(noise @ rel @ est_poses[k - 1])

    drift0 = float(np.sqrt(np.mean(np.sum(
        (_centers(est_poses) - _centers(true_poses)) ** 2, axis=1))))

    pts_of_kf = []
    ids_of_kf = []
    kfs = []
    for k in range(n_kf):
        u = rng.uniform(60, 580, n_new)
        v = rng.uniform(60, 420, n_new)
        z = rng.uniform(1.5, 4.0, n_new)
        pw_new = _backproject(true_poses[k], u, v, z)

        obs_pw = [pw_new]
        obs_gid = [None]                       # None = allocate fresh
        if k > 0:
            sel = rng.permutation(n_new)[:n_reuse]
            obs_pw.append(pts_of_kf[k - 1][sel])
            obs_gid.append(ids_of_kf[k - 1][sel])
        if k >= n_kf - 2:                      # the revisit: see KF0/KF1 points
            src = k - (n_kf - 2)
            sel = rng.permutation(n_new)[:n_loop]
            obs_pw.append(pts_of_kf[src][sel])
            obs_gid.append(ids_of_kf[src][sel])

        pw = np.concatenate(obs_pw)
        uu, vv, zz = _project(true_poses[k], pw)
        if px_noise > 0.0:
            uu = uu + rng.normal(0, px_noise, len(uu))
            vv = vv + rng.normal(0, px_noise, len(vv))
        ok = (zz > 0.3) & (uu > 2) & (uu < 637) & (vv > 2) & (vv < 477)

        # static-shape convention: every keyframe is padded to the same
        # capacity (build_ba_window stacks kf.point_ids across the window)
        n = n_new + n_reuse + n_loop
        pad = n - len(pw)
        uu = np.concatenate([uu, np.full(pad, 320.0)])
        vv = np.concatenate([vv, np.full(pad, 240.0)])
        zz = np.concatenate([zz, np.ones(pad)])
        ok = np.concatenate([ok, np.zeros(pad, bool)])
        desc = rng.integers(0, 2 ** 32, (n, 8), dtype=np.uint32)
        xy = np.stack([uu, vv], -1).astype(np.float32)
        host = HostFrame(xy=xy, level=np.zeros(n, np.int32),
                         angle=np.zeros(n, np.float32), desc=desc,
                         valid=ok.copy(), depth=zz.astype(np.float32),
                         ur=(uu - CAM.bf / zz).astype(np.float32))
        frame = FrameData(xy=jnp.asarray(xy),
                          level=jnp.zeros(n, jnp.int32),
                          angle=jnp.zeros(n, jnp.float32),
                          desc=jnp.asarray(desc),
                          valid=jnp.asarray(ok),
                          depth=jnp.asarray(host.depth),
                          ur=jnp.asarray(host.ur), timestamp=float(k))

        point_ids = np.full(n, -1, np.int64)
        off = 0
        for pw_g, gid in zip(obs_pw, obs_gid):
            nn = len(pw_g)
            if gid is None:
                # fresh points enter the map back-projected from the DRIFTED
                # pose at the observed pixel/depth (structure matches drift)
                init = _backproject(est_poses[k], uu[off:off + nn],
                                    vv[off:off + nn], zz[off:off + nn])
                point_ids[off:off + nn] = m.allocate_points(
                    init.astype(np.float32), desc[off:off + nn], k)
            else:
                point_ids[off:off + nn] = gid
            off += nn
        point_ids[~ok] = -1

        kf = m.insert_keyframe(frame, est_poses[k].astype(np.float32),
                               point_ids, float(k), host=host)
        kfs.append(kf)
        pts_of_kf.append(pw[:n_new])           # world truth of the new points
        ids_of_kf.append(point_ids[:n_new])

    return m, kfs, true_poses, drift0


def _pose_rmse(kfs, true_poses) -> tuple:
    est_after = [kf.Tcw.astype(np.float64) for kf in kfs]
    err = np.sqrt(np.sum((_centers(est_after) - _centers(true_poses)) ** 2,
                         axis=1))
    return float(np.sqrt(np.mean(err ** 2))), float(err.max())


@pytest.mark.slow
def test_windowed_global_ba_closes_a_120_keyframe_loop():
    """The sweep FALLBACK (maps beyond gba_max_keyframes) must still
    propagate a loop correction end-to-end."""
    cfg = dataclasses.replace(CFG, gba_max_keyframes=16)  # force sweeps
    m, kfs, true_poses, drift0 = _build_loop_map(
        cfg, n_kf=120, n_new=150, n_reuse=150, n_loop=100, seed=3)
    assert drift0 > 0.015, f"synthetic drift too small to test: {drift0}"

    m.run_global_ba(passes=3)

    rmse, emax = _pose_rmse(kfs, true_poses)
    # end-to-end propagation: big factor off the initial drift and small in
    # absolute terms (obs are exact, so the optimum is the truth)
    assert rmse < 0.25 * drift0, \
        f"windowed GBA left seams: rmse {rmse:.4f} vs drift {drift0:.4f}"
    assert rmse < 0.02, f"absolute rmse after GBA too high: {rmse:.4f}"
    # no single seam: worst keyframe error bounded too
    assert emax < 0.06, f"max keyframe error {emax:.4f}"


@pytest.mark.slow
def test_joint_gba_beats_windowed_sweeps_on_identical_loop():
    """VERDICT r2 weak #7 done-criterion: the joint solve must close the
    same loop TIGHTER than the sweeps on identical data. With 0.6 px
    observation noise the global optimum requires trading error across the
    WHOLE loop at once; anchored windows can only trade locally, and the
    seams show (measured: sweeps 29.1 mm RMSE / 65 mm worst keyframe vs
    joint 8.3 mm / 16 mm on this scenario). On exact observations both
    reach the optimum and the comparison degenerates — noise is what makes
    the structural difference observable."""
    kwargs = dict(n_kf=120, n_new=150, n_reuse=150, n_loop=100, seed=3,
                  px_noise=0.6)

    cfg_sweep = dataclasses.replace(CFG, gba_max_keyframes=16)
    m_s, kfs_s, true_s, drift0 = _build_loop_map(cfg_sweep, **kwargs)
    assert drift0 > 0.015, f"synthetic drift too small to test: {drift0}"
    m_s.run_global_ba(passes=2)
    rmse_sweep, emax_sweep = _pose_rmse(kfs_s, true_s)

    m_j, kfs_j, true_j, drift0_j = _build_loop_map(CFG, **kwargs)
    assert abs(drift0_j - drift0) < 1e-12   # identical data
    chi2 = m_j.run_global_ba()
    assert chi2 is not None, "joint path did not run"
    rmse_joint, emax_joint = _pose_rmse(kfs_j, true_j)

    # joint distributes the loop error globally: materially tighter in RMSE
    # and in the worst keyframe than the windowed sweeps on the same data
    assert rmse_joint < 0.015, f"joint GBA rmse too high: {rmse_joint:.4f}"
    assert rmse_joint < 0.6 * rmse_sweep, (rmse_joint, rmse_sweep)
    assert emax_joint < 0.6 * emax_sweep, (emax_joint, emax_sweep)


@pytest.mark.slow
def test_joint_gba_closes_clean_120_keyframe_loop_exactly():
    """On exact observations the truth is the global optimum; the joint
    solve must reach it (sub-mm), proving the PCG Schur machinery converges
    at the 128-keyframe bucket (no trim, no truncation)."""
    m, kfs, true_poses, drift0 = _build_loop_map(
        CFG, n_kf=120, n_new=150, n_reuse=150, n_loop=100, seed=3)
    chi2 = m.run_global_ba()
    assert chi2 is not None, "joint path did not run"
    rmse, emax = _pose_rmse(kfs, true_poses)
    assert rmse < 1e-3, f"joint GBA rmse {rmse:.5f} vs drift {drift0:.4f}"
    assert emax < 2e-3, f"max keyframe error {emax:.5f}"
