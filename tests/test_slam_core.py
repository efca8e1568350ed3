"""Tests for pose optimization, matching, and frame-to-frame odometry."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sindslam_tpu.config import CameraConfig, ORBConfig, TrackingConfig
from sindslam_tpu.datasets.synthetic import generate_sequence
from sindslam_tpu.evaluation import evaluate_ate
from sindslam_tpu.frontend import orb
from sindslam_tpu.geometry import se3
from sindslam_tpu.ops import image as im
from sindslam_tpu.slam import matching
from sindslam_tpu.slam.frame import build_frame, unproject_to_world
from sindslam_tpu.slam.optimizer import pose_optimization
from sindslam_tpu.slam.tracking import OdometryTracker

CAM = CameraConfig()
TCFG = TrackingConfig()


def _make_observations(rng, n=200, noise=0.0, outlier_frac=0.0, stereo_frac=0.8,
                       pose_offset=(0.05, -0.03, 0.02, 0.01, -0.02, 0.015)):
    """Random world points observed from a ground-truth pose; initial pose is
    perturbed by ``pose_offset``."""
    pts_w = rng.uniform([-3, -2, 2.0], [3, 2, 6.0], (n, 3)).astype(np.float32)
    Tcw_gt = np.asarray(se3.se3_exp(jnp.asarray(
        np.array(pose_offset, np.float32)[None] * 0.0)))[0]  # identity gt
    pc = pts_w  # camera at origin
    u = CAM.fx * pc[:, 0] / pc[:, 2] + CAM.cx
    v = CAM.fy * pc[:, 1] / pc[:, 2] + CAM.cy
    ur = u - CAM.bf / pc[:, 2]
    obs_uv = np.stack([u, v], -1) + rng.normal(0, noise, (n, 2))
    obs_ur = ur + rng.normal(0, noise, n)
    is_stereo = rng.uniform(size=n) < stereo_frac
    obs_ur = np.where(is_stereo, obs_ur, -1.0)
    valid = (u > 0) & (u < 640) & (v > 0) & (v < 480)
    n_out = int(outlier_frac * n)
    if n_out:
        idx = rng.choice(n, n_out, replace=False)
        obs_uv[idx] += rng.uniform(30, 120, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    Tcw_init = np.asarray(se3.se3_exp(jnp.asarray(np.array(pose_offset, np.float32))[None]))[0]
    return (jnp.asarray(pts_w), jnp.asarray(obs_uv.astype(np.float32)),
            jnp.asarray(obs_ur.astype(np.float32)), jnp.asarray(valid),
            jnp.asarray(Tcw_init), np.eye(4))


def test_pose_optimization_converges():
    rng = np.random.default_rng(0)
    pts, uv, ur, valid, Tcw_init, Tcw_gt = _make_observations(rng, noise=0.0)
    lvl = jnp.zeros(pts.shape[0], jnp.int32)
    res = pose_optimization(Tcw_init, pts, uv, ur, lvl, valid, CAM, TCFG)
    err = np.asarray(se3.se3_log(jnp.asarray(
        np.asarray(res.Tcw) @ np.linalg.inv(Tcw_gt))[None]))[0]
    assert np.abs(err).max() < 1e-4
    # noise-free: every in-frame observation must be an inlier
    assert int(res.n_inliers) == int(np.asarray(valid).sum())


def test_pose_optimization_with_noise_and_outliers():
    rng = np.random.default_rng(1)
    pts, uv, ur, valid, Tcw_init, Tcw_gt = _make_observations(
        rng, noise=0.5, outlier_frac=0.25)
    lvl = jnp.zeros(pts.shape[0], jnp.int32)
    res = pose_optimization(Tcw_init, pts, uv, ur, lvl, valid, CAM, TCFG)
    err = np.asarray(se3.se3_log(jnp.asarray(
        np.asarray(res.Tcw) @ np.linalg.inv(Tcw_gt))[None]))[0]
    assert np.linalg.norm(err[:3]) < 0.01     # translation < 1 cm
    assert np.linalg.norm(err[3:]) < 0.005    # rotation < 0.3 deg
    # outliers rejected
    inl = np.asarray(res.inliers)
    assert inl.sum() > 100


def test_pose_optimization_mono_only():
    rng = np.random.default_rng(2)
    pts, uv, ur, valid, Tcw_init, Tcw_gt = _make_observations(
        rng, noise=0.3, stereo_frac=0.0)
    lvl = jnp.zeros(pts.shape[0], jnp.int32)
    res = pose_optimization(Tcw_init, pts, uv, ur, lvl, valid, CAM, TCFG)
    err = np.asarray(se3.se3_log(jnp.asarray(
        np.asarray(res.Tcw) @ np.linalg.inv(Tcw_gt))[None]))[0]
    assert np.linalg.norm(err[:3]) < 0.02


def test_match_by_projection_window():
    rng = np.random.default_rng(3)
    n = 64
    desc = jnp.asarray(rng.integers(0, 2 ** 32, (n, 8), dtype=np.uint32))
    xy = jnp.asarray(rng.uniform(50, 400, (n, 2)).astype(np.float32))
    lvl = jnp.zeros(n, jnp.int32)
    ok = jnp.ones(n, bool)
    # targets = sources shifted by 2 px, same descriptors
    m = matching.match_by_projection(xy, ok, desc, lvl,
                                     xy + 2.0, desc, lvl, ok,
                                     radius=7.0, max_dist=50)
    assert bool(m.valid.all())
    np.testing.assert_array_equal(np.asarray(m.idx), np.arange(n))
    # radius too small: no matches
    m2 = matching.match_by_projection(xy, ok, desc, lvl,
                                      xy + 20.0, desc, lvl, ok,
                                      radius=7.0, max_dist=50)
    assert not bool(m2.valid.any())


def test_match_unique_assignment():
    """Two sources projecting to the same target: only the closer-descriptor
    one keeps it."""
    desc_t = jnp.asarray(np.array([[0xFFFF0000] * 8], np.uint32))
    desc_a = jnp.concatenate([desc_t, desc_t ^ jnp.uint32(0xF)])  # d=0 and d=4
    xy_t = jnp.asarray(np.array([[100.0, 100.0]], np.float32))
    proj = jnp.asarray(np.array([[100.0, 100.0], [101.0, 100.0]], np.float32))
    m = matching.match_by_projection(
        proj, jnp.ones(2, bool), desc_a, jnp.zeros(2, jnp.int32),
        xy_t, desc_t, jnp.zeros(1, jnp.int32), jnp.ones(1, bool),
        radius=7.0, max_dist=50)
    v = np.asarray(m.valid)
    assert v[0] and not v[1]


def test_rotation_consistency_rejects_rotated_outliers():
    """Reference ORBmatcher.cc:45-140: matches whose relative orientation
    falls outside the 3 dominant 12-degree bins are rejected."""
    n = 64
    idx = jnp.arange(n, dtype=jnp.int32)
    m = matching.Matches(idx=idx, dist=jnp.zeros(n, jnp.int32),
                         valid=jnp.ones(n, bool))
    src_angle = jnp.zeros(n, jnp.float32)
    # most targets rotated ~0.05 rad; 6 outliers scattered across distinct
    # orientations (each far below 10% of the dominant bin)
    tgt_angle = np.full(n, 0.05, np.float32)
    out = np.arange(0, 60, 10)
    tgt_angle[out] = 1.0 + 0.5 * np.arange(len(out), dtype=np.float32)
    f = matching.filter_rotation_consistency(m, src_angle,
                                             jnp.asarray(tgt_angle))
    v = np.asarray(f.valid)
    assert not v[out].any(), "rotated outliers must be rejected"
    inl = np.setdiff1d(np.arange(n), out)
    assert v[inl].all(), "consistent matches must survive"
    assert (np.asarray(f.idx)[out] == -1).all()


def test_mutual_nn_ratio():
    rng = np.random.default_rng(4)
    a = rng.integers(0, 2 ** 32, (32, 8), dtype=np.uint32)
    b = np.roll(a, 5, axis=0)  # permuted copies
    m = matching.match_mutual_nn(jnp.asarray(a), jnp.ones(32, bool),
                                 jnp.asarray(b), jnp.ones(32, bool), max_dist=10)
    v = np.asarray(m.valid)
    assert v.all()
    # b = roll(a, 5) means b[(i + 5) % 32] == a[i]
    np.testing.assert_array_equal(np.asarray(m.idx), (np.arange(32) + 5) % 32)


@pytest.mark.slow
def test_odometry_on_synthetic_static_scene():
    """End-to-end: ORB + depth frames through the odometry tracker; ATE must
    be small on a static synthetic scene."""
    # amplitude 0.06 over 8 frames ~ 2-3 cm/frame ~ 0.8 m/s at 30 fps:
    # realistic handheld speed (the guided-search window covers ~15 px)
    frames = list(generate_sequence(n_frames=8, seed=1, with_dynamic=False,
                                    amplitude=0.06))
    ocfg = ORBConfig(n_features=800, n_levels=4)
    tracker = OdometryTracker(CAM, TCFG)
    est, gt, ts = [], [], []
    zero_mask = jnp.zeros((480, 640), jnp.int32)
    for rgb, depth, dyn, pose_wc, t in frames:
        g = im.rgb_to_gray(jnp.asarray(rgb))
        feats = orb.extract_orb(g, zero_mask, ocfg)
        fr = build_frame(feats, jnp.asarray(depth), CAM, t)
        Tcw, info = tracker.track(fr)
        est.append(np.linalg.inv(Tcw)[:3, 3])
        gt.append(pose_wc[:3, 3])
        ts.append(t)
        assert not tracker.lost, f"tracker lost at t={t}: {info}"
    res = evaluate_ate(np.array(ts), np.array(gt), np.array(ts), np.array(est))
    assert res.rmse < 0.02, str(res)


def test_track_out_bitpack_roundtrip():
    """The bit-packed FullTrackOut payload decodes exactly (idx + 3 flags)."""
    from sindslam_tpu.slam.tracking import unpack_track_out

    rng = np.random.default_rng(3)
    P = 64
    idx = rng.integers(-1, 1500, P).astype(np.int32)
    valid = rng.uniform(size=P) < 0.5
    inlier = valid & (rng.uniform(size=P) < 0.5)
    vis = rng.uniform(size=P) < 0.7
    poses = rng.normal(size=(2, 4, 4)).astype(np.float32)
    counts = np.array([7, 42], np.int32)

    code = ((jnp.asarray(idx) + 1).astype(jnp.uint32)
            | (jnp.asarray(valid).astype(jnp.uint32) << 13)
            | (jnp.asarray(inlier).astype(jnp.uint32) << 14)
            | (jnp.asarray(vis).astype(jnp.uint32) << 15))
    words = jax.lax.bitcast_convert_type(
        code[0::2] | (code[1::2] << 16), jnp.float32)
    packed = np.asarray(jnp.concatenate([
        jnp.asarray(poses).reshape(-1),
        jnp.asarray(counts).astype(jnp.float32), words]))

    poses2, counts2, idx2, flags2 = unpack_track_out(packed, P)
    np.testing.assert_array_equal(idx2, idx)
    np.testing.assert_array_equal(flags2[0], valid)
    np.testing.assert_array_equal(flags2[1], inlier)
    np.testing.assert_array_equal(flags2[2], vis)
    np.testing.assert_allclose(poses2, poses, rtol=1e-6)
    np.testing.assert_array_equal(counts2, counts)
