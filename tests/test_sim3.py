"""Sim(3) geometry + mono scale-drift loop correction (VERDICT r3 #5).

Parity targets: ``ORB_SLAM2/src/Sim3Solver.cc`` (scale-estimating Horn +
RANSAC), ``Optimizer.cc:1046`` (OptimizeSim3), ``Optimizer.cc:781``
(OptimizeEssentialGraph with bFixScale=false for mono).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sindslam_tpu.geometry import se3
from sindslam_tpu.geometry import sim3 as s3
from sindslam_tpu.slam.loop_closing import (ransac_sim3, refine_sim3_irls,
                                            sim3_from_pairs)
from sindslam_tpu.slam.pose_graph import PoseGraph, optimize_pose_graph_sim3

pytestmark = pytest.mark.filterwarnings("ignore")


def test_sim3_exp_log_roundtrip():
    rng = np.random.default_rng(0)
    xi = np.concatenate([rng.normal(0, 0.8, (32, 3)),
                         rng.normal(0, 0.9, (32, 3)),
                         rng.normal(0, 0.4, (32, 1))], -1).astype(np.float64)
    S = s3.sim3_exp(jnp.asarray(xi))
    back = np.asarray(s3.sim3_log(S))
    np.testing.assert_allclose(back, xi, atol=1e-6)
    # inverse consistency
    ident = np.asarray(S @ s3.sim3_inverse(S))
    np.testing.assert_allclose(ident, np.broadcast_to(np.eye(4), ident.shape),
                               atol=1e-6)


def test_sim3_exp_matches_se3_at_zero_scale():
    rng = np.random.default_rng(1)
    xi6 = rng.normal(0, 0.5, (8, 6))
    xi7 = np.concatenate([xi6, np.zeros((8, 1))], -1)
    T = np.asarray(se3.se3_exp(jnp.asarray(xi6)))
    S = np.asarray(s3.sim3_exp(jnp.asarray(xi7)))
    np.testing.assert_allclose(S, T, atol=1e-6)


def test_sim3_adjoint_numeric():
    """Adj(S) x == log(S exp(x) S^-1) to first order."""
    rng = np.random.default_rng(2)
    xi = jnp.asarray(np.concatenate([rng.normal(0, 0.5, 3),
                                     rng.normal(0, 0.7, 3),
                                     [0.3]]))
    S = s3.sim3_exp(xi[None])[0]
    Adj = np.asarray(s3.sim3_adjoint(S[None])[0])
    for k in range(5):
        x = rng.normal(0, 1e-3, 7)
        lhs = np.asarray(s3.sim3_log(
            (S @ s3.sim3_exp(jnp.asarray(x)[None])[0]
             @ s3.sim3_inverse(S[None])[0])[None]))[0]
        # f32 pipeline + first-order approximation: tolerance covers both
        np.testing.assert_allclose(lhs, Adj @ x, atol=5e-6)


def test_sim3_from_pairs_recovers_scale():
    rng = np.random.default_rng(3)
    xi = jnp.asarray(np.array([0.3, -0.2, 0.4, 0.2, -0.15, 0.1, 0.18],
                              np.float32))
    S = s3.sim3_exp(xi[None])[0]
    pa = jnp.asarray(rng.uniform(-2, 2, (60, 3)).astype(np.float32))
    pb = s3.sim3_transform_points(S[None], pa[None])[0]
    S_est = sim3_from_pairs(pa, pb, jnp.ones(60))
    np.testing.assert_allclose(np.asarray(S_est), np.asarray(S), atol=1e-4)
    assert abs(float(s3.sim3_scale(S_est[None])[0]) - np.exp(0.18)) < 1e-3


def test_ransac_sim3_with_outliers():
    rng = np.random.default_rng(4)
    xi = jnp.asarray(np.array([0.2, -0.1, 0.3, 0.05, -0.1, 0.08, 0.12],
                              np.float32))
    S = s3.sim3_exp(xi[None])[0]
    n = 120
    pa = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    pb = np.array(s3.sim3_transform_points(S[None], jnp.asarray(pa)[None])[0])
    pb += rng.normal(0, 0.01, pb.shape)
    out = rng.choice(n, 40, replace=False)
    pb[out] += rng.uniform(0.5, 2.0, (40, 3))
    S_est, inl = ransac_sim3(jnp.asarray(pa), jnp.asarray(pb.astype(np.float32)),
                             jnp.ones(n, bool), jax.random.PRNGKey(0),
                             thresh=0.05)
    S_est = refine_sim3_irls(jnp.asarray(pa), jnp.asarray(pb.astype(np.float32)),
                             inl, S_est)
    err = np.asarray(s3.sim3_log((s3.sim3_inverse(S[None])[0] @ S_est)[None]))[0]
    assert np.linalg.norm(err) < 0.02, err
    assert abs(float(s3.sim3_scale(S_est[None])[0]) - np.exp(0.12)) < 0.01


def test_sim3_pose_graph_corrects_scale_drift():
    """A mono loop with 10% accumulated scale drift: the Sim3 essential
    graph must squeeze the scale error around the loop (the SE3 graph
    structurally cannot — it has no scale DOF)."""
    K = 12
    gt = []
    for k in range(K):
        a = 2 * np.pi * k / K
        T = np.eye(4)
        T[:3, 3] = [np.cos(a) - 1.0, np.sin(a), 0.0]
        gt.append(T)
    gt = np.stack(gt).astype(np.float64)

    # mono drift: estimated translations grow by 10% over the loop
    est = gt.copy()
    for k in range(K):
        est[k, :3, 3] *= 1.0 + 0.1 * k / (K - 1)

    ei, ej, eT, ew = [], [], [], []
    for k in range(K - 1):
        ei.append(k)
        ej.append(k + 1)
        eT.append(est[k] @ np.linalg.inv(est[k + 1]))   # drift-consistent
        ew.append(1.0)
    # loop edge measured as a SIM3: relative pose + relative scale 1.1
    # (what ransac_sim3 recovers between the drifted revisit keyframe and
    # the original map)
    S_loop = gt[0] @ np.linalg.inv(gt[K - 1])
    S_loop = np.asarray(s3.sim3_from_se3(jnp.asarray(S_loop),
                                         1.0 / 1.1))
    ei.append(0)
    ej.append(K - 1)
    eT.append(np.asarray(S_loop))
    ew.append(5.0)

    graph = PoseGraph(
        poses=jnp.asarray(est.astype(np.float32)),
        edge_i=jnp.asarray(np.array(ei, np.int32)),
        edge_j=jnp.asarray(np.array(ej, np.int32)),
        edge_T=jnp.asarray(np.stack(eT).astype(np.float32)),
        edge_w=jnp.asarray(np.array(ew, np.float32)),
        fixed=jnp.asarray(np.arange(K) == 0),
    )
    opt = np.asarray(optimize_pose_graph_sim3(graph, n_iters=40))

    # scales must spread the 10% drift smoothly (all between ~0.9 and ~1.0
    # relative correction), and the SE3-normalized poses must be closer to
    # ground truth than the drifted input
    def err(poses):
        e = 0.0
        for k in range(K):
            P = poses[k]
            s = np.cbrt(max(np.linalg.det(P[:3, :3]), 1e-30))
            t = P[:3, 3] / s
            e += np.linalg.norm(t - gt[k, :3, 3])
        return e

    before = err(est)
    after = err(opt)
    assert after < 0.4 * before, (before, after)
    scales = [float(np.cbrt(max(np.linalg.det(opt[k, :3, :3]), 1e-30)))
              for k in range(K)]
    assert all(0.85 < s < 1.15 for s in scales), scales


def test_mono_loop_correction_end_to_end_fabricated():
    """_close_with in mono mode: fabricated revisit with 10% scale drift on
    the revisit keyframe's pose/points; the Sim3 RANSAC must measure the
    scale and the correction must restore the keyframe's scale."""
    import jax.numpy as jnp

    from sindslam_tpu.config import SystemConfig
    from sindslam_tpu.slam.frame import FrameData
    from sindslam_tpu.slam.local_map import LocalMap
    from sindslam_tpu.slam.loop_closing import Relocalizer

    rng = np.random.default_rng(7)
    cfg = SystemConfig()
    m = LocalMap(cfg.camera, cfg.tracking)
    m.mono = True
    n = 150

    desc = rng.integers(0, 2 ** 32, (n, 8), dtype=np.uint32)
    pts_c = np.stack([rng.uniform(-1.5, 1.5, n), rng.uniform(-1, 1, n),
                      rng.uniform(2, 5, n)], -1)        # camera-frame points
    # keypoints must be the REAL projections (round-5 acceptance gates
    # verify the loop transform by guided projection + post-apply map
    # consistency; geometrically-inconsistent fabrications are now
    # correctly rejected). 1.1*pts_c projects to the SAME pixels (same
    # rays), so both keyframes share this xy.
    cam = cfg.camera
    uv = np.stack([pts_c[:, 0] / pts_c[:, 2] * cam.fx + cam.cx,
                   pts_c[:, 1] / pts_c[:, 2] * cam.fy + cam.cy],
                  -1).astype(np.float32)

    def make_frame(consistent: bool = False):
        xy = uv if consistent else rng.uniform(0, 400, (n, 2)).astype(np.float32)
        return FrameData(
            xy=jnp.asarray(xy),
            level=jnp.zeros(n, jnp.int32), angle=jnp.zeros(n, jnp.float32),
            desc=jnp.asarray(desc), valid=jnp.ones(n, bool),
            depth=jnp.zeros(n, jnp.float32), ur=jnp.full(n, -1.0))

    # original keyframe at identity with correctly-scaled points
    ids_a = m.allocate_points(pts_c.copy(), desc, 0)
    kf_a = m.insert_keyframe(make_frame(consistent=True),
                             np.eye(4, dtype=np.float32), ids_a, 0.0)
    # spacer keyframes so the graph has a chain
    for k in range(1, 5):
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = 0.1 * k
        m.insert_keyframe(make_frame(), T,
                          np.full(n, -1, np.int64), float(k))
    # revisit keyframe: SAME viewpoint but its map duplicates are 10%
    # larger (mono scale drift) — its camera-frame geometry is 1.1 * pts_c
    ids_b = m.allocate_points(1.1 * pts_c, desc, 5)
    kf_b = m.insert_keyframe(make_frame(consistent=True),
                             np.eye(4, dtype=np.float32), ids_b, 5.0)

    class FakeSystem:
        pass

    sys_ = FakeSystem()
    sys_.map = m
    sys_.Tcw = np.eye(4, dtype=np.float32)
    sys_.velocity = np.eye(4, dtype=np.float32)

    reloc = Relocalizer(cfg)
    ok = reloc._close_with(sys_, kf_b, kf_a, min_inliers=25)
    assert ok, "mono Sim3 loop correction did not run"
    # the revisit keyframe's duplicated points must have been pulled toward
    # the original scale (p' = inv(S_new) @ T_old p). The chain edges share
    # part of the correction, so require at least half the 10% drift gone.
    ratio = np.median(np.linalg.norm(m.pos[ids_b], axis=1)
                      / np.linalg.norm(pts_c, axis=1))
    assert ratio < 1.05, ratio
    assert ratio > 0.90, ratio
    # and the keyframe pose came back as a proper SE3 (unit scale)
    s_kf = np.cbrt(np.linalg.det(kf_b.Tcw[:3, :3]))
    np.testing.assert_allclose(s_kf, 1.0, atol=1e-4)
