"""Tests for the BoW vocabulary, keyframe database, pose graph, and rigid
RANSAC used by relocalization/loop closing."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sindslam_tpu.geometry import se3
from sindslam_tpu.slam.bow import (
    KeyFrameDatabase,
    l1_score,
    signature,
    train_vocabulary,
)
from sindslam_tpu.slam.loop_closing import ransac_rigid, rigid_from_pairs
from sindslam_tpu.slam.pose_graph import PoseGraph, optimize_pose_graph


def _random_descs(rng, n):
    return rng.integers(0, 2 ** 32, (n, 8), dtype=np.uint32)


def _perturb(descs, rng, n_bits=8):
    out = descs.copy()
    for i in range(len(out)):
        for _ in range(n_bits):
            w = rng.integers(0, 8)
            b = rng.integers(0, 32)
            out[i, w] ^= np.uint32(1) << np.uint32(b)
    return out


def test_vocabulary_separates_scenes():
    rng = np.random.default_rng(0)
    # two distinct descriptor populations ("places")
    base_a = _random_descs(rng, 40)
    base_b = _random_descs(rng, 40)
    corpus = np.concatenate([
        np.concatenate([_perturb(base_a, rng) for _ in range(8)]),
        np.concatenate([_perturb(base_b, rng) for _ in range(8)]),
    ])
    vocab = train_vocabulary(corpus, k=4, levels=3, seed=0)
    assert vocab.n_words == 64

    wa = vocab.quantize(jnp.asarray(_perturb(base_a, rng)), jnp.ones(40, bool))
    wa2 = vocab.quantize(jnp.asarray(_perturb(base_a, rng)), jnp.ones(40, bool))
    wb = vocab.quantize(jnp.asarray(_perturb(base_b, rng)), jnp.ones(40, bool))
    sa = signature(wa, vocab.n_words)
    sa2 = signature(wa2, vocab.n_words)
    sb = signature(wb, vocab.n_words)
    same = l1_score(sa, sa2)
    diff = l1_score(sa, sb)
    assert same > diff + 0.15
    assert same > 0.5


def test_database_query_ranks_same_place_first():
    rng = np.random.default_rng(1)
    bases = [_random_descs(rng, 40) for _ in range(4)]
    corpus = np.concatenate([np.concatenate([_perturb(b, rng) for _ in range(6)])
                             for b in bases])
    vocab = train_vocabulary(corpus, k=4, levels=3, seed=1)
    db = KeyFrameDatabase(vocab)
    for kf_id, b in enumerate(bases):
        words = vocab.quantize(jnp.asarray(_perturb(b, rng)), jnp.ones(40, bool))
        db.add(kf_id, words)
    q = vocab.quantize(jnp.asarray(_perturb(bases[2], rng)), jnp.ones(40, bool))
    res = db.query(q, top=4)
    assert res[0][0] == 2


def test_rigid_from_pairs_exact():
    rng = np.random.default_rng(2)
    xi = jnp.asarray(rng.normal(0, 0.3, 6).astype(np.float32))
    T = se3.se3_exp(xi[None])[0]
    pa = jnp.asarray(rng.uniform(-2, 2, (50, 3)).astype(np.float32))
    pb = se3.transform_points(T[None], pa[None])[0]
    T_est = rigid_from_pairs(pa, pb, jnp.ones(50))
    np.testing.assert_allclose(np.asarray(T_est), np.asarray(T), atol=1e-4)


def test_ransac_rigid_with_outliers():
    rng = np.random.default_rng(3)
    xi = jnp.asarray(np.array([0.2, -0.1, 0.3, 0.05, -0.1, 0.08], np.float32))
    T = se3.se3_exp(xi[None])[0]
    n = 120
    pa = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    pb = np.array(se3.transform_points(T[None], jnp.asarray(pa)[None])[0])
    pb += rng.normal(0, 0.01, pb.shape)
    out = rng.choice(n, 40, replace=False)
    pb[out] += rng.uniform(0.5, 2.0, (40, 3))
    T_est, inl = ransac_rigid(jnp.asarray(pa), jnp.asarray(pb.astype(np.float32)),
                              jnp.ones(n, bool), jax.random.PRNGKey(0),
                              thresh=0.05)
    err = np.asarray(se3.se3_log((se3.se3_inverse(T[None])[0] @ T_est)[None]))[0]
    assert np.linalg.norm(err) < 0.02
    inl = np.asarray(inl)
    assert inl[np.setdiff1d(np.arange(n), out)].mean() > 0.9
    assert inl[out].mean() < 0.1


def test_loop_consistency_window():
    """LoopClosing.cc:141-229: a loop candidate is accepted only after its
    covisibility group is consistent across >=3 consecutive detections; a
    one-off BoW hit (repetitive texture) is rejected."""
    import jax.numpy as jnp

    from sindslam_tpu.config import SystemConfig
    from sindslam_tpu.slam.frame import FrameData
    from sindslam_tpu.slam.local_map import LocalMap
    from sindslam_tpu.slam.loop_closing import Relocalizer

    rng = np.random.default_rng(7)
    base_a = _random_descs(rng, 80)     # "place A" appearance
    base_b = _random_descs(rng, 80)     # distinct filler place
    corpus = np.concatenate(
        [np.concatenate([_perturb(b, rng) for _ in range(6)])
         for b in (base_a, base_b)])
    vocab = train_vocabulary(corpus, k=4, levels=3, seed=7)

    cfg = SystemConfig()
    m = LocalMap(cfg.camera, cfg.tracking)

    def make_frame(base):
        d = _perturb(base, rng)
        n = len(d)
        return FrameData(
            xy=jnp.asarray(rng.uniform(0, 400, (n, 2)).astype(np.float32)),
            level=jnp.zeros(n, jnp.int32), angle=jnp.zeros(n, jnp.float32),
            desc=jnp.asarray(d), valid=jnp.ones(n, bool),
            depth=jnp.full(n, 2.0, jnp.float32), ur=jnp.full(n, -1.0))

    reloc = Relocalizer(cfg, vocab=vocab)

    class FakeSystem:
        pass

    sys_ = FakeSystem()
    sys_.map = m

    # keyframes 0-2: place A, sharing map points (covisible group)
    ids_a = np.arange(80, dtype=np.int64)
    for _ in range(3):
        kf = m.insert_keyframe(make_frame(base_a), np.eye(4, dtype=np.float32),
                               ids_a, 0.0)
        reloc.add_keyframe(kf)
    # keyframes 3-19: filler place B (pushes A out of the recent window)
    ids_b = np.arange(200, 280, dtype=np.int64)
    for _ in range(17):
        kf = m.insert_keyframe(make_frame(base_b), np.eye(4, dtype=np.float32),
                               ids_b, 0.0)
        reloc.add_keyframe(kf)

    closed_with = []
    reloc._close_with = lambda system, kf, cand, mi: (
        closed_with.append(cand.kf_id), True)[-1]

    # revisit place A: detections must accumulate 3 consistent hits before
    # _close_with is reached (accept on the 4th consecutive detection)
    ids_r = np.arange(400, 480, dtype=np.int64)
    results = []
    for _ in range(5):
        kf = m.insert_keyframe(make_frame(base_a), np.eye(4, dtype=np.float32),
                               ids_r, 0.0)
        reloc.add_keyframe(kf)
        results.append(reloc.try_close_loop(sys_))
        if results[-1]:
            break
    assert results[:3] == [False, False, False], results
    assert results[-1], results
    assert all(c in (0, 1, 2) for c in closed_with)
    # the window resets after a successful closure
    assert reloc._consistent_groups == []


def test_pose_graph_closes_drift():
    """Classic loop: odometry drifts, one loop edge fixes it."""
    rng = np.random.default_rng(4)
    K = 12
    # ground truth: poses around a circle (Tcw)
    gt = []
    for k in range(K):
        a = 2 * np.pi * k / K
        T = np.eye(4)
        T[:3, 3] = [np.cos(a) - 1, np.sin(a), 0.0]
        gt.append(T)
    gt = np.stack(gt).astype(np.float32)

    # odometry with accumulating noise
    noisy = [gt[0]]
    for k in range(1, K):
        rel = gt[k] @ np.linalg.inv(gt[k - 1])
        xi = rng.normal(0, 0.01, 6).astype(np.float32)
        rel_noisy = np.asarray(se3.se3_exp(jnp.asarray(xi)[None]))[0] @ rel
        noisy.append(rel_noisy @ noisy[-1])
    noisy = np.stack(noisy).astype(np.float32)

    ei, ej, eT, ew = [], [], [], []
    for k in range(K - 1):
        ei.append(k)
        ej.append(k + 1)
        eT.append(noisy[k] @ np.linalg.inv(noisy[k + 1]))  # odometry edges
        ew.append(1.0)
    # exact loop edge between last and first
    ei.append(0)
    ej.append(K - 1)
    eT.append(gt[0] @ np.linalg.inv(gt[K - 1]))
    ew.append(10.0)

    graph = PoseGraph(
        poses=jnp.asarray(noisy),
        edge_i=jnp.asarray(np.array(ei, np.int32)),
        edge_j=jnp.asarray(np.array(ej, np.int32)),
        edge_T=jnp.asarray(np.stack(eT).astype(np.float32)),
        edge_w=jnp.asarray(np.array(ew, np.float32)),
        fixed=jnp.asarray(np.arange(K) == 0),
    )
    opt = np.asarray(optimize_pose_graph(graph, n_iters=30))

    def total_err(poses):
        e = 0.0
        for k in range(K):
            d = np.asarray(se3.se3_log(jnp.asarray(
                (poses[k] @ np.linalg.inv(gt[k]))[None].astype(np.float32))))[0]
            e += np.linalg.norm(d)
        return e

    before = total_err(noisy)
    after = total_err(opt)
    assert after < 0.6 * before, (before, after)
    # the loop endpoints agree after optimization
    loop_rel = opt[K - 1] @ np.linalg.inv(opt[0])
    gt_rel = gt[K - 1] @ np.linalg.inv(gt[0])
    err = np.asarray(se3.se3_log(jnp.asarray(
        (loop_rel @ np.linalg.inv(gt_rel))[None].astype(np.float32))))[0]
    assert np.linalg.norm(err) < 0.02
