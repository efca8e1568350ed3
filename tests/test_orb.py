"""Tests for the ORB front-end: FAST corners, orientation, descriptors,
mask erasure, Hamming matching."""

import cv2
import numpy as np
import pytest

import jax.numpy as jnp

from sindslam_tpu.config import ORBConfig
from sindslam_tpu.frontend import orb
from sindslam_tpu.ops import image as im


@pytest.fixture(scope="module")
def scene_gray(synthetic_frames):
    rgb = synthetic_frames[0][0]
    return np.asarray(im.rgb_to_gray(jnp.asarray(rgb)))


CFG = ORBConfig(n_features=500, n_levels=4)


def test_fast_matches_opencv_corners():
    """Our FAST detections should substantially agree with cv2.FAST."""
    rng = np.random.default_rng(0)
    img = (rng.uniform(0, 255, (120, 160))).astype(np.float32)
    img = cv2.GaussianBlur(img, (5, 5), 1.0)
    score = np.asarray(orb.fast_score_map(jnp.asarray(img), 15.0))
    ours = set(map(tuple, np.argwhere(score > 0)))

    det = cv2.FastFeatureDetector_create(threshold=15, nonmaxSuppression=False)
    kps = det.detect(img.astype(np.uint8), None)
    ref = set((int(round(k.pt[1])), int(round(k.pt[0]))) for k in kps)
    # interior only (border handling differs)
    ours = {p for p in ours if 5 <= p[0] < 115 and 5 <= p[1] < 155}
    ref = {p for p in ref if 5 <= p[0] < 115 and 5 <= p[1] < 155}
    if len(ref) == 0:
        pytest.skip("no reference corners")
    inter = len(ours & ref)
    # uint8 rounding makes exact agreement impossible; demand strong overlap
    assert inter / max(len(ref), 1) > 0.8
    assert inter / max(len(ours), 1) > 0.6


def test_fast_score_threshold_semantics():
    img = np.full((32, 32), 100.0, np.float32)
    img[16, 16] = 160.0  # bright dot: every ring pixel is 60 darker
    score = np.asarray(orb.fast_score_map(jnp.asarray(img), 20.0))
    assert score[16, 16] == pytest.approx(60.0)
    assert (score > 0).sum() == 1


def test_level_quotas():
    q = orb.level_quotas(1000, 8, 1.2)
    assert sum(q) == 1000
    assert all(q[i] >= q[i + 1] for i in range(6))  # geometric decay


def test_extract_on_synthetic(scene_gray):
    feats = orb.extract_orb(jnp.asarray(scene_gray), jnp.zeros_like(
        jnp.asarray(scene_gray), dtype=jnp.int32), CFG)
    valid = np.asarray(feats.valid)
    assert valid.sum() > 300                       # textured scene: plenty
    xy = np.asarray(feats.xy)[valid]
    assert xy[:, 0].min() >= 0 and xy[:, 0].max() < 640
    assert xy[:, 1].min() >= 0 and xy[:, 1].max() < 480
    # features spread over the image, not clumped in one corner
    assert xy[:, 0].std() > 80 and xy[:, 1].std() > 60
    # multiple levels populated
    assert len(np.unique(np.asarray(feats.level)[valid])) >= 3


def test_mask_erasure_and_revert(scene_gray):
    g = jnp.asarray(scene_gray)
    zero_mask = jnp.zeros((480, 640), jnp.int32)
    feats0 = orb.extract_orb(g, zero_mask, CFG)

    # mask the left half dynamic: features there must vanish (use a lower
    # revert floor so the rule doesn't trigger on the ~250 survivors)
    half = np.zeros((480, 640), np.int32)
    half[:, :320] = 255
    cfg_low = ORBConfig(n_features=500, n_levels=4, min_keypoints_after_mask=50)
    feats1 = orb.extract_orb(g, jnp.asarray(half), cfg_low)
    v1 = np.asarray(feats1.valid)
    xy1 = np.asarray(feats1.xy)
    assert (xy1[v1][:, 0] >= 320).all()
    assert v1.sum() < np.asarray(feats0.valid).sum()

    # mask everything: the revert rule must kick in (else tracking dies)
    all_dyn = jnp.full((480, 640), 255, jnp.int32)
    feats2 = orb.extract_orb(g, all_dyn, CFG)
    assert np.asarray(feats2.valid).sum() >= 250


def test_descriptor_rotation_tolerance(scene_gray):
    """Descriptors of the same keypoints should match under small rotation."""
    g = np.asarray(scene_gray)
    h, w = g.shape
    M = cv2.getRotationMatrix2D((w / 2, h / 2), 8.0, 1.0)  # 8 degrees
    g_rot = cv2.warpAffine(g, M, (w, h), borderMode=cv2.BORDER_REPLICATE)

    zero = jnp.zeros((480, 640), jnp.int32)
    fa = orb.extract_orb(jnp.asarray(g), zero, CFG)
    fb = orb.extract_orb(jnp.asarray(g_rot), zero, CFG)
    va, vb = np.asarray(fa.valid), np.asarray(fb.valid)
    xa = np.asarray(fa.xy)[va]
    da = np.asarray(fa.desc)[va]
    xb = np.asarray(fb.xy)[vb]
    db = np.asarray(fb.desc)[vb]

    # ground-truth correspondence: rotate keypoints of A into B's frame
    xa_h = np.concatenate([xa, np.ones((len(xa), 1))], axis=1)
    xa_in_b = xa_h @ M.T
    D = np.asarray(orb.hamming_distance_matrix(jnp.asarray(da), jnp.asarray(db)))
    matched = 0
    good = 0
    for i in range(len(xa)):
        d_geo = np.linalg.norm(xb - xa_in_b[i], axis=1)
        near = d_geo < 3.0
        if not near.any():
            continue
        matched += 1
        j = np.argmin(np.where(near, D[i], 1e9))
        if D[i, j] < 80:
            good += 1
    assert matched > 50
    assert good / matched > 0.6


def test_hamming_distance_matrix():
    rng = np.random.default_rng(5)
    a = rng.integers(0, 2 ** 32, (16, 8), dtype=np.uint32)
    b = a.copy()
    b[0, 0] ^= 0b1011  # 3 bit flips
    D = np.asarray(orb.hamming_distance_matrix(jnp.asarray(a), jnp.asarray(b)))
    assert D[0, 0] == 3
    assert D[1, 1] == 0
    # symmetry against brute-force popcount
    for i in range(4):
        for j in range(4):
            expect = bin(int(a[i, 0]) ^ int(b[j, 0])).count("1") + sum(
                bin(int(a[i, k]) ^ int(b[j, k])).count("1") for k in range(1, 8))
            assert D[i, j] == expect


def test_descriptors_distinct(scene_gray):
    """Different keypoints should have distant descriptors (no collapse)."""
    feats = orb.extract_orb(jnp.asarray(scene_gray),
                            jnp.zeros((480, 640), jnp.int32), CFG)
    v = np.asarray(feats.valid)
    d = np.asarray(feats.desc)[v][:200]
    D = np.asarray(orb.hamming_distance_matrix(jnp.asarray(d), jnp.asarray(d)))
    off_diag = D[~np.eye(len(D), dtype=bool)]
    assert off_diag.mean() > 60  # random-ish separation (~128 expected)
