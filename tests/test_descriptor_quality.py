"""Descriptor-quality evidence for the procedural BRIEF pattern.

The rebuild replaces OpenCV's canonical 256-pair BRIEF pattern with a
fixed-seed procedural pattern (``frontend/orb.py:14-21``, deviation from
reference ``ORBextractor.cc:1034``). These tests quantify that choice:
matching repeatability and inlier ratio under viewpoint-like warps
(rotation / scale / translation) must clear explicit floors, giving the
standing justification numbers instead of assertions by fiat.

Protocol: render a textured synthetic view, apply a known affine warp to the
image, extract ORB on both, mutual-NN match descriptors, and check matches
against the ground-truth correspondence x' = A x.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from sindslam_tpu.config import ORBConfig
from sindslam_tpu.datasets.synthetic import make_default_scene
from sindslam_tpu.frontend.orb import extract_orb, hamming_distance_matrix
from sindslam_tpu.ops import image as im

H, W = 480, 640
OCFG = ORBConfig(n_features=600)


@pytest.fixture(scope="module")
def base_gray():
    scene = make_default_scene(seed=3, with_dynamic=False)
    pose = np.eye(4)
    rgb, _depth, _ = scene.render(pose)
    g = np.asarray(im.rgb_to_gray(jnp.asarray(rgb))).astype(np.float32)
    return g


def _affine(angle_deg: float, scale: float, tx: float, ty: float) -> np.ndarray:
    """2x3 affine about the image center."""
    a = np.deg2rad(angle_deg)
    c, s = np.cos(a) * scale, np.sin(a) * scale
    cx, cy = W / 2.0, H / 2.0
    A = np.array([[c, -s, cx - c * cx + s * cy + tx],
                  [s, c, cy - s * cx - c * cy + ty]])
    return A


def _warp_image(gray: np.ndarray, A: np.ndarray) -> np.ndarray:
    """Inverse-map affine warp (bilinear) of the image."""
    Ainv = np.linalg.inv(np.vstack([A, [0, 0, 1]]))[:2]
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float64)
    sx = Ainv[0, 0] * xs + Ainv[0, 1] * ys + Ainv[0, 2]
    sy = Ainv[1, 0] * xs + Ainv[1, 1] * ys + Ainv[1, 2]
    out, _ = im.warp_bilinear(jnp.asarray(gray), jnp.asarray(sy, jnp.float32),
                              jnp.asarray(sx, jnp.float32))
    return np.asarray(out)


def _extract(gray: np.ndarray):
    zero = jnp.zeros((H, W), jnp.int32)
    f = extract_orb(jnp.asarray(gray), zero, OCFG, height=H, width=W)
    xy = np.asarray(f.xy)
    desc = np.asarray(f.desc)
    valid = np.asarray(f.valid)
    return xy[valid], desc[valid]


def _mutual_nn(desc_a: np.ndarray, desc_b: np.ndarray):
    d = np.asarray(hamming_distance_matrix(jnp.asarray(desc_a),
                                           jnp.asarray(desc_b)))
    ab = d.argmin(axis=1)
    ba = d.argmin(axis=0)
    ia = np.arange(len(ab))
    mutual = ba[ab] == ia
    return ia[mutual], ab[mutual], d[ia[mutual], ab[mutual]]


def _match_stats(gray: np.ndarray, angle: float, scale: float,
                 tx: float = 0.0, ty: float = 0.0):
    A = _affine(angle, scale, tx, ty)
    warped = _warp_image(gray, A)
    xy0, d0 = _extract(gray)
    xy1, d1 = _extract(warped)
    ia, ib, _hd = _mutual_nn(d0, d1)
    # ground-truth correspondence of the matched source points
    gt = (A[:, :2] @ xy0[ia].T).T + A[:, 2]
    err = np.linalg.norm(gt - xy1[ib], axis=1)
    inlier_ratio = float((err < 3.0).mean()) if len(err) else 0.0
    # repeatability: source keypoints (mapped inside the frame) that have ANY
    # detected keypoint within 3 px in the warped view
    gt_all = (A[:, :2] @ xy0.T).T + A[:, 2]
    inside = ((gt_all[:, 0] > 24) & (gt_all[:, 0] < W - 24)
              & (gt_all[:, 1] > 24) & (gt_all[:, 1] < H - 24))
    if inside.sum() == 0:
        rep = 0.0
    else:
        dists = np.linalg.norm(gt_all[inside, None, :] - xy1[None, :, :],
                               axis=-1)
        rep = float((dists.min(axis=1) < 3.0).mean())
    return {"n_matches": int(len(ia)), "inlier_ratio": inlier_ratio,
            "repeatability": rep}


def test_identity_matching_sanity(base_gray):
    st = _match_stats(base_gray, 0.0, 1.0)
    assert st["n_matches"] > 200
    assert st["inlier_ratio"] > 0.95
    assert st["repeatability"] > 0.8


def test_rotation_robustness(base_gray):
    """Rotated BRIEF must survive in-plane rotation (the reference's
    steering, ORBextractor.cc:472): 20 deg rotation keeps a solid
    inlier ratio."""
    st = _match_stats(base_gray, 20.0, 1.0)
    assert st["n_matches"] > 120, st
    assert st["inlier_ratio"] > 0.6, st


def test_scale_robustness(base_gray):
    """1.15x scale change stays matchable through the pyramid."""
    st = _match_stats(base_gray, 0.0, 1.15)
    assert st["n_matches"] > 120, st
    assert st["inlier_ratio"] > 0.6, st


def test_combined_viewpoint_change(base_gray):
    """Rotation + scale + shift: the hard case; floors are the standing
    justification for the procedural pattern replacing the canonical one."""
    st = _match_stats(base_gray, 12.0, 1.1, tx=8.0, ty=-6.0)
    assert st["n_matches"] > 100, st
    assert st["inlier_ratio"] > 0.55, st
    assert st["repeatability"] > 0.4, st


def test_mm_brief_parity_with_gather_path(base_gray):
    """ADVICE r2 #1: the TPU matmul BRIEF (_brief_descriptors_mm) was never
    exercised by tests — the quality floors above certify only the CPU
    gather path. This runs BOTH paths on the same blurred image/keypoints
    (the mm path is pure JAX and runs fine on CPU) and bounds their
    disagreement: the 64-bin angle quantization and bf16 patch matmuls may
    flip a few bits, but descriptors must stay matchably close."""
    from sindslam_tpu.frontend.orb import (_brief_descriptors_gather,
                                           _brief_descriptors_mm)

    g = jnp.asarray(base_gray)
    g_blur = im.gaussian_blur(g, 7, 2.0)
    rng = np.random.default_rng(0)
    n = 256
    yx = jnp.asarray(np.stack([
        rng.uniform(20, H - 20, n), rng.uniform(20, W - 20, n)], -1
    ).round().astype(np.int32))
    angle = jnp.asarray(rng.uniform(-np.pi, np.pi, n).astype(np.float32))

    d_gather = np.asarray(_brief_descriptors_gather(g_blur, yx, angle))
    d_mm = np.asarray(_brief_descriptors_mm(g_blur, yx, angle))

    xor = (d_gather ^ d_mm).view(np.uint8)
    ham = np.unpackbits(xor.reshape(n, -1), axis=1).sum(axis=1)
    # quantization noise bound: mean well under the matching thresholds
    # (hamming_th_low = 50); self-consistency is what matters for matching
    assert ham.mean() < 20.0, f"mean mm-vs-gather Hamming {ham.mean():.1f}"
    assert np.median(ham) < 16.0, f"median {np.median(ham)}"


def test_mm_brief_matching_quality(base_gray):
    """One descriptor-quality floor re-run ENTIRELY through the mm path:
    identity pair, mutual-NN self-matching must be near-perfect (the mm
    descriptors must be self-consistent, which is what the TPU actually
    matches with)."""
    from sindslam_tpu.frontend.orb import _brief_descriptors_mm

    g = jnp.asarray(base_gray)
    g_blur = im.gaussian_blur(g, 7, 2.0)
    rng = np.random.default_rng(1)
    n = 300
    yx = np.stack([rng.uniform(20, H - 20, n),
                   rng.uniform(20, W - 20, n)], -1).round().astype(np.int32)
    angle = rng.uniform(-np.pi, np.pi, n).astype(np.float32)
    d1 = _brief_descriptors_mm(g_blur, jnp.asarray(yx), jnp.asarray(angle))
    # second view: same keypoints, slightly perturbed angles (pose jitter)
    d2 = _brief_descriptors_mm(g_blur, jnp.asarray(yx),
                               jnp.asarray(angle + rng.normal(0, 0.02, n)
                                           .astype(np.float32)))
    D = np.asarray(hamming_distance_matrix(d1, d2))
    nn = D.argmin(axis=1)
    acc = float((nn == np.arange(n)).mean())
    assert acc > 0.9, f"mm-path self-matching accuracy {acc:.2f}"
