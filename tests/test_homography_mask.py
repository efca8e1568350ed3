"""Tests for batched RANSAC homography and flow-residual masking."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sindslam_tpu.config import DynaConfig
from sindslam_tpu.frontend.flow_mask import flow_residual_mask, sample_weights
from sindslam_tpu.ops.homography import (
    apply_homography,
    dlt_homography,
    homography_flow,
    ransac_homography,
)


def _random_h(rng, scale=0.15):
    H = np.eye(3)
    H[:2, :2] += rng.normal(0, scale, (2, 2))
    H[:2, 2] = rng.normal(0, 20.0, 2)
    H[2, :2] = rng.normal(0, 1e-4, 2)
    return H


def _pts(rng, n=200):
    return rng.uniform(0, [640, 480], (n, 2)).astype(np.float32)


def test_dlt_exact():
    rng = np.random.default_rng(0)
    H = _random_h(rng)
    src = _pts(rng, 100)
    dst = np.asarray(apply_homography(jnp.asarray(H), jnp.asarray(src)))
    H_est = np.asarray(dlt_homography(jnp.asarray(src), jnp.asarray(dst),
                                      jnp.ones(100, jnp.float32)))
    np.testing.assert_allclose(H_est, H / H[2, 2], atol=2e-3)


def test_dlt_weights_mask_outliers():
    rng = np.random.default_rng(1)
    H = _random_h(rng)
    src = _pts(rng, 120)
    dst = np.array(apply_homography(jnp.asarray(H), jnp.asarray(src)))
    dst[:20] += rng.normal(0, 80, (20, 2))  # corrupted rows
    w = np.ones(120, np.float32)
    w[:20] = 0.0
    H_est = np.asarray(dlt_homography(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w)))
    np.testing.assert_allclose(H_est, H / H[2, 2], atol=2e-3)


def test_ransac_with_outliers():
    rng = np.random.default_rng(2)
    H = _random_h(rng)
    n = 300
    src = _pts(rng, n)
    dst = np.array(apply_homography(jnp.asarray(H), jnp.asarray(src)))
    dst += rng.normal(0, 0.3, dst.shape)  # inlier noise
    out_idx = rng.choice(n, 120, replace=False)  # 40% outliers
    dst[out_idx] += rng.uniform(15, 80, (120, 2)) * rng.choice([-1, 1], (120, 2))
    H_est, inl = ransac_homography(
        jnp.asarray(src.astype(np.float32)), jnp.asarray(dst.astype(np.float32)),
        jnp.ones(n, jnp.float32), jax.random.PRNGKey(0), thresh_px=2.0,
        n_hypotheses=256)
    proj = np.asarray(apply_homography(H_est, jnp.asarray(src.astype(np.float32))))
    inlier_set = np.setdiff1d(np.arange(n), out_idx)
    err = np.linalg.norm(proj[inlier_set] - dst[inlier_set], axis=-1)
    assert np.median(err) < 1.0
    inl = np.asarray(inl)
    assert inl[inlier_set].mean() > 0.9
    assert inl[out_idx].mean() < 0.1


def test_ransac_zero_weight_excluded():
    rng = np.random.default_rng(3)
    H = _random_h(rng)
    n = 100
    src = _pts(rng, n)
    dst = np.asarray(apply_homography(jnp.asarray(H), jnp.asarray(src))).astype(np.float32)
    w = np.ones(n, np.float32)
    w[50:] = 0.0
    _, inl = ransac_homography(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w),
                               jax.random.PRNGKey(1), n_hypotheses=128)
    assert not np.asarray(inl)[50:].any()


def test_homography_flow_identity():
    u, v = homography_flow(jnp.eye(3), 48, 64)
    assert float(jnp.abs(u).max()) == 0.0
    assert float(jnp.abs(v).max()) == 0.0


def test_homography_flow_translation():
    H = jnp.asarray(np.array([[1, 0, 3.0], [0, 1, -2.0], [0, 0, 1]], np.float32))
    u, v = homography_flow(H, 48, 64)
    np.testing.assert_allclose(np.asarray(u), 3.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(v), -2.0, atol=1e-4)


# ------------------------------------------------------------- flow masking


def _camera_plus_object_flow(h=240, w=320):
    """Synthetic flow: global homography (camera) + a moving box (object)."""
    H = np.array([[1.002, 0.001, 1.5], [-0.001, 0.999, -0.8], [0, 0, 1]], np.float32)
    u, v = homography_flow(jnp.asarray(H), h, w)
    u = np.asarray(u).copy()
    v = np.asarray(v).copy()
    box = np.zeros((h, w), bool)
    box[60:120, 100:180] = True
    u[box] += 6.0
    v[box] -= 4.0
    return u, v, box, H


def test_flow_residual_mask_finds_object():
    u, v, box, H_true = _camera_plus_object_flow()
    cfg = DynaConfig(ransac_iters=256)
    h, w = u.shape
    valid = jnp.ones((h, w), bool)
    wmap = jnp.ones((h, w), jnp.float32)
    res = flow_residual_mask(jnp.asarray(u), jnp.asarray(v), wmap, valid, cfg,
                             jax.random.PRNGKey(0))
    low = np.asarray(res.low_mask)
    assert low[box].mean() > 0.95          # the object fires
    assert low[~box].mean() < 0.05         # the background doesn't
    assert not bool(res.large_motion)
    # homography recovered despite the object
    np.testing.assert_allclose(np.asarray(res.homography), H_true / H_true[2, 2],
                               atol=5e-3)
    # thresholds respect the clamp ladder
    assert 1.7 <= float(res.low_thresh) <= 3.0
    assert float(res.high_thresh) <= 10.0
    assert float(res.high_thresh) >= max(3.0, 1.2 * float(res.low_thresh))


def test_flow_residual_mask_static_scene():
    """No independent motion: the mask must stay (nearly) empty."""
    h, w = 240, 320
    H = np.array([[1.001, 0.0, 2.0], [0.0, 1.0, 1.0], [0, 0, 1]], np.float32)
    u, v = homography_flow(jnp.asarray(H), h, w)
    rng = np.random.default_rng(4)
    u = np.asarray(u) + rng.normal(0, 0.15, (h, w)).astype(np.float32)
    v = np.asarray(v) + rng.normal(0, 0.15, (h, w)).astype(np.float32)
    cfg = DynaConfig(ransac_iters=256)
    res = flow_residual_mask(jnp.asarray(u), jnp.asarray(v),
                             jnp.ones((h, w), jnp.float32), jnp.ones((h, w), bool),
                             cfg, jax.random.PRNGKey(1))
    assert float(np.asarray(res.low_mask).mean()) < 0.02


def test_large_motion_flag():
    h, w = 120, 160
    u = jnp.full((h, w), 15.0)
    v = jnp.zeros((h, w))
    cfg = DynaConfig(ransac_iters=64)
    res = flow_residual_mask(u, v, jnp.ones((h, w), jnp.float32),
                             jnp.ones((h, w), bool), cfg, jax.random.PRNGKey(2))
    assert bool(res.large_motion)


def test_sample_weights_semantics():
    cfg = DynaConfig()
    mask = jnp.asarray(np.array([[0, 125, 255]], np.int32))
    ratio = jnp.asarray(np.array([[0.0, 0.25, 0.9]], np.float32))
    w = sample_weights(mask, ratio, cfg, jax.random.PRNGKey(0))
    # without jitter the expectation is [1.0, 1.2*0.75, 0.4]; jitter sigma=0.5,
    # so only check ordering statistically over many draws
    ws = []
    for i in range(64):
        ws.append(np.asarray(sample_weights(mask, ratio, cfg, jax.random.PRNGKey(i))))
    m = np.mean(ws, axis=0)[0]
    assert abs(m[0] - 1.0) < 0.2
    assert abs(m[1] - 0.9) < 0.2
    assert abs(m[2] - 0.4) < 0.25
    assert (np.asarray(w) > 0).all()


def test_parallax_consistency_excludes_static_keeps_mover():
    """The parallax filter (beyond-reference feature): residuals that follow
    the camera-translation * inverse-depth law are excluded from the masks;
    an independent mover whose flow violates the law stays masked."""
    import numpy as np
    from sindslam_tpu.config import DynaConfig
    from sindslam_tpu.frontend.flow_mask import flow_residual_mask

    h, w = 240, 320
    cfg = DynaConfig()
    rng = np.random.default_rng(7)
    # depth: far wall 5 m with a near box (2 m) patch
    depth = np.full((h, w), 5.0, np.float32)
    depth[60:160, 40:140] = 2.0
    inv_z = 1.0 / depth
    # residual field = lateral camera translation parallax (already
    # homography-compensated against the far wall): r = k*(invZ - 1/5)
    k = 14.0
    ru = (k * (inv_z - 0.2)).astype(np.float32)
    rv = np.zeros((h, w), np.float32)
    # an independent mover at mid-depth moving VERTICALLY (violates the law)
    depth[80:140, 200:260] = 3.0
    ru[80:140, 200:260] = 0.0
    rv[80:140, 200:260] = 4.0
    ru += rng.normal(0, 0.1, ru.shape).astype(np.float32)
    rv += rng.normal(0, 0.1, rv.shape).astype(np.float32)
    # feed the residual directly as the "flow" with an identity-homography
    # inducing field: H fit on weighted samples will be ~identity since the
    # dominant surface (wall) has near-zero residual
    u = jnp.asarray(ru)
    v = jnp.asarray(rv)
    valid = jnp.ones((h, w), bool)
    res = flow_residual_mask(u, v, jnp.ones((h, w), jnp.float32), valid,
                             cfg, jax.random.PRNGKey(0),
                             depth_m=jnp.asarray(depth))
    low = np.asarray(res.low_mask)
    # the near box (pure parallax, ~2.1 px residual) is NOT masked
    box = np.zeros((h, w), bool)
    box[65:155, 45:135] = True
    assert low[box].mean() < 0.05, low[box].mean()
    # the mover IS masked
    mover = np.zeros((h, w), bool)
    mover[85:135, 205:255] = True
    assert low[mover].mean() > 0.8, low[mover].mean()
