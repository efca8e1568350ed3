"""8-way GSPMD data-parallel front-end (parallel/batch_frontend.py).

Validates the multi-chip scaling path on the virtual 8-device CPU mesh the
conftest builds: output shardings are really 8-way, and the sharded batched
step matches the unsharded vmap numerically (GSPMD must not change results).

Reference parity anchor: SURVEY.md §2.5 / §5 — the reference's only
parallelism is threads+OpenMP+ROS; the TPU-native scaling axis is the frame
batch over ICI.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sindslam_tpu.config import (CameraConfig, DynaConfig, FlowConfig,
                                 ORBConfig, SystemConfig)
from sindslam_tpu.parallel.batch_frontend import (_single_pair,
                                                  batch_frontend_step,
                                                  make_mesh)

H, W = 64, 128


def _tiny_config():
    return SystemConfig(
        camera=CameraConfig(fx=60.0, fy=60.0, cx=W / 2 - 0.5, cy=H / 2 - 0.5,
                            width=W, height=H),
        flow=FlowConfig(n_levels=3, outer_iterations=2, inner_iterations=2,
                        solver_iterations=3, working_height=32,
                        working_width=64),
        orb=ORBConfig(n_features=64, n_levels=2, min_keypoints_after_mask=8),
        dyna=DynaConfig(ransac_iters=32, sample_grid_step=8,
                        plane_min_support=200),
    )


def _batch(B, rng):
    rgbs = jnp.asarray(rng.integers(0, 255, (B, H, W, 3), dtype=np.uint8))
    rgbs_prev = jnp.asarray(rng.integers(0, 255, (B, H, W, 3), dtype=np.uint8))
    depths = jnp.asarray(rng.uniform(1.0, 4.0, (B, H, W)).astype(np.float32))
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(B, dtype=jnp.uint32))
    return rgbs, rgbs_prev, depths, keys


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


def test_make_mesh_errors_when_too_few_devices():
    with pytest.raises(ValueError, match="only .* device"):
        make_mesh(len(jax.devices()) + 1)


def test_batch_frontend_8way_sharded_outputs(mesh):
    cfg = _tiny_config()
    B = 16  # two frame pairs per device
    rgbs, rgbs_prev, depths, keys = _batch(B, np.random.default_rng(0))

    step = batch_frontend_step(mesh, cfg)
    with mesh:
        masks, labels, feats = step(rgbs, rgbs_prev, depths, keys)
    jax.block_until_ready(masks)

    assert masks.shape == (B, H, W)
    assert labels.shape == (B, H, W)
    # Every output must really be split 8 ways over the data axis.
    for out in (masks, labels, feats.xy):
        shard_devices = {s.device.id for s in out.addressable_shards}
        assert len(shard_devices) == 8, (out.shape, shard_devices)
        per_shard = [s.data.shape[0] for s in out.addressable_shards]
        assert all(p == B // 8 for p in per_shard), per_shard


@pytest.mark.slow
def test_batch_mask_precompute_realistic_shapes(mesh):
    """VERDICT r2 #9 done-criterion: the GSPMD path at REALISTIC shapes, not
    64x128 toys — 8 distinct synthetic sequences at 320x240 (scale 0.5 of
    the production camera), one frame pair per sequence sharded across the
    8-device mesh, checked against serial per-pair execution.

    Shapes: rgbs (8, 240, 320, 3) uint8, depths (8, 240, 320) f32; flow
    working canvas 192x144; full production stage stack (flow, k-means,
    edges, RAG merge, residual mask, fusion, masked ORB)."""
    from sindslam_tpu.datasets.synthetic import make_benchmark_sequence
    from sindslam_tpu.evaluation.benchmark import scaled_system_config

    cfg = scaled_system_config(0.5, n_features=500)
    H2, W2 = cfg.camera.height, cfg.camera.width
    assert (H2, W2) == (240, 320)

    names = ["dyn_walk", "fast_cam", "multi_mover", "occlusion_cross",
             "static", "dyn_walk", "multi_mover", "static"]
    rgbs, rgbs_prev, depths = [], [], []
    for i, name in enumerate(names):
        frames, _sc = make_benchmark_sequence(name, n_frames=3, seed=i,
                                              scale=0.5)
        rgbs_prev.append(frames[1][0])
        rgbs.append(frames[2][0])
        depths.append(frames[2][1])
    rgbs = jnp.asarray(np.stack(rgbs))
    rgbs_prev = jnp.asarray(np.stack(rgbs_prev))
    depths = jnp.asarray(np.stack(depths))
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(8, dtype=jnp.uint32))

    step = batch_frontend_step(mesh, cfg)
    with mesh:
        masks, labels, feats = step(rgbs, rgbs_prev, depths, keys)
    jax.block_until_ready(masks)

    assert masks.shape == (8, H2, W2)
    for out in (masks, labels):
        shard_devices = {s.device.id for s in out.addressable_shards}
        assert len(shard_devices) == 8
    # serial spot checks: sharded batch == per-pair serial execution
    for b in (0, 3, 7):
        m_u, l_u, f_u = jax.jit(_single_pair, static_argnums=(4,))(
            rgbs[b], rgbs_prev[b], depths[b], keys[b], cfg)
        np.testing.assert_array_equal(np.asarray(masks[b]), np.asarray(m_u))
        np.testing.assert_array_equal(np.asarray(labels[b]), np.asarray(l_u))
    # the dynamic sequences must actually detect something at this scale
    dyn_px = np.asarray(masks[0] == cfg.dyna.mask_dynamic).sum()
    assert dyn_px > 100, "no dynamic pixels detected in dyn_walk at 320x240"


def test_batch_frontend_matches_unsharded_vmap(mesh):
    cfg = _tiny_config()
    B = 8
    rgbs, rgbs_prev, depths, keys = _batch(B, np.random.default_rng(1))

    step = batch_frontend_step(mesh, cfg)
    with mesh:
        masks_s, labels_s, feats_s = step(rgbs, rgbs_prev, depths, keys)

    vmapped = jax.jit(jax.vmap(_single_pair, in_axes=(0, 0, 0, 0, None)),
                      static_argnums=(4,))
    masks_u, labels_u, feats_u = vmapped(rgbs, rgbs_prev, depths, keys, cfg)

    np.testing.assert_array_equal(np.asarray(masks_s), np.asarray(masks_u))
    np.testing.assert_array_equal(np.asarray(labels_s), np.asarray(labels_u))
    np.testing.assert_allclose(np.asarray(feats_s.xy), np.asarray(feats_u.xy),
                               rtol=1e-5, atol=1e-5)
