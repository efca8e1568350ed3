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
