"""Multi-chip scaling of the front-end: data-parallel frame batches on a mesh.

The reference's only parallelism is 4 CPU threads + OpenMP rows + ROS pub/sub
(SURVEY.md §2.5); its natural TPU-native scaling axis is the frame stream:
dynamic-mask computation for frame pairs is embarrassingly parallel (the
temporal state — previous masks/labels — is an accuracy warm-start, not a
correctness dependency), so bulk mask precompute / multi-camera rigs /
multi-sequence evaluation shard the batch axis across chips over ICI.

``batch_frontend_step`` is the jitted, mesh-sharded "training step" analogue:
one step = flow + re-clustering + residual masking + masked ORB for B frame
pairs, sharded B/n per device. All collectives are inserted by XLA from the
sharding annotations (GSPMD); nothing here is device-count specific.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sindslam_tpu.config import SystemConfig
from sindslam_tpu.frontend.clustering import seg_by_kmeans
from sindslam_tpu.frontend.edges import cal_occluded
from sindslam_tpu.frontend.flow_mask import flow_residual_mask
from sindslam_tpu.frontend.fusion import fuse_masks
from sindslam_tpu.frontend.orb import extract_orb
from sindslam_tpu.frontend.rag_merge import rag_merge
from sindslam_tpu.ops import flow as flow_ops
from sindslam_tpu.ops import image as im


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(
            f"make_mesh({n}) requested but only {len(devs)} device(s) visible "
            f"on backend {jax.default_backend()!r}; for a virtual mesh set "
            f"JAX_PLATFORM_NAME=cpu and "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={n} before "
            f"importing jax")
    return Mesh(devs[:n], (axis,))


def _single_pair(rgb, rgb_prev, depth, key, cfg: SystemConfig):
    """Stateless per-pair front-end (no temporal warm start)."""
    gray = im.rgb_to_gray(rgb)
    gray_prev = im.rgb_to_gray(rgb_prev)
    valid = (depth > 0.05) & (depth <= cfg.dyna.max_depth_m)

    u, v = flow_ops.flow_at_working_scale(gray, gray_prev, cfg.flow)
    kml, _ = seg_by_kmeans(depth, cfg.camera, cfg.dyna, None)
    er = cal_occluded(depth, cfg.camera, cfg.dyna)
    rr = rag_merge(kml, er.occluded1, er.occluded2, er.total_area, depth, cfg.dyna)
    fm = flow_residual_mask(u, v, jnp.ones_like(gray), valid, cfg.dyna, key,
                            depth_m=depth)
    fu = fuse_masks(fm.low_mask, fm.high_mask, jnp.zeros_like(valid),
                    rr.label_img, valid, cfg.dyna)
    feats = extract_orb(gray, fu.dyna_mask, cfg.orb,
                        height=cfg.camera.height, width=cfg.camera.width)
    return fu.dyna_mask, rr.label_img, feats


def batch_temporal_frontend(mesh: Mesh, cfg: SystemConfig, donate: bool = False):
    """Mesh-sharded STATEFUL front-end (VERDICT r3 #10): each batch lane
    scans the REAL ``frontend_step`` — temporal flow-pyramid cache,
    large-motion fallback, k-means warm start, persistence state — over its
    own frame window; lanes are vmapped and sharded over the data axis.

    This is the multi-chip path that matches what ``entry()`` ships
    single-chip: bulk sequence processing / multi-camera rigs run the
    stateful pipeline per shard with XLA/GSPMD inserting the collectives.

    Returns a jitted fn: (rgbs (B, T, H, W, 3) uint8, depths (B, T, H, W)
    f32) -> (masks (B, T, H, W) i32, large_motion (B, T) bool,
    n_feats (B, T) i32), all sharded B/n per device.
    """
    from sindslam_tpu.frontend.pipeline import frontend_step, init_state

    data_sharding = NamedSharding(mesh, P("data"))

    def window(rgbs, depths):
        state = init_state(cfg, im.rgb_to_gray(rgbs[0]))

        def step(st, xs):
            rgb, d = xs
            out, st = frontend_step(rgb, d, st, cfg)
            return st, (out.dyna_mask, out.large_motion,
                        jnp.sum(out.features.valid).astype(jnp.int32))

        _, (masks, lm, nf) = jax.lax.scan(step, state, (rgbs, depths))
        return masks, lm, nf

    vmapped = jax.vmap(window)

    @functools.partial(
        jax.jit,
        in_shardings=(data_sharding, data_sharding),
        out_shardings=(data_sharding, data_sharding, data_sharding),
    )
    def run(rgbs, depths):
        return vmapped(rgbs, depths)

    return run


def batch_frontend_step(mesh: Mesh, cfg: SystemConfig):
    """Build the mesh-sharded batched step.

    Returns a jitted fn: (rgbs (B, H, W, 3), rgbs_prev, depths (B, H, W),
    keys (B, 2) uint32) -> (masks (B, H, W), labels (B, H, W), features).
    B must be divisible by the mesh's data-axis size.
    """
    data_sharding = NamedSharding(mesh, P("data"))

    vmapped = jax.vmap(_single_pair, in_axes=(0, 0, 0, 0, None))

    @functools.partial(
        jax.jit,
        static_argnames=("cfg_",),
        in_shardings=(data_sharding, data_sharding, data_sharding, data_sharding),
    )
    def step(rgbs, rgbs_prev, depths, keys, cfg_: SystemConfig = cfg):
        return vmapped(rgbs, rgbs_prev, depths, keys, cfg_)

    return step
