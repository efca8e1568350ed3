"""Depth-guided pyramid k-means re-clustering.

Re-implements ``SegByKmeans`` (reference ``ORB_SLAM2/src/DynaDetect.cc:
315-420``) TPU-first: the per-pixel feature is the back-projected point
``(x, y, depth_weight * z)`` (depth_weight = 1.5, ``:48``); clustering runs
coarse-to-fine over a 4-level half-scale pyramid with labels upsampled as the
warm start for the next level, and the frame's final labels warm-start the
next frame (``:371-395``). Invalid pixels (depth 0 or > 6 m, ``:353-359``)
are excluded from the assignment and carry label -1.

The assignment step is one MXU matmul per iteration (||p - c||^2 expansion);
the update step is a segment-sum. Everything is static shape; K = 12.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from sindslam_tpu.config import CameraConfig, DynaConfig
from sindslam_tpu.ops import image as im


def backproject_features(depth_m: jnp.ndarray, cam: CameraConfig,
                         cfg: DynaConfig) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(H, W) depth -> ((H, W, 3) features, (H, W) valid bool)."""
    h, w = depth_m.shape
    vs = jnp.arange(h, dtype=jnp.float32)[:, None]
    us = jnp.arange(w, dtype=jnp.float32)[None, :]
    valid = (depth_m > 0.05) & (depth_m <= cfg.max_depth_m)
    z = jnp.where(valid, depth_m, 0.0)
    x = (us - cam.cx) / cam.fx * z
    y = (vs - cam.cy) / cam.fy * z
    feats = jnp.stack([x, y, cfg.depth_weight * z], axis=-1)
    return feats, valid


def grid_init_centers(feats: jnp.ndarray, valid: jnp.ndarray,
                      cfg: DynaConfig) -> jnp.ndarray:
    """First-frame initialization: means of a rows x cols spatial grid
    (reference 3x4 grid, ``DynaDetect.cc:46``). Returns (K, 3)."""
    h, w = valid.shape
    R, C = cfg.cluster_grid_rows, cfg.cluster_grid_cols
    rh, cw = h // R, w // C
    centers = []
    for r in range(R):
        for c in range(C):
            f = feats[r * rh:(r + 1) * rh, c * cw:(c + 1) * cw]
            v = valid[r * rh:(r + 1) * rh, c * cw:(c + 1) * cw].astype(jnp.float32)
            centers.append(jnp.sum(f * v[..., None], axis=(0, 1)) /
                           (jnp.sum(v) + 1e-6))
    return jnp.stack(centers)


def _kmeans_level(feats: jnp.ndarray, valid: jnp.ndarray, centers: jnp.ndarray,
                  n_iters: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run k-means at one level. feats (H, W, 3) -> labels (H, W) int32 in
    [0, K) (valid) / -1 (invalid), updated centers (K, 3)."""
    h, w, _ = feats.shape
    K = centers.shape[0]
    P = feats.reshape(-1, 3)
    V = valid.reshape(-1).astype(jnp.float32)

    def step(centers, _):
        # squared distances via the MXU: |p|^2 - 2 p.c + |c|^2
        d = (jnp.sum(P * P, axis=-1, keepdims=True)
             - 2.0 * jnp.matmul(P, centers.T, precision=jax.lax.Precision.HIGHEST)
             + jnp.sum(centers * centers, axis=-1)[None, :])
        lab = jnp.argmin(d, axis=-1)
        # update via one-hot matmul (MXU) — scatter/segment_sum serializes on TPU
        onehot = (lab[:, None] == jnp.arange(K)[None, :]).astype(jnp.float32) * V[:, None]
        sums = jnp.matmul(onehot.T, P, precision=jax.lax.Precision.HIGHEST)
        counts = jnp.sum(onehot, axis=0)
        new_centers = jnp.where(counts[:, None] > 0.5,
                                sums / jnp.maximum(counts[:, None], 1e-6),
                                centers)
        return new_centers, lab

    centers, labs = jax.lax.scan(step, centers, None, length=n_iters)
    labels = jnp.where(valid, labs[-1].reshape(h, w), -1).astype(jnp.int32)
    return labels, centers


@functools.partial(jax.jit, static_argnames=("cam", "cfg"))
def seg_by_kmeans(
    depth_m: jnp.ndarray,
    cam: CameraConfig,
    cfg: DynaConfig,
    prev_labels: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pyramid k-means segmentation of a depth frame.

    prev_labels: (H, W) int32 labels of the previous frame for the warm start
    (pass None on the first frame -> spatial grid init).

    Returns ((H, W) int32 labels in [0, K) or -1, (K, 3) centers).
    """
    feats_full, valid_full = backproject_features(depth_m, cam, cfg)
    K = cfg.n_clusters
    L = cfg.kmeans_pyramid_levels
    s = cfg.kmeans_pyramid_scale
    h, w = depth_m.shape

    # coarse-to-fine level shapes (static)
    shapes = [(int(round(h * s ** l)), int(round(w * s ** l)))
              for l in range(L - 1, -1, -1)]          # coarsest first

    # initial centers: warm start from previous labels, else grid init
    if prev_labels is None:
        centers = grid_init_centers(feats_full, valid_full, cfg)
    else:
        V = (valid_full & (prev_labels >= 0)).reshape(-1).astype(jnp.float32)
        lab = jnp.maximum(prev_labels.reshape(-1), 0)
        P = feats_full.reshape(-1, 3)
        onehot = (lab[:, None] == jnp.arange(K)[None, :]).astype(jnp.float32) * V[:, None]
        sums = jnp.matmul(onehot.T, P, precision=jax.lax.Precision.HIGHEST)
        cnts = jnp.sum(onehot, axis=0)
        grid = grid_init_centers(feats_full, valid_full, cfg)
        centers = jnp.where(cnts[:, None] > 10.0,
                            sums / jnp.maximum(cnts[:, None], 1e-6), grid)

    labels = None
    for (lh, lw) in shapes:
        if (lh, lw) == (h, w):
            f, v = feats_full, valid_full
        else:
            # area-downsample depth (median-ish robustness is unnecessary:
            # invalid zeros are excluded via the valid mask resample)
            d = im.resize_bilinear(depth_m, (lh, lw))
            vres = im.resize_bilinear(valid_full.astype(jnp.float32), (lh, lw)) > 0.7
            vs = jnp.arange(lh, dtype=jnp.float32)[:, None] * (h / lh)
            us = jnp.arange(lw, dtype=jnp.float32)[None, :] * (w / lw)
            z = jnp.where(vres, d, 0.0)
            x = (us - cam.cx) / cam.fx * z
            y = (vs - cam.cy) / cam.fy * z
            f = jnp.stack([x, y, cfg.depth_weight * z], axis=-1)
            v = vres & (z > 0.05) & (z <= cfg.max_depth_m)
        labels, centers = _kmeans_level(f, v, centers, cfg.kmeans_iters)

    return labels, centers
