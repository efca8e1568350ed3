"""Feature matching as batched masked Hamming-distance reductions.

Replaces the reference's loop-based guided search (``ORB_SLAM2/src/
ORBmatcher.cc``: SearchByProjection frame<->frame / frame<->map) with dense
(M, N) distance matrices gated by spatial windows — one fused XLA computation
per matching call, static shapes everywhere.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from sindslam_tpu.frontend.orb import hamming_distance_matrix

_BIG = jnp.int32(1 << 20)


class Matches(NamedTuple):
    idx: jnp.ndarray    # (M,) int32 index into the target feature set (or -1)
    dist: jnp.ndarray   # (M,) int32 Hamming distance of the match
    valid: jnp.ndarray  # (M,) bool


def match_by_projection(
    proj_uv: jnp.ndarray,      # (M, 2) predicted pixels of source points
    proj_valid: jnp.ndarray,   # (M,) bool projection validity
    src_desc: jnp.ndarray,     # (M, 8) uint32 source descriptors
    src_level: jnp.ndarray,    # (M,) int32 source pyramid level
    tgt_xy: jnp.ndarray,       # (N, 2) target keypoint pixels
    tgt_desc: jnp.ndarray,     # (N, 8) target descriptors
    tgt_level: jnp.ndarray,    # (N,) target levels
    tgt_valid: jnp.ndarray,    # (N,) bool
    radius: float,
    max_dist: int,
    level_tolerance: int = 1,
    scale_factor: float = 1.2,
) -> Matches:
    """Guided search: for each projected source point, the best target keypoint
    within ``radius * scale^level`` pixels and ``level_tolerance`` levels.

    Mirrors SearchByProjection semantics (window scaled by octave, Hamming
    gate). Mutual-best filtering removes double assignments of one target
    keypoint to several source points (the reference handles this by marking
    matched keypoints; here it is a vectorized argmax-consistency check).
    """
    d2 = jnp.sum((proj_uv[:, None, :] - tgt_xy[None, :, :]) ** 2, axis=-1)
    win = radius * scale_factor ** src_level.astype(jnp.float32)
    spatial_ok = d2 <= (win[:, None] ** 2)
    level_ok = jnp.abs(src_level[:, None] - tgt_level[None, :]) <= level_tolerance
    gate = spatial_ok & level_ok & proj_valid[:, None] & tgt_valid[None, :]

    D = hamming_distance_matrix(src_desc, tgt_desc)
    D = jnp.where(gate, D, _BIG)

    best = jnp.argmin(D, axis=1)                       # (M,)
    best_d = jnp.take_along_axis(D, best[:, None], axis=1)[:, 0]
    ok = best_d <= max_dist

    # one target keypoint serves at most one source: keep the lowest-distance
    # claimant per target via a segment-min race
    claim = jnp.where(ok, best, D.shape[1])            # invalid -> sentinel seg
    order_key = best_d * D.shape[0] + jnp.arange(best.shape[0])  # tie-break by index
    winner = jax.ops.segment_min(order_key, claim, num_segments=D.shape[1] + 1)
    iam_winner = winner[claim] == order_key
    ok = ok & iam_winner

    return Matches(idx=jnp.where(ok, best, -1), dist=best_d, valid=ok)


def filter_rotation_consistency(
    m: Matches,
    src_angle: jnp.ndarray,   # (M,) float32 radians
    tgt_angle: jnp.ndarray,   # (N,) float32 radians
    n_bins: int = 30,
    top_k: int = 3,
) -> Matches:
    """Rotation-histogram consistency check (ref ``ORBmatcher.cc:45-140``).

    The relative orientation src-tgt of correct matches under camera motion
    concentrates in a few bins; matches outside the ``top_k`` most-populated
    30-bin orientations are rejected (a dominant outlier filter in dynamic
    scenes). Secondary bins under 10% of the max bin are also dropped, like
    the reference's ``ComputeThreeMaxima``.
    """
    tgt = jnp.maximum(m.idx, 0)
    two_pi = 2.0 * jnp.pi
    rot = jnp.mod(src_angle - tgt_angle[tgt], two_pi)
    b = jnp.clip((rot / two_pi * n_bins).astype(jnp.int32), 0, n_bins - 1)
    onehot = (b[:, None] == jnp.arange(n_bins)[None, :]) & m.valid[:, None]
    hist = jnp.sum(onehot, axis=0)
    hist_desc = -jnp.sort(-hist)
    kth = hist_desc[top_k - 1]
    max1 = hist_desc[0]
    keep_bin = (hist >= jnp.maximum(kth, 1)) & \
               (hist.astype(jnp.float32) >= 0.1 * max1.astype(jnp.float32))
    ok = m.valid & keep_bin[b]
    return Matches(idx=jnp.where(ok, m.idx, -1), dist=m.dist, valid=ok)


def match_mutual_nn(
    desc_a: jnp.ndarray, valid_a: jnp.ndarray,
    desc_b: jnp.ndarray, valid_b: jnp.ndarray,
    max_dist: int, nn_ratio: float = 0.9,
) -> Matches:
    """Unconstrained mutual nearest-neighbor matching with Lowe ratio test —
    the initialization/relocalization matcher (SearchByBoW-class role)."""
    D = hamming_distance_matrix(desc_a, desc_b)
    D = jnp.where(valid_a[:, None] & valid_b[None, :], D, _BIG)
    best = jnp.argmin(D, axis=1)
    best_d = jnp.take_along_axis(D, best[:, None], axis=1)[:, 0]
    # second best for the ratio test
    D2 = D.at[jnp.arange(D.shape[0]), best].set(_BIG)
    second_d = jnp.min(D2, axis=1)
    back = jnp.argmin(D, axis=0)
    mutual = back[best] == jnp.arange(D.shape[0])
    ok = (best_d <= max_dist) & mutual & \
         (best_d.astype(jnp.float32) <= nn_ratio * second_d.astype(jnp.float32))
    return Matches(idx=jnp.where(ok, best, -1), dist=best_d, valid=ok)
