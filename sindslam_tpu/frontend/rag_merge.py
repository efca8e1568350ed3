"""Region-adjacency-graph cluster merging (SegAndMergeV2 equivalent).

Re-implements the reference's geometric re-clustering
(``ORB_SLAM2/src/DynaDetect.cc:653-1018``) with static shapes:

- k-means clusters minus edges are split into connected components
  (label-aware min-label propagation instead of ``cv::findContours``),
  small components dropped (area > min_cluster_area, ``:664-729``);
- the K largest components become RAG nodes with area, 3-D center, and a
  16-bin depth histogram;
- pairwise features are dense K x K matrices computed by masked matmuls over
  the one-hot masks: dilated-overlap adjacency (``:832``), depth-histogram
  similarity (correlation + Bhattacharyya coefficient, ``cal_hist``
  ``:1685-1739``, reject < 0.19 ``:853``), shared-boundary edge composition
  (common-plane-edge rejection ``:847-852`` / fake-edge forced merge
  ``:860-884``), small-cluster x2.0 / near-cluster x0.7 weights (``:813-823``);
- a fixed-iteration greedy merge (union-find parents inside a lax loop)
  merges best pairs while score > 0.9 down to ~n_clusters labels
  (``:936-994``), then every valid pixel is relabeled 1..N with 0 invalid
  (``:996-1016``), edge/leftover pixels joining by geodesic label growth.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from sindslam_tpu.config import DynaConfig
from sindslam_tpu.ops import image as im

_HI = jax.lax.Precision.HIGHEST
_K_MAX = 32           # RAG node capacity (components before merging)
_HIST_BINS = 16
_MERGE_STEPS = 16     # fixed greedy-merge iterations
_DILATE_ADJ_H = 5     # adjacency-overlap dilation window at HALF res
#                       (radius 2 = ~4 full-res px; the r2 full-res value
#                       was 7, radius 3)


class RagResult(NamedTuple):
    label_img: jnp.ndarray      # (H, W) int32: 1..N cluster ids, 0 = invalid
    n_clusters: jnp.ndarray     # scalar int32
    areas: jnp.ndarray          # (_K_MAX,) float32 per final cluster (root slots)
    centers: jnp.ndarray        # (_K_MAX, 3) mean (x, y, z)


def components_from_labels(labels: jnp.ndarray, mask: jnp.ndarray,
                           n_iters: int = 48, jump_every: int = 5
                           ) -> jnp.ndarray:
    """Connected components where 4-neighbors connect only if ``labels`` agree
    and both are in ``mask``. Returns int32 component ids (min linear index+1)
    or 0 outside the mask.

    The pointer-jumping hop (a full-image random gather, the dominant TPU
    cost) runs every ``jump_every``-th sweep; reach ~ jump_every *
    2^(n_iters / jump_every) pixels of in-component path length."""
    h, w = labels.shape
    big = jnp.iinfo(jnp.int32).max
    idx = (jnp.arange(h * w, dtype=jnp.int32) + 1).reshape(h, w)
    comp = jnp.where(mask, idx, 0)

    def step(comp, it):
        pc = jnp.pad(comp, 1)
        pl = jnp.pad(labels, 1, constant_values=-2)
        neighs = []
        for (oy, ox) in [(0, 1), (2, 1), (1, 0), (1, 2)]:
            nc = pc[oy:oy + h, ox:ox + w]
            nl = pl[oy:oy + h, ox:ox + w]
            same = (nl == labels) & (nc > 0)
            neighs.append(jnp.where(same, nc, big))
        best = jnp.minimum(jnp.where(comp > 0, comp, big),
                           jnp.minimum(jnp.minimum(neighs[0], neighs[1]),
                                       jnp.minimum(neighs[2], neighs[3])))
        best = jnp.where(mask, best, 0)

        # pointer jumping every 4th sweep (the gather dominates TPU cost)
        def jump(b):
            j = jnp.take(b.reshape(-1), jnp.maximum(b - 1, 0).reshape(-1)
                         ).reshape(h, w)
            return jnp.where((b > 0) & (j > 0), jnp.minimum(b, j), b)

        best = lax.cond(it % jump_every == jump_every - 1, jump,
                        lambda b: b, best)
        return best, None

    comp, _ = lax.scan(step, comp, jnp.arange(n_iters))
    return comp


def _compact_topk(comp: jnp.ndarray, k: int, min_area: float
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Keep the k largest components. Returns ((H, W) int32 ids in [0, k) or
    -1, (k,) areas)."""
    h, w = comp.shape
    flat = comp.reshape(-1)
    areas_all = jax.ops.segment_sum(jnp.ones_like(flat, jnp.float32), flat,
                                    num_segments=h * w + 1)
    areas_all = areas_all.at[0].set(0.0)  # background
    top_area, top_id = lax.top_k(areas_all, k)
    keep = top_area >= min_area
    # lookup: component id -> rank
    rank = jnp.full((h * w + 1,), -1, jnp.int32)
    rank = rank.at[top_id].set(jnp.where(keep, jnp.arange(k, dtype=jnp.int32), -1))
    return rank[flat].reshape(h, w), jnp.where(keep, top_area, 0.0)


def _pair_counts(masks: jnp.ndarray, weight_img: jnp.ndarray) -> jnp.ndarray:
    """(K, HW) x (HW,) -> (K, K) matrix of sum_p m_i(p) m_j(p) w(p).

    HIGHEST precision: adjacency/edge-composition COUNTS feed threshold
    comparisons; bf16 sums over 77k elements drift ~1% and make merge
    decisions platform-dependent."""
    mw = masks * weight_img.reshape(-1)[None, :]
    return jnp.matmul(mw, masks.T, precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnames=("cfg",))
def rag_merge(
    kmeans_labels: jnp.ndarray,   # (H, W) int32, -1 invalid
    edges: jnp.ndarray,           # (H, W) bool, occluded1 (all real edges)
    plane_edges: jnp.ndarray,     # (H, W) bool, occluded2 (plane edges)
    valid: jnp.ndarray,           # (H, W) bool, total area
    depth_m: jnp.ndarray,         # (H, W) metric depth
    cfg: DynaConfig,
) -> RagResult:
    h, w = kmeans_labels.shape
    K = _K_MAX

    # ---- components of (cluster minus edges), at HALF resolution: the
    # min-label propagation + pointer jumping is gather-heavy, and component
    # granularity (min area 80 px) survives 2x downsampling. Edges stay >= 1
    # px wide at half res so they still separate regions.
    lab_h = im.subsample(kmeans_labels)
    seg_mask = valid & (kmeans_labels >= 0) & ~edges
    mask_h = im.subsample(seg_mask)
    if jax.default_backend() == "tpu":
        # VMEM-resident sweep kernel: ~0.4 ms vs ~5 ms for the XLA
        # pointer-jumping relabel (each jump is a 77k-element random gather)
        from sindslam_tpu.ops.pallas_kernels import cc_labels_pallas

        hh2, hw2 = lab_h.shape
        idx0 = (jnp.arange(hh2 * hw2, dtype=jnp.int32) + 1).reshape(hh2, hw2)
        seed = jnp.where(mask_h, idx0, 0)
        comp_h = cc_labels_pallas(seed, mask_h, lab_h, n_sweeps=768)
    else:
        comp_h = components_from_labels(lab_h, mask_h, n_iters=32)
    cid_h, _areas_h = _compact_topk(comp_h, K, float(cfg.min_cluster_area) / 4.0)
    # ---- node + pairwise features ENTIRELY at half resolution: the K x HW
    # one-hot masks are the stage's HBM bill (32 x 307k f32 = 39 MB per
    # materialization at full res; the r3 ablation measured rag_merge at
    # 6.3 ms marginal, dominated by this traffic). Component granularity,
    # depth histograms, and adjacency-zone overlaps all survive 2x
    # downsampling; areas/coordinates are tracked in half-res units and
    # rescaled at the end. Thresholds in full-res pixels are divided by 4
    # (areas) here.
    h2, w2 = cid_h.shape
    cid_hm = jnp.where(mask_h, cid_h, -1)
    onehot = (cid_hm[None, :, :] == jnp.arange(K)[:, None, None]
              ).astype(jnp.float32)
    M = onehot.reshape(K, h2 * w2)
    ys = (jnp.arange(h2 * w2) // w2).astype(jnp.float32)
    xs = (jnp.arange(h2 * w2) % w2).astype(jnp.float32)
    zs = im.subsample(depth_m).reshape(-1)
    bin_idx = jnp.clip((zs / cfg.max_depth_m * _HIST_BINS).astype(jnp.int32),
                       0, _HIST_BINS - 1)
    bin_onehot = (bin_idx[:, None] == jnp.arange(_HIST_BINS)[None, :]
                  ).astype(jnp.float32)
    feat_cols = jnp.concatenate(
        [jnp.stack([jnp.ones_like(xs), xs, ys, zs], axis=-1), bin_onehot],
        axis=-1)                                              # (HW/4, 4+16)
    # HIGHEST: areas/centers/histogram counts feed merge thresholds
    F = jnp.matmul(M, feat_cols, precision=_HI)           # (K, 20)
    cnt = F[:, 0]                        # half-res pixel counts (= area / 4)
    centers = F[:, 1:4] / jnp.maximum(cnt[:, None], 1.0)
    hist = F[:, 4:]
    hist_n = hist / jnp.maximum(jnp.sum(hist, -1, keepdims=True), 1.0)

    # ---- pairwise features via masked matmuls on dilated one-hot masks
    dil = im._window_extreme_1d(onehot, _DILATE_ADJ_H, 1, lax.max, -jnp.inf)
    dil = im._window_extreme_1d(dil, _DILATE_ADJ_H, 2, lax.max, -jnp.inf)
    dil = dil.reshape(K, h2 * w2)
    ones_img = jnp.ones((h2, w2), jnp.float32)
    boundary_all = _pair_counts(dil, ones_img)                 # shared zone size
    # The shared zone is ~_DILATE_ADJ_H wide while edges are thin: dilate
    # the edge images to a comparable width before measuring composition, so
    # a genuine depth-edge interface reads edge_frac ~ 1, not ~ 0.3.
    edges_h = im.subsample(edges).astype(jnp.float32)
    plane_h = im.subsample(plane_edges).astype(jnp.float32)
    edges_wide = im.dilate(edges_h, _DILATE_ADJ_H)
    plane_wide = im.dilate(plane_h, _DILATE_ADJ_H)
    boundary_edge = _pair_counts(dil, edges_wide)
    boundary_plane = _pair_counts(dil, plane_wide)

    node_ok = cnt > 0.5
    pair_ok = node_ok[:, None] & node_ok[None, :] & ~jnp.eye(K, dtype=bool)

    less_area = jnp.minimum(cnt[:, None], cnt[None, :])
    adjacent = boundary_all > jnp.minimum(cfg.rag_adjacency_min_overlap / 4.0,
                                          cfg.rag_adjacency_frac * less_area)

    # histogram similarity: 0.5 * pearson + 0.5 * bhattacharyya coefficient
    hm = hist_n - jnp.mean(hist_n, -1, keepdims=True)
    denom = jnp.sqrt(jnp.sum(hm * hm, -1))
    correl = jnp.matmul(hm, hm.T, precision=_HI) / jnp.maximum(
        denom[:, None] * denom[None, :], 1e-6)
    bhatta = jnp.matmul(jnp.sqrt(hist_n), jnp.sqrt(hist_n).T, precision=_HI)
    hist_sim = 0.5 * correl + 0.5 * bhatta

    # boundary composition
    shared = jnp.maximum(boundary_all, 1.0)
    plane_frac = boundary_plane / shared
    edge_frac = boundary_edge / shared
    fake_frac = 1.0 - edge_frac
    must_merge = adjacent & (fake_frac > cfg.rag_fake_edge_overlap) & pair_ok
    plane_reject = plane_frac > 0.35

    # weights: small clusters merge eagerly, near clusters reluctantly
    # (3000 full-res px = 750 half-res px)
    wsmall = jnp.where(less_area < 750.0, cfg.rag_small_cluster_weight, 1.0)
    near_z = jnp.minimum(centers[:, None, 2], centers[None, :, 2])
    wnear = jnp.where(near_z < 1.5, cfg.rag_near_cluster_weight, 1.0)

    score = hist_sim * wsmall * wnear
    score = jnp.where(adjacent & pair_ok & ~plane_reject &
                      (hist_sim > cfg.rag_hist_reject), score, 0.0)
    score = jnp.where(must_merge, 10.0, score)

    # ---- fixed-iteration greedy merge with union-find parents
    def roots_of(parent):
        # real pointer doubling: r <- r[r] squares the reach each iteration,
        # so 5 steps resolve chains up to 2^5 = 32 >= K deep
        r = parent
        for _ in range(5):
            r = r[r]
        return r

    def merge_step(state, _):
        parent, score_m = state
        root = roots_of(parent)
        is_root = root == jnp.arange(K)
        n_roots = jnp.sum(is_root & node_ok)
        # aggregate score to root pairs
        S = (root[:, None] == jnp.arange(K)[None, :]).astype(jnp.float32)  # (K, Kroot)
        agg = jnp.matmul(jnp.matmul(S.T, score_m, precision=_HI), S, precision=_HI)
        cnt_pairs = jnp.matmul(jnp.matmul(S.T, pair_ok.astype(jnp.float32),
                                          precision=_HI), S, precision=_HI)
        agg = jnp.where(cnt_pairs > 0, agg / jnp.maximum(cnt_pairs, 1.0), 0.0)
        rr_ok = is_root[:, None] & is_root[None, :] & ~jnp.eye(K, dtype=bool)
        agg = jnp.where(rr_ok, agg, 0.0)
        best_flat = jnp.argmax(agg)
        bi, bj = best_flat // K, best_flat % K
        best_score = agg[bi, bj]
        # merge while above threshold; when far over the target cluster count,
        # accept weaker (but still positive-evidence) merges
        do = (best_score >= cfg.rag_merge_score_min) | \
             ((n_roots > 2 * cfg.n_clusters) & (best_score > 0.3))
        lo = jnp.minimum(bi, bj)
        hi = jnp.maximum(bi, bj)
        new_parent = jnp.where(do & (jnp.arange(K) == hi), lo, parent)
        return (new_parent, score_m), None

    parent0 = jnp.arange(K)
    # fully unrolled: each iteration is ~10 serialized 32x32 ops, so the
    # while-loop form is pure per-iteration latency (~0.3 ms each, r3
    # ablation); unrolled, XLA schedules the chain back-to-back
    (parent, _), _ = lax.scan(merge_step, (parent0, score), None,
                              length=_MERGE_STEPS, unroll=_MERGE_STEPS)
    root = roots_of(parent)

    # ---- compact final labels 1..N
    is_root = (root == jnp.arange(K)) & node_ok
    final_rank = jnp.cumsum(is_root.astype(jnp.int32)) * is_root  # 1..N at roots
    label_of_node = final_rank[root]                               # (K,)
    # node->pixel label lookup through the existing half-res one-hot (a
    # 307k point gather on the 32-entry table costs ~3 ms on the TPU scalar
    # unit; the (1, K) x (K, HW/4) matmul + 2x repeat is ~µs). Pixels whose
    # half-res parent has no component read 0, exactly like the flat_ok
    # branch did.
    lbl_h = jnp.matmul(label_of_node.astype(jnp.float32)[None, :],
                       onehot.reshape(K, h2 * w2),
                       precision=_HI).reshape(h2, w2).astype(jnp.int32)
    lbl_full = jnp.repeat(jnp.repeat(lbl_h, 2, axis=0), 2, axis=1)[:h, :w]
    label_img = jnp.where(seg_mask, lbl_full, 0)

    # ---- geodesic growth: unassigned valid pixels (edges, small comps)
    # adopt the most common neighboring label
    def grow(lbl, _):
        f = lbl.astype(jnp.float32)
        grown = im.dilate(f, 3)
        return jnp.where((lbl == 0) & valid, grown.astype(jnp.int32), lbl), None

    label_img, _ = lax.scan(grow, label_img, None, length=6, unroll=6)
    label_img = jnp.where(valid, label_img, 0)

    # aggregated root features for downstream consumers: S^T (K-node feats),
    # rescaled from half-res units to full-res pixels (areas x4, x/y x2)
    S = (root[:, None] == jnp.arange(K)[None, :]).astype(jnp.float32)
    cnt_r = jnp.matmul(S.T, cnt, precision=_HI)
    centers_r = jnp.matmul(S.T, centers * cnt[:, None],
                           precision=_HI) / jnp.maximum(cnt_r[:, None], 1.0)
    centers_r = centers_r * jnp.array([2.0, 2.0, 1.0])

    return RagResult(label_img=label_img.astype(jnp.int32),
                     n_clusters=jnp.max(label_img),
                     areas=cnt_r * 4.0, centers=centers_r)
