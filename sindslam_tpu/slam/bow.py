"""Binary bag-of-words place recognition (DBoW2 equivalent, TPU-native).

Replaces the vendored DBoW2 ``TemplatedVocabulary``/``BowVector`` stack
(reference ``ORB_SLAM2/Thirdparty/DBoW2``, used for relocalization and loop
detection via ``KeyFrameDatabase``): a k-ary tree of binary (256-bit) cluster
centers is TRAINED IN-PROCESS by hierarchical k-medians over descriptors
gathered online (the reference's ORBvoc.txt blob is a pre-trained artifact;
training here is a batched XLA computation: Hamming assignment via
XOR+popcount, centers via bitwise majority vote). Quantization of a frame's
descriptors is a level-wise batched argmin — exactly the "vocab tree lookup =
batched argmin over node children" design from SURVEY.md §2.3.

Frame signatures are tf-idf-weighted word histograms; similarity is the same
L1-family score DBoW2 uses. The inverted file (word -> keyframes) lives on
the host.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def _hamming(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(N, 8) x (M, 8) uint32 -> (N, M) int32."""
    x = jnp.bitwise_xor(a[:, None, :], b[None, :, :])
    return jnp.sum(lax.population_count(x), axis=-1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def _kmedians_batch(descs: jnp.ndarray, valid: jnp.ndarray, keys: jnp.ndarray,
                    k: int, iters: int = 6) -> jnp.ndarray:
    """Batched binary k-medians: (P, C, 8) padded per-parent descriptor sets
    -> (P, k, 8) centers, all P problems solved by one vmapped kernel.

    The Lloyd update is a matmul (membership one-hot (C, k) x bit expansion
    (C, 256) -> per-center bit votes), so a whole vocabulary level trains as
    a few large MXU contractions instead of the reference's recursive
    per-node std::vector clustering (``Thirdparty/DBoW2/DBoW2/
    TemplatedVocabulary.h`` HKmeansStep)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)

    def one(d, v, key):
        c_cap = d.shape[0]
        # seed from k random VALID slots (gumbel-top-k over validity):
        # seeding from the padded zeros collapses every center of a
        # sparsely-populated parent onto 0 and the whole level degenerates
        g = jax.random.gumbel(key, (c_cap,)) + jnp.where(v, 0.0, -1e9)
        _, seed_idx = lax.top_k(g, k)
        centers = d[seed_idx]
        bits = ((d[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
                ).astype(jnp.float32).reshape(c_cap, 256)
        wv = v.astype(jnp.float32)

        def step(centers, _):
            dist = _hamming(d, centers)
            dist = jnp.where(v[:, None], dist, 1 << 20)
            lab = jnp.argmin(dist, axis=-1)
            onehot = (lab[:, None] == jnp.arange(k)[None]).astype(jnp.float32) \
                * wv[:, None]                                   # (C, k)
            votes = jnp.einsum("ck,cb->kb", onehot, bits)       # (k, 256)
            total = jnp.sum(onehot, axis=0)                     # (k,)
            maj = (votes > 0.5 * total[:, None]).astype(jnp.uint32) \
                .reshape(k, 8, 32)
            new = jnp.sum(maj << shifts[None, None, :], axis=-1,
                          dtype=jnp.uint32)
            return jnp.where((total > 0.5)[:, None], new, centers), None

        centers, _ = lax.scan(step, centers, None, length=iters)
        return centers

    return jax.vmap(one)(descs, valid, keys)


@functools.partial(jax.jit, static_argnames=("k",))
def _assign_children(descs: jnp.ndarray, centers: jnp.ndarray,
                     parent: jnp.ndarray, k: int) -> jnp.ndarray:
    """Child index in [0, k) of each descriptor under its parent's centers.
    descs (N, 8); centers (n_parents, k, 8); parent (N,) int32."""
    cand = centers[parent]                                    # (N, k, 8)
    x = jnp.bitwise_xor(descs[:, None, :], cand)
    d = jnp.sum(lax.population_count(x), axis=-1)
    return jnp.argmin(d, axis=-1).astype(jnp.int32)


@dataclass
class Vocabulary:
    """k-ary tree: nodes[level] is (k^level * k, 8) centers (k children per
    parent, contiguous)."""

    k: int
    levels: int
    nodes: List[np.ndarray]   # per level: (k^(l+1), 8) uint32

    @property
    def n_words(self) -> int:
        return self.k ** self.levels

    def quantize(self, descs: jnp.ndarray, valid: jnp.ndarray) -> np.ndarray:
        """(N, 8) descriptors -> (N,) word ids (host numpy); invalid -> -1."""
        ids = _quantize_jit(descs, tuple(jnp.asarray(n) for n in self.nodes),
                            self.k)
        out = np.array(ids)
        out[~np.asarray(valid)] = -1
        return out


@functools.partial(jax.jit, static_argnames=("k",))
def _quantize_jit(descs: jnp.ndarray, nodes: Tuple[jnp.ndarray, ...], k: int
                  ) -> jnp.ndarray:
    node = jnp.zeros(descs.shape[0], jnp.int32)   # parent index at each level
    for level_nodes in nodes:
        # children of parent p are level_nodes[p*k : p*k + k]
        child_base = node * k
        cand = level_nodes[child_base[:, None] + jnp.arange(k)[None, :]]  # (N,k,8)
        x = jnp.bitwise_xor(descs[:, None, :], cand)
        d = jnp.sum(lax.population_count(x), axis=-1)
        node = child_base + jnp.argmin(d, axis=-1).astype(jnp.int32)
    return node


def train_vocabulary(descs: np.ndarray, k: int = 8, levels: int = 3,
                     seed: int = 0, train_cap: int = 4096,
                     chunk_budget: int = 1 << 17) -> Vocabulary:
    """Hierarchical binary k-medians over a (N, 8) uint32 descriptor corpus.

    Each level clusters ALL parents at once with the vmapped batched
    k-medians kernel (descriptors grouped per parent into one padded
    (n_parents, cap, 8) tensor), then re-assigns the FULL corpus to child
    nodes in one batched pass — so training a deep (10^4-10^6 word) tree
    costs a handful of device dispatches per level, not one per node.
    ``train_cap`` bounds the per-parent training subsample (assignment still
    uses every descriptor); ``chunk_budget`` bounds padded descriptors per
    dispatch so the (C, 256) bit expansion stays in memory."""
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    descs = np.ascontiguousarray(descs, np.uint32)
    n = len(descs)
    descs_j = jnp.asarray(descs)

    nodes: List[np.ndarray] = []
    assignments = np.zeros(n, np.int64)   # parent node id per descriptor
    for level in range(levels):
        n_parents = k ** level
        counts = np.bincount(assignments, minlength=n_parents)
        # shuffled stable sort: members of each parent are contiguous and in
        # random order, so truncation at ``cap`` is an unbiased subsample
        shuf = rng.permutation(n)
        order = shuf[np.argsort(assignments[shuf], kind="stable")]
        starts = np.zeros(n_parents + 1, np.int64)
        starts[1:] = np.cumsum(counts)
        cap = max(int(counts.max()) if n else k, k)
        cap = min(1 << int(np.ceil(np.log2(cap))), train_cap)
        offs = np.arange(cap)
        pos = np.minimum(starts[:-1, None] + offs[None], max(n - 1, 0))
        pvalid = offs[None] < np.minimum(counts, cap)[:, None]
        padded = descs[order[pos]] if n else np.zeros((n_parents, cap, 8),
                                                      np.uint32)
        padded[~pvalid] = 0

        key, sub = jax.random.split(key)
        pkeys = jax.random.split(sub, n_parents)
        pchunk = max(1, chunk_budget // cap)
        # pad the parent axis to a whole number of chunks: one compiled
        # executable per (pchunk, cap) shape
        n_pad = int(np.ceil(n_parents / pchunk)) * pchunk
        if n_pad != n_parents:
            padded = np.concatenate(
                [padded, np.zeros((n_pad - n_parents, cap, 8), np.uint32)])
            pvalid = np.concatenate(
                [pvalid, np.zeros((n_pad - n_parents, cap), bool)])
            pkeys = jnp.concatenate(
                [pkeys, jnp.zeros((n_pad - n_parents, 2), pkeys.dtype)])
        cents = np.zeros((n_pad, k, 8), np.uint32)
        for s in range(0, n_pad, pchunk):
            cents[s:s + pchunk] = np.asarray(_kmedians_batch(
                jnp.asarray(padded[s:s + pchunk]),
                jnp.asarray(pvalid[s:s + pchunk]),
                pkeys[s:s + pchunk], k))
        cents = cents[:n_parents]
        nodes.append(cents.reshape(n_parents * k, 8))
        if n:
            child = np.asarray(_assign_children(
                descs_j, jnp.asarray(cents),
                jnp.asarray(assignments.astype(np.int32)), k))
            assignments = assignments * k + child
    return Vocabulary(k=k, levels=levels, nodes=nodes)


@dataclass
class BowSignature:
    words: np.ndarray     # sorted unique word ids
    weights: np.ndarray   # normalized tf weights


def signature(word_ids: np.ndarray, n_words: int) -> BowSignature:
    w = word_ids[word_ids >= 0]
    if len(w) == 0:
        return BowSignature(np.zeros(0, np.int64), np.zeros(0, np.float32))
    uniq, counts = np.unique(w, return_counts=True)
    tf = counts.astype(np.float32)
    tf /= tf.sum()
    return BowSignature(uniq, tf)


def l1_score(a: BowSignature, b: BowSignature) -> float:
    """DBoW2 L1 score: 1 - 0.5 * |va/|va| - vb/|vb||_1 (in [0, 1])."""
    i = j = 0
    common = 0.0
    while i < len(a.words) and j < len(b.words):
        if a.words[i] == b.words[j]:
            common += min(a.weights[i], b.weights[j])
            i += 1
            j += 1
        elif a.words[i] < b.words[j]:
            i += 1
        else:
            j += 1
    return float(common)  # = 1 - 0.5*L1 for tf-normalized vectors


class KeyFrameDatabase:
    """Inverted file: word -> keyframe ids (reference KeyFrameDatabase.cc)."""

    def __init__(self, vocab: Vocabulary):
        self.vocab = vocab
        self.inverted: Dict[int, List[int]] = {}
        self.signatures: Dict[int, BowSignature] = {}

    def add(self, kf_id: int, word_ids: np.ndarray) -> None:
        sig = signature(word_ids, self.vocab.n_words)
        self.signatures[kf_id] = sig
        for w in sig.words:
            self.inverted.setdefault(int(w), []).append(kf_id)

    def query(self, word_ids: np.ndarray, exclude: Optional[set] = None,
              min_common_frac: float = 0.8, top: int = 5
              ) -> List[Tuple[int, float]]:
        """Candidate keyframes sharing words, scored by L1 similarity
        (the reference's DetectLoopCandidates/DetectRelocalizationCandidates
        shared-word prefilter + score)."""
        sig = signature(word_ids, self.vocab.n_words)
        shared = self._shared_words(sig, exclude)
        if not shared:
            return []
        max_common = max(shared.values())
        cands = [kf for kf, c in shared.items()
                 if c >= min_common_frac * max_common]
        scored = [(kf, l1_score(sig, self.signatures[kf])) for kf in cands]
        scored.sort(key=lambda x: -x[1])
        return scored[:top]

    def _shared_words(self, sig: BowSignature, exclude: Optional[set]
                      ) -> Dict[int, int]:
        shared: Dict[int, int] = {}
        for w in sig.words:
            for kf in self.inverted.get(int(w), []):
                if exclude and kf in exclude:
                    continue
                shared[kf] = shared.get(kf, 0) + 1
        return shared

    def score_between(self, word_ids: np.ndarray, kf_id: int) -> float:
        """L1 similarity between a query and one indexed keyframe."""
        if kf_id not in self.signatures:
            return 0.0
        return l1_score(signature(word_ids, self.vocab.n_words),
                        self.signatures[kf_id])

    def query_accumulated(self, word_ids: np.ndarray, covis_of,
                          exclude: Optional[set] = None,
                          min_common_frac: float = 0.8,
                          rel_acc_frac: float = 0.75,
                          min_score: float = 0.0,
                          ) -> List[Tuple[int, float]]:
        """Covisibility-group accumulated candidate scoring, matching the
        reference's ``DetectRelocalizationCandidates`` /
        ``DetectLoopCandidates`` (``KeyFrameDatabase.cc:199-310``):

        1. keyframes sharing words with the query; only those with
           > ``min_common_frac`` * max common words are scored (L1);
        2. scores accumulate over each candidate's covisibility group
           (``covis_of(kf_id)`` -> its ~10 best covisible keyframe ids) —
           a place revisited from a slightly different view still wins
           because its neighbors corroborate it;
        3. each group contributes its best-scoring member; groups with
           accumulated score >= ``rel_acc_frac`` * best group survive
           (the reference's 0.75f relative cutoff).

        ``min_score`` is the DetectLoopCandidates reference-score gate
        (similarity to the current keyframe's own covisible neighbors).
        """
        sig = signature(word_ids, self.vocab.n_words)
        shared = self._shared_words(sig, exclude)
        if not shared:
            return []
        min_common = min_common_frac * max(shared.values())
        scores = {kf: l1_score(sig, self.signatures[kf])
                  for kf, c in shared.items() if c > min_common}
        scores = {kf: s for kf, s in scores.items() if s >= min_score}
        if not scores:
            return []
        groups: List[Tuple[float, int]] = []
        for kf, s in scores.items():
            acc, best_kf, best_s = s, kf, s
            for nb in covis_of(kf):
                nb_s = scores.get(nb)
                if nb_s is None:
                    continue
                acc += nb_s
                if nb_s > best_s:
                    best_s, best_kf = nb_s, nb
            groups.append((acc, best_kf))
        best_acc = max(a for a, _ in groups)
        out: List[Tuple[int, float]] = []
        seen: set = set()
        for acc, kf in groups:
            if acc >= rel_acc_frac * best_acc and kf not in seen:
                seen.add(kf)
                out.append((kf, scores[kf]))
        out.sort(key=lambda x: -x[1])
        return out
