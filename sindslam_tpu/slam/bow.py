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


def _majority_center(descs: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """Bitwise weighted majority vote of (N, 8) uint32 descriptors -> (8,)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (descs[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)  # (N,8,32)
    votes = jnp.sum(bits.astype(jnp.float32) * weights[:, None, None], axis=0)
    total = jnp.sum(weights) + 1e-9
    maj = (votes > 0.5 * total).astype(jnp.uint32)
    return jnp.sum(maj << shifts[None, :], axis=-1, dtype=jnp.uint32)


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def kmedians_binary(descs: jnp.ndarray, valid: jnp.ndarray, key: jax.Array,
                    k: int, iters: int = 6) -> jnp.ndarray:
    """Binary k-medians: (N, 8) descriptors -> (k, 8) centers."""
    n = descs.shape[0]
    perm = jax.random.permutation(key, n)
    centers = descs[perm[:k]]

    def step(centers, _):
        d = _hamming(descs, centers)
        d = jnp.where(valid[:, None], d, 1 << 20)
        lab = jnp.argmin(d, axis=-1)
        new = []
        for c in range(k):
            w = ((lab == c) & valid).astype(jnp.float32)
            maj = _majority_center(descs, w)
            new.append(jnp.where(jnp.sum(w) > 0.5, maj, centers[c]))
        return jnp.stack(new), None

    centers, _ = lax.scan(step, centers, None, length=iters)
    return centers


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
                     seed: int = 0) -> Vocabulary:
    """Hierarchical binary k-medians over a (N, 8) uint32 descriptor corpus."""
    key = jax.random.PRNGKey(seed)
    descs_j = jnp.asarray(descs)
    n = len(descs)

    # level 0: cluster everything into k groups
    nodes: List[np.ndarray] = []
    assignments = np.zeros(n, np.int64)   # parent node id per descriptor
    for level in range(levels):
        n_parents = k ** level
        level_centers = np.zeros((n_parents * k, 8), np.uint32)
        new_assign = np.zeros(n, np.int64)
        for p in range(n_parents):
            sel = assignments == p
            key, sub = jax.random.split(key)
            if sel.sum() >= k:
                # pad to fixed shape for the jitted clusterer
                idx = np.where(sel)[0]
                cap = 1 << int(np.ceil(np.log2(max(len(idx), k))))
                dpad = np.zeros((cap, 8), np.uint32)
                vpad = np.zeros(cap, bool)
                dpad[:len(idx)] = descs[idx]
                vpad[:len(idx)] = True
                centers = np.asarray(kmedians_binary(jnp.asarray(dpad),
                                                     jnp.asarray(vpad), sub, k))
                d = np.asarray(_hamming(jnp.asarray(descs[idx]),
                                        jnp.asarray(centers)))
                new_assign[idx] = p * k + d.argmin(axis=1)
            else:
                centers = np.tile(descs[0:1] if sel.sum() == 0
                                  else descs[np.where(sel)[0][:1]], (k, 1))
                new_assign[sel] = p * k
            level_centers[p * k:(p + 1) * k] = centers
        nodes.append(level_centers)
        assignments = new_assign
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
