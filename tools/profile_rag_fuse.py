#!/usr/bin/env python3
"""In-graph micro-profile of rag_merge / fuse_masks internals on TPU."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from sindslam_tpu.utils import setup_compilation_cache
setup_compilation_cache()

from sindslam_tpu.config import DynaConfig
from sindslam_tpu.ops import image as im
from sindslam_tpu.ops.pallas_kernels import cc_labels_pallas

N = int(os.environ.get("PROF_ITERS", "10"))
R = int(os.environ.get("PROF_REPS", "10"))
cfg = DynaConfig()
K = 24
HIST = 16


def timeit_op(name, op, *x0):
    @jax.jit
    def looped(*xs):
        def body(i, xs):
            out = op(*xs)
            return tuple(x + out * 1e-20 for x in xs)
        return lax.fori_loop(0, R, body, xs)

    out = looped(*x0)
    _ = np.asarray(out[0]).ravel()[0]
    t0 = time.perf_counter()
    for _i in range(N):
        out = looped(*out)
    _ = np.asarray(out[0]).ravel()[0]
    dt = (time.perf_counter() - t0) / (N * R) * 1000
    print(f"{name:44s} {dt:8.3f} ms/op", flush=True)


rng = np.random.default_rng(0)
h, w = 480, 640
hh, hw = 240, 320
lab_h = jnp.asarray(rng.integers(0, 12, (hh, hw)).astype(np.int32))
mask_h = jnp.asarray(rng.random((hh, hw)) < 0.8)
comp_id = jnp.asarray(rng.integers(-1, K, (h, w)).astype(np.int32))
depth = jnp.asarray(rng.uniform(0.5, 6, (h, w)).astype(np.float32))
edges = jnp.asarray(rng.random((h, w)) < 0.05)
fimg = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32))

idx0 = (jnp.arange(hh * hw, dtype=jnp.int32) + 1).reshape(hh, hw)


def cc_op(m, l):
    seed = jnp.where(m > 0.5, idx0, 0)
    return cc_labels_pallas(seed, m > 0.5, l.astype(jnp.int32),
                            n_sweeps=768).astype(jnp.float32)


timeit_op("rag: CC pallas 768 sweeps @240x320", cc_op,
          mask_h.astype(jnp.float32), lab_h.astype(jnp.float32))


def compact_op(c):
    comp = c.astype(jnp.int32)
    flat = comp.reshape(-1)
    areas = jax.ops.segment_sum(jnp.ones_like(flat, jnp.float32), flat,
                                num_segments=hh * hw + 1)
    top_area, top_id = lax.top_k(areas, K)
    rank = jnp.full((hh * hw + 1,), -1, jnp.int32)
    rank = rank.at[top_id].set(jnp.arange(K, dtype=jnp.int32))
    return rank[flat].reshape(hh, hw).astype(jnp.float32)


timeit_op("rag: compact_topk (segsum+topk+gather)", compact_op,
          jnp.asarray(rng.integers(0, hh * hw, (hh, hw)).astype(np.float32)))


def features_op(c, d):
    cid = c.astype(jnp.int32)
    onehot = (cid[None, :, :] == jnp.arange(K)[:, None, None]).astype(jnp.float32)
    M = onehot.reshape(K, h * w)
    ys = (jnp.arange(h * w) // w).astype(jnp.float32)
    xs = (jnp.arange(h * w) % w).astype(jnp.float32)
    zs = d.reshape(-1)
    bin_idx = jnp.clip((zs / 6.0 * HIST).astype(jnp.int32), 0, HIST - 1)
    bin_onehot = (bin_idx[:, None] == jnp.arange(HIST)[None, :]).astype(jnp.float32)
    feat = jnp.concatenate([jnp.stack([jnp.ones_like(xs), xs, ys, zs], -1),
                            bin_onehot], -1)
    F = jnp.matmul(M, feat)
    return F.sum()


timeit_op("rag: onehot+feature matmul", features_op, comp_id.astype(jnp.float32),
          depth)


def pairs_op(c, e):
    cid = c.astype(jnp.int32)
    onehot = (cid[None, :, :] == jnp.arange(K)[:, None, None]).astype(jnp.float32)
    dil = im._window_extreme_1d(onehot, 13, 1, lax.max, -jnp.inf)
    dil = im._window_extreme_1d(dil, 13, 2, lax.max, -jnp.inf).reshape(K, h * w)
    ew = im.dilate(e, 13).reshape(-1)
    b_all = dil @ dil.T
    b_e = (dil * ew[None, :]) @ dil.T
    return b_all.sum() + b_e.sum()


timeit_op("rag: dil13 + 2 pair matmuls", pairs_op, comp_id.astype(jnp.float32),
          edges.astype(jnp.float32))


def fuse_grow_op(s):
    seed = s > 0.5
    zone = jnp.abs(s) < 1.0
    lab = (jnp.abs(s * 7).astype(jnp.int32) % 16)

    def body(st, _):
        ls = jnp.where(st, lab, 0)
        g = im.dilate(ls, 9)
        ok = (g == lab) & (g > 0) & zone
        return ok | st, None

    out, _ = lax.scan(body, seed, None, length=12)
    return out.astype(jnp.float32).sum()


timeit_op("fuse: grow loop 12x dilate9", fuse_grow_op, fimg)


def per_label_op(s):
    lab = (jnp.abs(s * 7).astype(jnp.int32) % 33).reshape(-1)
    onehot = (lab[:, None] == jnp.arange(33)[None, :]).astype(jnp.float32)
    a = jnp.matmul(jnp.abs(s).reshape(1, -1), onehot)
    b = jnp.matmul((s * s).reshape(1, -1), onehot)
    c = jnp.matmul(jnp.ones((1, h * w)), onehot)
    return a.sum() + b.sum() + c.sum()


timeit_op("fuse: 3x per-label one-hot matmul", per_label_op, fimg)

timeit_op("fuse: final ellipse dilate k15",
          lambda s: im.dilate_ellipse(s, 15), fimg)
timeit_op("fuse: dilate k3 x9 iters", lambda s: im.dilate(s, 3, iterations=9),
          fimg)
