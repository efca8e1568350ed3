#!/usr/bin/env python3
"""Micro-profile of front-end building blocks on-chip (dev tool).

Each op is applied R times inside ONE jit via a fori_loop carry (data
dependence defeats CSE), so per-dispatch tunnel overhead (~2 ms) amortizes
away: reported time = (t_loop - t_identity) / R.
"""

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

from sindslam_tpu.ops import image as im

N = int(os.environ.get("PROF_ITERS", "10"))
R = int(os.environ.get("PROF_REPS", "20"))


def timeit_op(name, op, x0):
    """op: array -> array (same shape/dtype). Reports per-application ms."""

    @jax.jit
    def looped(x):
        return lax.fori_loop(0, R, lambda i, x: op(x), x)

    out = looped(x0)
    _ = np.asarray(out).ravel()[0]
    t0 = time.perf_counter()
    for _i in range(N):
        out = looped(out)
    _ = np.asarray(out).ravel()[0]
    dt = (time.perf_counter() - t0) / (N * R) * 1000
    print(f"{name:44s} {dt:8.3f} ms/op", flush=True)


rng = np.random.default_rng(0)
img_f = jnp.asarray(rng.standard_normal((480, 640)).astype(np.float32))
img_w = jnp.asarray(rng.standard_normal((288, 384)).astype(np.float32))
lab33 = jnp.asarray(rng.integers(0, 33, (480, 640)).astype(np.int32))

timeit_op("median3 @288x384", lambda x: im.median_filter(x, 3), img_w)
timeit_op("median5 @640x480", lambda x: im.median_filter(x, 5), img_f)
timeit_op("dilate k3x5 @640", lambda x: im.dilate(x, 3, iterations=5), img_f)
timeit_op("dilate k9 @640", lambda x: im.dilate(x, 9), img_f)
timeit_op("gaussian5 @288x384", lambda x: im.gaussian_blur(x, 5, 0.8), img_w)
timeit_op("warp_by_flow @288x384",
          lambda x: im.warp_by_flow(x, x * 0.01, x * 0.01)[0], img_w)
timeit_op("image_gradients @288x384",
          lambda x: sum(im.image_gradients(x)), img_w)
timeit_op("resize_bilinear down @288x384",
          lambda x: im.resize_bilinear(im.resize_bilinear(x, (230, 307)),
                                       (288, 384)), img_w)


def relabel_step(x):
    m = x > 0.5
    return im.connected_relabel(m[:240, :320], n_iters=8).astype(
        jnp.float32).sum() * 0 + x


timeit_op("connected_relabel 8 iters @240x320", relabel_step, img_f)


def seg_sum_step(x):
    c = (x[:240, :320] > 0).astype(jnp.int32).reshape(-1) * 7
    s = jax.ops.segment_sum(x[:240, :320].reshape(-1), c,
                            num_segments=240 * 320 + 1)
    return x + s[0] * 1e-20


timeit_op("segment_sum 76801 segs", seg_sum_step, img_f)


def gather_step(x):
    idx = jnp.abs(x.reshape(-1)[:240 * 320] * 1000).astype(jnp.int32) % (240 * 320)
    g = jnp.take(x.reshape(-1)[:240 * 320], idx)
    return x + g.sum() * 1e-20


timeit_op("random gather 76.8k", gather_step, img_f)


def onehot_mm_step(x):
    oh = (lab33.reshape(-1)[:, None] == jnp.arange(33)[None, :]).astype(jnp.float32)
    s = jnp.matmul(x.reshape(1, -1), oh)
    return x + s[0, 0] * 1e-20


timeit_op("one-hot matmul 307k x 33", onehot_mm_step, img_f)
