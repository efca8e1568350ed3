#!/usr/bin/env python3
"""Benchmark bilinear-warp formulations on TPU (dev tool)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

N = int(os.environ.get("PROF_ITERS", "10"))
R = int(os.environ.get("PROF_REPS", "20"))
H, W = 288, 384

rng = np.random.default_rng(0)
img = jnp.asarray(rng.standard_normal((H, W)).astype(np.float32))
u0 = jnp.asarray((rng.standard_normal((H, W)) * 5).astype(np.float32))
v0 = jnp.asarray((rng.standard_normal((H, W)) * 5).astype(np.float32))


def timeit_op(name, op):
    @jax.jit
    def looped(u, v):
        def body(i, carry):
            u, v = carry
            o = op(img, u, v)
            return u + o * 1e-20, v - o * 1e-20
        return lax.fori_loop(0, R, body, (u, v))

    out = looped(u0, v0)
    _ = np.asarray(out[0]).ravel()[0]
    t0 = time.perf_counter()
    for _i in range(N):
        out = looped(*out)
    _ = np.asarray(out[0]).ravel()[0]
    dt = (time.perf_counter() - t0) / (N * R) * 1000
    print(f"{name:44s} {dt:8.3f} ms/op", flush=True)


def coords(u, v):
    ys = jnp.arange(H, dtype=jnp.float32)[:, None] + v
    xs = jnp.arange(W, dtype=jnp.float32)[None, :] + u
    cy = jnp.clip(ys, 0.0, H - 1.0)
    cx = jnp.clip(xs, 0.0, W - 1.0)
    y0 = jnp.floor(cy).astype(jnp.int32)
    x0 = jnp.floor(cx).astype(jnp.int32)
    return cy, cx, y0, x0


def warp_take4(img, u, v):
    cy, cx, y0, x0 = coords(u, v)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    fy = cy - y0
    fx = cx - x0
    flat = img.reshape(-1)
    idx4 = jnp.stack([y0 * W + x0, y0 * W + x1, y1 * W + x0, y1 * W + x1], -1)
    t = jnp.take(flat, idx4.reshape(-1)).reshape(H, W, 4)
    return (t[..., 0] * (1 - fy) * (1 - fx) + t[..., 1] * (1 - fy) * fx
            + t[..., 2] * fy * (1 - fx) + t[..., 3] * fy * fx)


def warp_slice22(img, u, v):
    cy, cx, y0, x0 = coords(u, v)
    y0 = jnp.minimum(y0, H - 2)
    x0 = jnp.minimum(x0, W - 2)
    fy = cy - y0
    fx = cx - x0
    starts = jnp.stack([y0.reshape(-1), x0.reshape(-1)], -1)     # (N, 2)
    dn = lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(),
        start_index_map=(0, 1))
    t = lax.gather(img, starts, dn, slice_sizes=(2, 2),
                   mode=lax.GatherScatterMode.CLIP)              # (N, 2, 2)
    t = t.reshape(H, W, 2, 2)
    return (t[..., 0, 0] * (1 - fy) * (1 - fx) + t[..., 0, 1] * (1 - fy) * fx
            + t[..., 1, 0] * fy * (1 - fx) + t[..., 1, 1] * fy * fx)


def warp_slice2_flat(img, u, v):
    cy, cx, y0, x0 = coords(u, v)
    y0 = jnp.minimum(y0, H - 2)
    x0 = jnp.minimum(x0, W - 2)
    fy = cy - y0
    fx = cx - x0
    flat = img.reshape(-1)
    dn = lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,))
    i0 = (y0 * W + x0).reshape(-1, 1)
    i1 = i0 + W
    t0 = lax.gather(flat, i0, dn, slice_sizes=(2,),
                    mode=lax.GatherScatterMode.CLIP).reshape(H, W, 2)
    t1 = lax.gather(flat, i1, dn, slice_sizes=(2,),
                    mode=lax.GatherScatterMode.CLIP).reshape(H, W, 2)
    return ((t0[..., 0] * (1 - fx) + t0[..., 1] * fx) * (1 - fy)
            + (t1[..., 0] * (1 - fx) + t1[..., 1] * fx) * fy)


def warp_take1_nn(img, u, v):
    cy, cx, y0, x0 = coords(u, v)
    return jnp.take(img.reshape(-1), (y0 * W + x0).reshape(-1)).reshape(H, W)


# numerical parity check (interior, away from borders)
a = np.asarray(warp_take4(img, u0, v0))
for f in (warp_slice22, warp_slice2_flat):
    b = np.asarray(f(img, u0, v0))
    err = np.abs(a[2:-2, 2:-2] - b[2:-2, 2:-2]).max()
    print(f"{f.__name__} parity max err {err:.2e}")

timeit_op("warp take4 (440k pt idx)", warp_take4)
timeit_op("warp gather slice(2,2) (110k idx)", warp_slice22)
timeit_op("warp 2x gather flat slice(2) (220k idx)", warp_slice2_flat)
timeit_op("warp take1 nearest (110k idx)", warp_take1_nn)
