#!/usr/bin/env python3
"""Benchmark gather-free warp formulations (one-hot matmul separable) on TPU."""

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
    print(f"{name:48s} {dt:8.3f} ms/op", flush=True)


def warp_take4(img, u, v):
    ys = jnp.arange(H, dtype=jnp.float32)[:, None] + v
    xs = jnp.arange(W, dtype=jnp.float32)[None, :] + u
    cy = jnp.clip(ys, 0.0, H - 1.0)
    cx = jnp.clip(xs, 0.0, W - 1.0)
    y0 = jnp.floor(cy).astype(jnp.int32)
    x0 = jnp.floor(cx).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    fy = cy - y0
    fx = cx - x0
    flat = img.reshape(-1)
    idx4 = jnp.stack([y0 * W + x0, y0 * W + x1, y1 * W + x0, y1 * W + x1], -1)
    t = jnp.take(flat, idx4.reshape(-1)).reshape(H, W, 4)
    return (t[..., 0] * (1 - fy) * (1 - fx) + t[..., 1] * (1 - fy) * fx
            + t[..., 2] * fy * (1 - fx) + t[..., 3] * fy * fx)


def _mm_warp(img, u, v, dtype):
    """Separable bilinear warp as two batched one-hot matmuls (MXU)."""
    ys = jnp.arange(H, dtype=jnp.float32)[:, None] + v
    xs = jnp.arange(W, dtype=jnp.float32)[None, :] + u
    cy = jnp.clip(ys, 0.0, H - 1.0)
    cx = jnp.clip(xs, 0.0, W - 1.0)
    y0 = jnp.floor(cy).astype(jnp.int32)
    x0 = jnp.floor(cx).astype(jnp.int32)
    fy = (cy - y0).astype(dtype)
    fx = (cx - x0).astype(dtype)

    # vertical: tmp[i, j] = (1-fy) img[y0, j] + fy img[y0+1, j]
    # batched over columns j: A[j, i, k] one-hot in k
    k = jnp.arange(H, dtype=jnp.int32)
    y0t = y0.T[:, :, None]                               # (W, H, 1)
    fyt = fy.T[:, :, None]
    A = ((k[None, None, :] == y0t).astype(dtype) * (1 - fyt)
         + (k[None, None, :] == y0t + 1).astype(dtype) * fyt)   # (W, H, H)
    tmp = jnp.einsum("jik,kj->ij", A, img.astype(dtype),
                     precision=lax.Precision.DEFAULT)            # (H, W)

    # horizontal: out[i, j] = (1-fx) tmp[i, x0] + fx tmp[i, x0+1]
    m = jnp.arange(W, dtype=jnp.int32)
    x0e = x0[:, :, None]                                 # (H, W, 1)
    fxe = fx[:, :, None]
    B = ((m[None, None, :] == x0e).astype(dtype) * (1 - fxe)
         + (m[None, None, :] == x0e + 1).astype(dtype) * fxe)   # (H, W, W)
    out = jnp.einsum("ijm,im->ij", B, tmp.astype(dtype),
                     precision=lax.Precision.DEFAULT)
    return out.astype(jnp.float32)


def warp_mm_f32(img, u, v):
    return _mm_warp(img, u, v, jnp.float32)


def warp_mm_bf16(img, u, v):
    return _mm_warp(img, u, v, jnp.bfloat16)


a = np.asarray(warp_take4(img, u0, v0))
for f in (warp_mm_f32, warp_mm_bf16):
    b = np.asarray(f(img, u0, v0))
    err = np.abs(a[4:-4, 4:-4] - b[4:-4, 4:-4]).max()
    print(f"{f.__name__} parity max err {err:.2e}")

timeit_op("warp take4 (440k pt idx)", warp_take4)
timeit_op("warp one-hot matmul f32", warp_mm_f32)
timeit_op("warp one-hot matmul bf16", warp_mm_bf16)
