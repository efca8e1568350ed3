#!/usr/bin/env python3
"""Benchmark EXACT one-hot matmul bilinear warp vs gather warp on TPU."""

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


def _mm_warp_exact(img, u, v, dtype):
    """Exact bilinear warp, gather-free:
      G[i,j,m] = sum_k Wy[i,j,k] img[k,m]   (vertical interp, all columns)
      out[i,j] = sum_m Wx[i,j,m] G[i,j,m]   (horizontal pick)
    """
    ys = jnp.arange(H, dtype=jnp.float32)[:, None] + v
    xs = jnp.arange(W, dtype=jnp.float32)[None, :] + u
    cy = jnp.clip(ys, 0.0, H - 1.0)
    cx = jnp.clip(xs, 0.0, W - 1.0)
    y0 = jnp.floor(cy).astype(jnp.int32)
    x0 = jnp.floor(cx).astype(jnp.int32)
    fy = (cy - y0).astype(dtype)
    fx = (cx - x0).astype(dtype)

    k = jnp.arange(H, dtype=jnp.int32)
    Wy = ((k[None, None, :] == y0[:, :, None]).astype(dtype) * (1 - fy[:, :, None])
          + (k[None, None, :] == y0[:, :, None] + 1).astype(dtype) * fy[:, :, None])
    G = jnp.einsum("ijk,km->ijm", Wy, img.astype(dtype),
                   precision=lax.Precision.DEFAULT)           # (H, W, W)
    m = jnp.arange(W, dtype=jnp.int32)
    Wx = ((m[None, None, :] == x0[:, :, None]).astype(dtype) * (1 - fx[:, :, None])
          + (m[None, None, :] == x0[:, :, None] + 1).astype(dtype) * fx[:, :, None])
    return jnp.sum(Wx * G, axis=-1).astype(jnp.float32)


def warp_mm_exact_f32(img, u, v):
    return _mm_warp_exact(img, u, v, jnp.float32)


def warp_mm_exact_bf16(img, u, v):
    return _mm_warp_exact(img, u, v, jnp.bfloat16)


def _mm_warp_rowband(img, u, v, dtype, band=48):
    """Exact bilinear with a BANDED vertical window: for output row i, source
    rows are taken from a band [i - band, i + band] (flow |v| <= band).
    G intermediate shrinks H/W/(2*band) fold."""
    B = 2 * band
    ys = jnp.arange(H, dtype=jnp.float32)[:, None] + jnp.clip(v, -band + 1.0, band - 2.0)
    xs = jnp.arange(W, dtype=jnp.float32)[None, :] + u
    cy = jnp.clip(ys, 0.0, H - 1.0)
    cx = jnp.clip(xs, 0.0, W - 1.0)
    y0 = jnp.floor(cy).astype(jnp.int32)
    x0 = jnp.floor(cx).astype(jnp.int32)
    fy = (cy - y0).astype(dtype)
    fx = (cx - x0).astype(dtype)

    # band start per output row (static: row i uses rows [i-band, i+band))
    i_idx = jnp.arange(H, dtype=jnp.int32)[:, None]
    start = jnp.clip(i_idx - band, 0, H - B)                  # (H, 1)
    rel = y0 - start                                          # (H, W) in [0, B)
    k = jnp.arange(B, dtype=jnp.int32)
    Wy = ((k[None, None, :] == rel[:, :, None]).astype(dtype) * (1 - fy[:, :, None])
          + (k[None, None, :] == rel[:, :, None] + 1).astype(dtype) * fy[:, :, None])
    # banded image: bandimg[i, b, m] = img[start[i] + b, m] — built via gather
    # of row slices?? static strided construction: stack shifted copies
    sh = [jnp.roll(img, -s, axis=0) for s in range(0, 1)]  # placeholder no-op
    del sh
    # build with ONE small gather over rows (H*B row indices, cheap: gathers
    # whole rows each — index count H*B=27k but each pulls W elems... use
    # dynamic_slice per i? fallback: jnp.take over rows (27k row gathers)
    rows = jnp.take(img, (start + k[None, :]).reshape(-1), axis=0)
    bandimg = rows.reshape(H, B, W)
    G = jnp.einsum("ijb,ibm->ijm", Wy, bandimg.astype(dtype),
                   precision=lax.Precision.DEFAULT)
    m = jnp.arange(W, dtype=jnp.int32)
    Wx = ((m[None, None, :] == x0[:, :, None]).astype(dtype) * (1 - fx[:, :, None])
          + (m[None, None, :] == x0[:, :, None] + 1).astype(dtype) * fx[:, :, None])
    return jnp.sum(Wx * G, axis=-1).astype(jnp.float32)


def warp_mm_band_bf16(img, u, v):
    return _mm_warp_rowband(img, u, v, jnp.bfloat16)


a = np.asarray(warp_take4(img, u0, v0))
for f in (warp_mm_exact_f32, warp_mm_exact_bf16, warp_mm_band_bf16):
    b = np.asarray(f(img, u0, v0))
    err = np.abs(a[4:-4, 4:-4] - b[4:-4, 4:-4]).max()
    print(f"{f.__name__} parity max err {err:.2e}", flush=True)

timeit_op("warp take4 (440k pt idx)", warp_take4)
timeit_op("warp exact mm f32", warp_mm_exact_f32)
timeit_op("warp exact mm bf16", warp_mm_exact_bf16)
timeit_op("warp banded mm bf16 (band 48)", warp_mm_band_bf16)
