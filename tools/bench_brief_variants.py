"""Time + exactness of BRIEF sample-selection variants on the real TPU.

Variants:
  A. current: (B,512,PP) one-hot einsum at DEFAULT precision (bf16 — the
     round-4 descriptor-noise bug) then bin select.
  B. same einsums at HIGHEST precision.
  C. decomposed: per-keypoint integer row/col offset tables selected by a
     tiny HIGHEST one-hot over bins, then a row/col bilinear one-hot against
     the (N,P,P) patches at HIGHEST — exact f32, ~1 GFLOP.
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

from sindslam_tpu.frontend import orb
from sindslam_tpu.ops import image as im
from sindslam_tpu.ops.pallas_kernels import extract_patches_pallas
from tools.diff_orb_tpu import make_image

P = orb._PATCH
B = orb._N_ANGLE_BINS


def binned_yx_tables():
    """(B, 512) int32 row / col offsets (0..P-1) inside the patch."""
    pat = orb._PATTERN.astype(np.float64)
    xs = np.concatenate([pat[:, 0], pat[:, 2]])
    ys = np.concatenate([pat[:, 1], pat[:, 3]])
    c0 = P // 2
    ty = np.zeros((B, 512), np.int32)
    tx = np.zeros((B, 512), np.int32)
    for b in range(B):
        a = 2.0 * np.pi * b / B
        ca, sa = np.cos(a), np.sin(a)
        ty[b] = (np.round(xs * sa + ys * ca) + c0).astype(np.int32)
        tx[b] = (np.round(xs * ca - ys * sa) + c0).astype(np.int32)
    return ty, tx


TY, TX = binned_yx_tables()


def variant_a(pf, bins):
    table = jnp.asarray(orb._binned_offset_table())
    M = (table[:, :, None] == jnp.arange(P * P)[None, None, :]
         ).astype(jnp.float32)
    S = jnp.einsum("bse,ne->nbs", M, pf, precision=lax.Precision.DEFAULT)
    oh = (bins[:, None] == jnp.arange(B)[None, :]).astype(jnp.float32)
    return jnp.einsum("nbs,nb->ns", S, oh, precision=lax.Precision.DEFAULT)


def variant_b(pf, bins):
    table = jnp.asarray(orb._binned_offset_table())
    M = (table[:, :, None] == jnp.arange(P * P)[None, None, :]
         ).astype(jnp.float32)
    S = jnp.einsum("bse,ne->nbs", M, pf, precision=lax.Precision.HIGHEST)
    oh = (bins[:, None] == jnp.arange(B)[None, :]).astype(jnp.float32)
    return jnp.einsum("nbs,nb->ns", S, oh, precision=lax.Precision.HIGHEST)


def variant_c(patches, bins):
    oh = (bins[:, None] == jnp.arange(B)[None, :]).astype(jnp.float32)
    ty = jnp.einsum("nb,bs->ns", oh, jnp.asarray(TY, jnp.float32),
                    precision=lax.Precision.HIGHEST)
    tx = jnp.einsum("nb,bs->ns", oh, jnp.asarray(TX, jnp.float32),
                    precision=lax.Precision.HIGHEST)
    tyi = ty.astype(jnp.int32)
    txi = tx.astype(jnp.int32)
    R = (tyi[:, :, None] == jnp.arange(P)[None, None, :]).astype(jnp.float32)
    A = jnp.einsum("nsr,nrc->nsc", R, patches,
                   precision=lax.Precision.HIGHEST)       # (N,512,P)
    C = (txi[:, :, None] == jnp.arange(P)[None, None, :]).astype(jnp.float32)
    return jnp.sum(A * C, axis=-1)                        # (N,512)


def bench(fn, *args, iters=20):
    f = jax.jit(fn)
    out = f(*args)
    np.asarray(out)  # force readback (block_until_ready is a no-op here)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters * 1e3, np.asarray(out)


def main():
    print("backend:", jax.default_backend())
    img = jnp.asarray(make_image())
    blur = im.gaussian_blur(img, 7, 2.0)
    rng = np.random.RandomState(1)
    n = 1000
    ys = rng.randint(20, 460, size=n)
    xs = rng.randint(20, 620, size=n)
    yx = jnp.asarray(np.stack([ys, xs], -1).astype(np.int32))
    bins = jnp.asarray(rng.randint(0, B, size=n).astype(np.int32))
    h, w = blur.shape
    c0 = P // 2
    y0 = jnp.clip(yx[:, 0] - c0, 0, h - P)
    x0 = jnp.clip(yx[:, 1] - c0, 0, w - P)
    patches = extract_patches_pallas(blur, y0, x0, patch=P,
                                     group=125 if n % 125 == 0 else 1)
    pf = patches.reshape(n, P * P)

    # exact reference
    pfn = np.asarray(pf)
    table = np.asarray(orb._binned_offset_table())
    s_exact = np.take_along_axis(pfn, table[np.asarray(bins)], axis=1)

    for name, fn, args in [("A default", variant_a, (pf, bins)),
                           ("B highest", variant_b, (pf, bins)),
                           ("C decomposed", variant_c, (patches, bins))]:
        try:
            ms, out = bench(fn, *args)
            err = np.abs(out - s_exact).max()
            bits_a = out[:, :256] < out[:, 256:]
            bits_e = s_exact[:, :256] < s_exact[:, 256:]
            flips = (bits_a != bits_e).sum(1)
            print(f"{name:14s} {ms:8.2f} ms  maxerr {err:10.4f}  "
                  f"mean bitflips {flips.mean():.2f}")
        except Exception as e:  # noqa
            print(f"{name:14s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
