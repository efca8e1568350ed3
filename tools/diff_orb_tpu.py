"""Real-TPU golden-path diff for the ORB Pallas/MXU paths.

The round-4 known issue: long-horizon tracking on the TPU backend drifts
2-4x faster than CPU despite interpret-mode parity tests. This tool
quantifies per-stage TPU-vs-exact differences on the REAL backend:

  1. descriptor bits: _brief_descriptors_mm (angle-binned one-hot matmuls)
     vs _brief_descriptors_gather (exact scalar gathers) on the same
     keypoints/angles — Hamming distance distribution.
  2. FAST scores: fast_nms_pallas vs the XLA fast_score_map+NMS path —
     corner set overlap and score deltas.
  3. patches: extract_patches_pallas vs the HIGHEST-precision one-hot
     einsum — max abs error.

Run on the TPU host: python tools/diff_orb_tpu.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from sindslam_tpu.utils import setup_compilation_cache

setup_compilation_cache()


def make_image(h=480, w=640, seed=0):
    """Textured synthetic image with smooth + sharp structure."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = (
        96.0
        + 60.0 * np.sin(xx / 23.0) * np.cos(yy / 31.0)
        + 40.0 * ((xx // 40 + yy // 40) % 2)
    )
    img += rng.randn(h, w).astype(np.float32) * 6.0
    return np.clip(img, 0, 255).astype(np.float32)


def main():
    backend = jax.default_backend()
    print(f"backend: {backend}")
    from sindslam_tpu.frontend import orb
    from sindslam_tpu.ops import image as im

    img = jnp.asarray(make_image())
    blur = im.gaussian_blur(img, 7, 2.0)

    # keypoints: grid + jitter, interior only
    rng = np.random.RandomState(1)
    n = 1000
    ys = rng.randint(20, 460, size=n)
    xs = rng.randint(20, 620, size=n)
    yx = jnp.asarray(np.stack([ys, xs], -1).astype(np.int32))
    ang = jnp.asarray(rng.uniform(-np.pi, np.pi, size=n).astype(np.float32))

    # quantize angles to the bin centers so the gather path samples the SAME
    # rotated offsets as the binned tables (isolates numeric error from the
    # <=0.7px binning approximation)
    tau = 2.0 * np.pi / orb._N_ANGLE_BINS
    bins = jnp.mod(jnp.round(ang / tau).astype(jnp.int32), orb._N_ANGLE_BINS)
    ang_q = bins.astype(jnp.float32) * tau

    d_mm = np.asarray(orb._brief_descriptors_mm(blur, yx, ang_q))
    d_gt = np.asarray(orb._brief_descriptors_gather(blur, yx, ang_q))
    ham = np.zeros(n, np.int64)
    for k in range(8):
        ham += np.vectorize(lambda v: bin(v).count("1"))(
            d_mm[:, k] ^ d_gt[:, k])
    print(f"[descriptors] mean Hamming mm-vs-gather: {ham.mean():.2f} bits, "
          f"p95 {np.percentile(ham, 95):.0f}, max {ham.max()}, "
          f"frac>8: {(ham > 8).mean():.3f}")

    # patches
    from sindslam_tpu.ops.pallas_kernels import extract_patches_pallas
    P = orb._PATCH
    c0 = P // 2
    h, w = blur.shape
    y0 = jnp.clip(yx[:, 0] - c0, 0, h - P)
    x0 = jnp.clip(yx[:, 1] - c0, 0, w - P)
    pp = np.asarray(extract_patches_pallas(blur, y0, x0, patch=P, group=125
                                           if n % 125 == 0 else 1))
    # exact reference: numpy slicing
    bl = np.asarray(blur)
    y0n, x0n = np.asarray(y0), np.asarray(x0)
    pg = np.stack([bl[a:a + P, b:b + P] for a, b in zip(y0n, x0n)])
    print(f"[patches] max |pallas - exact|: {np.abs(pp - pg).max():.6f}")

    # FAST
    from sindslam_tpu.ops.pallas_kernels import fast_nms_pallas
    s_pal = np.asarray(fast_nms_pallas(img, 7.0, 20.0))
    s_lo = orb.fast_score_map(img, 7.0)
    s_hi = jnp.where(s_lo > 20.0, s_lo, 0.0)
    sa = jnp.where(s_hi > 0, s_hi + 1000.0, s_lo)
    s_xla = np.asarray(orb._nms3(sa))
    in_p = s_pal > 0
    in_x = s_xla > 0
    # margin: ignore 19px border (downstream margin) where wrap semantics differ
    m = np.zeros_like(in_p)
    m[19:-19, 19:-19] = True
    inter = (in_p & in_x & m).sum()
    union = ((in_p | in_x) & m).sum()
    both = in_p & in_x & m
    sd = np.abs(s_pal - s_xla)[both]
    print(f"[fast] corner IoU (interior): {inter / max(union, 1):.4f}  "
          f"score maxdiff on common corners: {sd.max() if sd.size else 0:.4f}")

    # end-to-end: full extract_orb descriptor stability across the two
    # backends is covered by tools/profile_tpu_mask_drift.py-style runs;
    # here report the in-path mm einsum precision directly:
    pf = pp.reshape(n, P * P)
    table = np.asarray(orb._binned_offset_table())
    samp_exact = np.take_along_axis(
        np.broadcast_to(pf[:, None, :], (n, 1, P * P)),
        table[np.asarray(bins)][:, None, :], axis=2)[:, 0, :]
    bits_exact = (samp_exact[:, :256] < samp_exact[:, 256:])
    d_ex = np.asarray(orb._pack_bits(jnp.asarray(bits_exact.astype(np.uint32))))
    ham2 = np.zeros(n, np.int64)
    for k in range(8):
        ham2 += np.vectorize(lambda v: bin(v).count("1"))(
            d_mm[:, k] ^ d_ex[:, k])
    print(f"[descriptors] mean Hamming mm-vs-exact-table: {ham2.mean():.2f} "
          f"bits (isolates einsum precision; 0 = exact)")


if __name__ == "__main__":
    main()
