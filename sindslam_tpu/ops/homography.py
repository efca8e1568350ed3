"""Batched homography estimation (DLT + fixed-size RANSAC) in JAX.

Replaces the reference's ``cv::findHomography(..., cv::RHO)`` call
(``ORB_SLAM2/src/DynaDetect.cc:1235``) with a TPU-native formulation: a fixed
number of minimal 4-point hypotheses solved in one batched SVD, scored against
all correspondences in one matmul-shaped pass, followed by a weighted
least-squares refit on the best hypothesis' inliers. Everything is static
shape; invalid correspondences carry zero weight.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _normalize_points(pts: jnp.ndarray, w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Hartley normalization (similarity T s.t. centroid 0, mean dist sqrt2).

    pts: (N, 2); w: (N,) weights (0 = invalid). Returns (pts_norm, T (3, 3)).
    """
    wsum = jnp.sum(w) + 1e-9
    mean = jnp.sum(pts * w[:, None], axis=0) / wsum
    d = jnp.sqrt(jnp.sum((pts - mean) ** 2, axis=-1))
    scale = jnp.sqrt(2.0) / (jnp.sum(d * w) / wsum + 1e-9)
    T = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    T = T.at[0, 0].set(scale).at[1, 1].set(scale)
    T = T.at[0, 2].set(-scale * mean[0]).at[1, 2].set(-scale * mean[1])
    return (pts - mean) * scale, T


def dlt_homography(src: jnp.ndarray, dst: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Weighted DLT: estimate H (3, 3) with dst ~ H src from (N, 2) pairs.

    Solves min ||W A h|| via SVD of the (2N, 9) design matrix. Weights w (N,)
    gate invalid rows. Hartley-normalized for conditioning.
    """
    src_n, T_s = _normalize_points(src, w)
    dst_n, T_d = _normalize_points(dst, w)
    x, y = src_n[:, 0], src_n[:, 1]
    u, v = dst_n[:, 0], dst_n[:, 1]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    row1 = jnp.stack([-x, -y, -one, zero, zero, zero, u * x, u * y, u], axis=-1)
    row2 = jnp.stack([zero, zero, zero, -x, -y, -one, v * x, v * y, v], axis=-1)
    A = jnp.concatenate([row1 * w[:, None], row2 * w[:, None]], axis=0)
    # h = nullspace direction of A = smallest eigenvector of A^T A. (A thin
    # SVD of the 8x9 minimal system would NOT contain the nullspace vector —
    # its row space has rank <= 8 — so we use the 9x9 normal matrix, which is
    # also far cheaper to batch on TPU. Hartley normalization keeps the
    # squared conditioning acceptable in f32.)
    AtA = jnp.matmul(A.T, A, precision=jax.lax.Precision.HIGHEST)
    _, eigvecs = jnp.linalg.eigh(AtA)
    h = eigvecs[:, 0]
    Hn = h.reshape(3, 3)
    H = jnp.linalg.solve(T_d, jnp.matmul(
        Hn, T_s, precision=jax.lax.Precision.HIGHEST))
    return H / (H[2, 2] + 1e-12)


def _solve8(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """8x8 linear solve by Gauss-Jordan with partial pivoting, written with
    batched-friendly ops only (vmap over RANSAC hypotheses turns this into
    pure element-wise/vector work — LAPACK-style LU on tiny batched systems
    serializes badly on TPU)."""
    M = jnp.concatenate([A, b[:, None]], axis=1)          # (8, 9)
    rows = jnp.arange(8)
    for k in range(8):
        col = jnp.abs(M[:, k])
        col = jnp.where(rows >= k, col, -1.0)
        piv = jnp.argmax(col)
        perm = jnp.where(rows == k, piv,
                         jnp.where(rows == piv, k, rows))
        # one-hot permutation matmul, not M[perm]: vmapped over 512 RANSAC
        # hypotheses the row gather lowered to 8 x 36k-element scalar-unit
        # gathers (~2.5 ms/frame, r3 trace); the (8, 8) x (8, 9) matmul is
        # exact (single 1.0 per row) and rides the MXU
        P = (rows[None, :] == perm[:, None]).astype(M.dtype)
        M = jnp.matmul(P, M, precision=jax.lax.Precision.HIGHEST)
        pivot_row = M[k] / (M[k, k] + 1e-20)
        factors = M[:, k].at[k].set(0.0)
        M = M - factors[:, None] * pivot_row[None, :]
        M = M.at[k].set(pivot_row)
    return M[:, 8]


def dlt4_homography(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Minimal 4-point homography via an 8x8 linear solve with h33 = 1.

    Much faster than the nullspace eigendecomposition when batched over
    hundreds of RANSAC hypotheses (LU solve vs QR iteration on TPU). The
    h33=0 degenerate configuration does not occur for camera-motion
    homographies near identity; a non-finite result is scored out by RANSAC.
    src, dst: (4, 2). Returns (3, 3).
    """
    # normalize for conditioning
    ms = jnp.mean(src, axis=0)
    md = jnp.mean(dst, axis=0)
    ss = jnp.sqrt(2.0) / (jnp.mean(jnp.linalg.norm(src - ms, axis=-1)) + 1e-9)
    sd = jnp.sqrt(2.0) / (jnp.mean(jnp.linalg.norm(dst - md, axis=-1)) + 1e-9)
    sn = (src - ms) * ss
    dn = (dst - md) * sd
    x, y = sn[:, 0], sn[:, 1]
    u, v = dn[:, 0], dn[:, 1]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    rows_u = jnp.stack([x, y, one, zero, zero, zero, -u * x, -u * y], axis=-1)
    rows_v = jnp.stack([zero, zero, zero, x, y, one, -v * x, -v * y], axis=-1)
    A = jnp.concatenate([rows_u, rows_v], axis=0)            # (8, 8)
    b = jnp.concatenate([u, v], axis=0)                      # (8,)
    h = _solve8(A, b)
    Hn = jnp.concatenate([h, jnp.ones((1,), h.dtype)]).reshape(3, 3)
    T_s = jnp.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])
    T_s = T_s.at[0, 0].set(ss).at[1, 1].set(ss).at[0, 2].set(-ss * ms[0]).at[1, 2].set(-ss * ms[1])
    T_d_inv = jnp.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])
    T_d_inv = T_d_inv.at[0, 0].set(1.0 / sd).at[1, 1].set(1.0 / sd).at[0, 2].set(md[0]).at[1, 2].set(md[1])
    H = jnp.matmul(T_d_inv, jnp.matmul(Hn, T_s,
                                       precision=jax.lax.Precision.HIGHEST),
                   precision=jax.lax.Precision.HIGHEST)
    return H / (H[2, 2] + 1e-12)


def apply_homography(H: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """(…, 3, 3) x (N, 2) -> (…, N, 2).

    precision=HIGHEST: pixel coordinates reach 640, where a bf16 MXU pass
    quantizes to ~2 px — the same order as the RANSAC inlier threshold
    (r3: this skewed hypothesis scoring on TPU vs CPU).
    """
    ones = jnp.ones(pts.shape[:-1] + (1,), pts.dtype)
    ph = jnp.concatenate([pts, ones], axis=-1)
    out = jnp.matmul(ph, jnp.swapaxes(H, -1, -2),
                     precision=jax.lax.Precision.HIGHEST)
    return out[..., :2] / (out[..., 2:3] + 1e-12)


@functools.partial(jax.jit, static_argnames=("n_hypotheses",))
def ransac_homography(
    src: jnp.ndarray, dst: jnp.ndarray, weights: jnp.ndarray,
    key: jax.Array, thresh_px: float = 1.5, n_hypotheses: int = 512,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fixed-size batched RANSAC.

    src, dst: (N, 2) correspondences; weights: (N,) sampling/validity weights
    (0 disables a correspondence entirely, larger = more likely seed — this is
    the TPU replacement for the reference's weight-sorted RHO input,
    ``src/DynaDetect.cc:1217-1235``).

    Returns (H (3, 3), inlier_mask (N,) bool). All shapes static: every
    hypothesis is a 4-point DLT, solved in one vmapped SVD batch and scored
    with symmetric-free forward transfer error.
    """
    n = src.shape[0]
    logw = jnp.log(weights + 1e-12)

    # Gumbel-top-4 per hypothesis: weighted sampling without replacement.
    g = jax.random.gumbel(key, (n_hypotheses, n)) + logw[None, :]
    _, idx = jax.lax.top_k(g, 4)                       # (n_hyp, 4)

    src4 = src[idx]                                     # (n_hyp, 4, 2)
    dst4 = dst[idx]

    H_all = jax.vmap(dlt4_homography)(src4, dst4)       # (n_hyp, 3, 3)

    # score: forward transfer error on all N points
    proj = apply_homography(H_all, src)                 # (n_hyp, N, 2)
    err2 = jnp.sum((proj - dst[None]) ** 2, axis=-1)    # (n_hyp, N)
    valid = (weights > 0)[None, :]
    inl = (err2 < thresh_px * thresh_px) & valid
    # degenerate hypotheses (NaNs) score zero
    finite = jnp.all(jnp.isfinite(H_all), axis=(-1, -2))
    score = jnp.sum(inl, axis=-1) * finite
    best = jnp.argmax(score)
    H_best = H_all[best]
    inliers = inl[best]

    # refit on inliers (weighted full DLT), then recompute inliers once
    H_ref = dlt_homography(src, dst, inliers.astype(src.dtype))
    proj_r = apply_homography(H_ref, src)
    err2_r = jnp.sum((proj_r - dst) ** 2, axis=-1)
    inl_r = (err2_r < thresh_px * thresh_px) & (weights > 0)
    better = (jnp.sum(inl_r) >= jnp.sum(inliers)) & jnp.all(jnp.isfinite(H_ref))
    H_out = jnp.where(better, H_ref, H_best)
    inl_out = jnp.where(better, inl_r, inliers)
    return H_out, inl_out


def homography_flow(H: jnp.ndarray, height: int, width: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dense flow field induced by H over an (height, width) pixel grid:
    flow(x) = H(x) - x. Used to compensate camera motion
    (reference ``src/DynaDetect.cc:1252-1267``)."""
    ys = jnp.arange(height, dtype=jnp.float32)
    xs = jnp.arange(width, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)
    # elementwise multiply-adds (VPU, exact f32), NOT a (H*W, 3) @ (3, 3)
    # matmul: the bf16 MXU pass puts ~1-2.5 px of quantization on the
    # compensation field at image-scale coordinates — the residual `mag`
    # then drowns the 1.7 px low threshold in numeric noise (r3 TPU-vs-CPU
    # mask drift, tools/profile_tpu_mask_drift.py)
    qx = H[0, 0] * gx + H[0, 1] * gy + H[0, 2]
    qy = H[1, 0] * gx + H[1, 1] * gy + H[1, 2]
    qz = H[2, 0] * gx + H[2, 1] * gy + H[2, 2]
    return qx / (qz + 1e-12) - gx, qy / (qz + 1e-12) - gy
