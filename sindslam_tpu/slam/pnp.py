"""Depth-free PnP RANSAC: batched 6-point DLT pose hypotheses + robust GN.

The role of the reference's ``PnPsolver`` (EPnP + RANSAC,
``ORB_SLAM2/src/PnPsolver.cc:1-1022``, used by ``Tracking::Relocalization``,
``Tracking.cc:357``): recover a camera pose from 2D-3D correspondences with
NO pose prior — the relocalization path a kidnapped camera (RGB-D or mono)
needs, where robust-GN-from-a-candidate-pose fails because the candidate
pose is far.

TPU-native formulation: instead of EPnP's per-iteration control-point
algebra, every RANSAC hypothesis solves the 6-point DLT for the full 3x4
projection (in intrinsics-normalized coordinates) as one batched SVD of a
(n_hyp, 12, 12) stack — the minimal solver is itself a dense batched linear
problem, so hundreds of hypotheses cost one dispatch. R is recovered by
Procrustes orthogonalization, cheirality fixes the sign, inliers are scored
by reprojection, and the best hypothesis is polished by the shared robust GN
pose optimizer.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from sindslam_tpu.config import CameraConfig, TrackingConfig
from sindslam_tpu.geometry import se3

_HI = jax.lax.Precision.HIGHEST


def _dlt_pose(X: jnp.ndarray, xn: jnp.ndarray) -> jnp.ndarray:
    """6-point DLT: world points X (6, 3), normalized image points xn (6, 2)
    -> Tcw (4, 4). Solves A p = 0 for the 3x4 projection P = [R|t] up to
    scale, then orthogonalizes."""
    zeros = jnp.zeros((6,))
    ones = jnp.ones((6,))
    Xh = jnp.concatenate([X, ones[:, None]], axis=1)          # (6, 4)
    u = xn[:, 0]
    v = xn[:, 1]
    ru = jnp.concatenate([Xh, jnp.zeros((6, 4)), -u[:, None] * Xh], axis=1)
    rv = jnp.concatenate([jnp.zeros((6, 4)), Xh, -v[:, None] * Xh], axis=1)
    A = jnp.concatenate([ru, rv], axis=0)                     # (12, 12)
    # null vector of A: right-singular vector of the smallest singular value
    _u, _s, vt = jnp.linalg.svd(A)
    p = vt[-1]
    P = p.reshape(3, 4)
    R0 = P[:, :3]
    # cheirality: a valid pose puts the (front-of-camera by construction)
    # points at positive depth; the null vector's sign is arbitrary
    depth_sign = jnp.sign(jnp.sum(jnp.sign(
        jnp.matmul(Xh, P[2], precision=_HI))) + 0.5)
    P = P * depth_sign
    R0 = P[:, :3]
    U, S, Vt = jnp.linalg.svd(R0)
    d = jnp.sign(jnp.linalg.det(jnp.matmul(U, Vt, precision=_HI)))
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0]).at[2].set(d))
    R = jnp.matmul(jnp.matmul(U, D, precision=_HI), Vt, precision=_HI)
    # for an exact solution P = s [R|t]: singular values are all |s| and
    # det(R0) = s^3, so the signed scale is sign(det) * mean(S)
    scale = jnp.sign(jnp.linalg.det(R0)) * jnp.mean(S)
    t = P[:, 3] / jnp.where(jnp.abs(scale) > 1e-9, scale, 1.0)
    return jnp.eye(4).at[:3, :3].set(R).at[:3, 3].set(t)


@functools.partial(jax.jit, static_argnames=("cam", "n_hyp"))
def ransac_pnp(pts_w: jnp.ndarray, uv: jnp.ndarray, valid: jnp.ndarray,
               cam: CameraConfig, key: jax.Array, thresh_px: float = 5.0,
               n_hyp: int = 256) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pose from 2D-3D pairs with no prior. Returns (Tcw, inlier mask).

    pts_w (N, 3) world points; uv (N, 2) pixel observations; valid (N,).
    """
    n = pts_w.shape[0]
    xn = jnp.stack([(uv[:, 0] - cam.cx) / cam.fx,
                    (uv[:, 1] - cam.cy) / cam.fy], axis=-1)
    # 6 distinct valid samples per hypothesis (gumbel top-k over validity)
    g = jax.random.gumbel(key, (n_hyp, n)) + jnp.where(valid, 0.0, -1e9)[None]
    _, idx = jax.lax.top_k(g, 6)
    T_all = jax.vmap(_dlt_pose)(pts_w[idx], xn[idx])          # (H, 4, 4)

    pc = jnp.einsum("hij,nj->hni", T_all[:, :3, :3], pts_w,
                    precision=_HI) + T_all[:, None, :3, 3]
    z_ok = pc[..., 2] > 1e-3
    iz = 1.0 / jnp.where(z_ok, pc[..., 2], 1.0)
    pu = cam.fx * pc[..., 0] * iz + cam.cx
    pv = cam.fy * pc[..., 1] * iz + cam.cy
    err2 = (pu - uv[None, :, 0]) ** 2 + (pv - uv[None, :, 1]) ** 2
    inl = z_ok & (err2 < thresh_px * thresh_px) & valid[None]
    finite = jnp.all(jnp.isfinite(T_all), axis=(-1, -2))
    score = jnp.sum(inl, axis=-1) * finite
    best = jnp.argmax(score)
    return T_all[best], inl[best]


def relocalize_pnp(pts_w, uv, valid, cam: CameraConfig, cfg: TrackingConfig,
                   key: jax.Array, ur=None, levels=None,
                   min_inliers: int = 12):
    """RANSAC init + robust GN polish (the PnPsolver + PoseOptimization
    pairing the reference's relocalization runs, ``Tracking.cc:357-420``).
    Returns (Tcw (4, 4) jnp, n_inliers int) or (None, 0)."""
    import numpy as np

    from sindslam_tpu.slam.optimizer import pose_optimization

    T0, inl = ransac_pnp(pts_w, uv, valid, cam, key)
    n_ransac = int(jnp.sum(inl))
    if n_ransac < min_inliers:
        return None, 0
    if ur is None:
        ur = -jnp.ones(uv.shape[0])
    if levels is None:
        levels = jnp.zeros(uv.shape[0], jnp.int32)
    opt = pose_optimization(T0, pts_w, uv, jnp.where(valid, ur, -1.0),
                            levels, valid, cam, cfg)
    return opt.Tcw, int(opt.n_inliers)
