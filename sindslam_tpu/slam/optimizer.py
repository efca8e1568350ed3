"""Batched Gauss-Newton / Levenberg-Marquardt optimizers in JAX.

Replaces the reference's g2o pointer-graph solvers
(``ORB_SLAM2/src/Optimizer.cc`` + ``Thirdparty/g2o``) with dense, fixed-shape
batched linear algebra:

- :func:`pose_optimization` — pose-only GN with Huber robust weights and the
  reference's 4-round chi2 outlier re-classification
  (parity: ``Optimizer.cc:239-451``, ``VertexSE3Expmap`` + mono/stereo edges).
- :func:`local_bundle_adjustment` — windowed BA over padded keyframe/point
  tensors with on-manifold GN and Schur complement on the point block
  (parity: ``Optimizer.cc:453``), in slam/ba.py.

Pose convention: ``Tcw`` maps world -> camera; updates are left-multiplicative
``Tcw <- exp(dx) Tcw`` with tangent ``[rho, phi]`` (see geometry/se3.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from sindslam_tpu.config import CameraConfig, TrackingConfig
from sindslam_tpu.geometry import se3

_HI = jax.lax.Precision.HIGHEST


class PoseOptResult(NamedTuple):
    Tcw: jnp.ndarray        # (4, 4) optimized pose
    inliers: jnp.ndarray    # (N,) bool final inlier classification
    n_inliers: jnp.ndarray  # scalar int32
    chi2: jnp.ndarray       # (N,) final per-observation chi2


def _project_residuals(Tcw, pts_w, obs_uv, obs_ur, inv_sigma2, cam: CameraConfig):
    """Residuals r (N, 3), row-validity (N, 3), chi2 (N,), Jacobians J (N, 3, 6).

    Rows 0-1: mono reprojection (u, v); row 2: virtual-right ``uR`` (only for
    observations with obs_ur >= 0 — the RGB-D 'stereo' formulation,
    reference ``src/Frame.cc:714-735`` / stereo edges in PoseOptimization).
    """
    R = Tcw[:3, :3]
    t = Tcw[:3, 3]
    # HIGHEST: a bare @ runs bf16 on the TPU MXU — ~0.4% relative rounding
    # of the camera-frame points (≈ mm-cm at scene depth) fed straight into
    # the GN residuals (one of the real-TPU long-horizon drift sources,
    # r5: TPU odometry drifted 2.2x CPU with exact ORB kernels).
    pc = jnp.matmul(pts_w, R.T, precision=_HI) + t           # (N, 3)
    X, Y, Z = pc[:, 0], pc[:, 1], pc[:, 2]
    z_ok = Z > 1e-3
    Zs = jnp.where(z_ok, Z, 1.0)
    iz = 1.0 / Zs
    iz2 = iz * iz

    u = cam.fx * X * iz + cam.cx
    v = cam.fy * Y * iz + cam.cy
    ur = u - cam.bf * iz

    has_stereo = obs_ur >= 0
    r = jnp.stack([u - obs_uv[:, 0], v - obs_uv[:, 1],
                   jnp.where(has_stereo, ur - obs_ur, 0.0)], axis=-1)

    # d(u,v,ur)/d pc
    du = jnp.stack([cam.fx * iz, jnp.zeros_like(iz), -cam.fx * X * iz2], axis=-1)
    dv = jnp.stack([jnp.zeros_like(iz), cam.fy * iz, -cam.fy * Y * iz2], axis=-1)
    dur = du + jnp.stack([jnp.zeros_like(iz), jnp.zeros_like(iz), cam.bf * iz2], axis=-1)
    dproj = jnp.stack([du, dv, dur], axis=1)   # (N, 3, 3)

    # d pc / d xi = [I | -hat(pc)]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), (pc.shape[0], 3, 3))
    dpc = jnp.concatenate([eye, -se3.hat(pc)], axis=-1)  # (N, 3, 6)
    J = jnp.matmul(dproj, dpc, precision=_HI)            # (N, 3, 6)

    row_valid = jnp.stack([z_ok, z_ok, z_ok & has_stereo], axis=-1)
    chi2 = jnp.sum(jnp.where(row_valid, r * r, 0.0), axis=-1) * inv_sigma2
    return r, row_valid, chi2, J


def pose_optimization(
    Tcw_init: jnp.ndarray,
    pts_w: jnp.ndarray,        # (N, 3) world points
    obs_uv: jnp.ndarray,       # (N, 2) observed pixels
    obs_ur: jnp.ndarray,       # (N,) virtual-right u, or -1 for mono
    obs_level: jnp.ndarray,    # (N,) int32 pyramid level of the observation
    valid: jnp.ndarray,        # (N,) bool match validity
    cam: CameraConfig,
    cfg: TrackingConfig,
    scale_factor: float = 1.2,
) -> PoseOptResult:
    """Pose-only robust GN, fully batched and jittable.

    Mirrors the reference loop structure: ``pose_opt_rounds`` rounds of
    ``pose_opt_iters`` GN steps; between rounds, observations with chi2 above
    the (stereo/mono) threshold are classified outliers and removed; in the
    final round the Huber kernel is dropped for inliers (like g2o's
    ``setRobustKernel(0)`` on the last rounds).
    """
    inv_sigma2 = (1.0 / scale_factor ** 2) ** obs_level.astype(jnp.float32)
    delta_mono = jnp.sqrt(cfg.chi2_mono)
    delta_stereo = jnp.sqrt(cfg.chi2_stereo)

    def gn_round(carry, round_idx):
        Tcw, active = carry
        use_huber = round_idx < (cfg.pose_opt_rounds - 2)

        def gn_step(Tcw, _):
            r, row_valid, chi2, J = _project_residuals(
                Tcw, pts_w, obs_uv, obs_ur, inv_sigma2, cam)
            has_stereo = obs_ur >= 0
            delta = jnp.where(has_stereo, delta_stereo, delta_mono)
            sqrt_chi = jnp.sqrt(chi2 + 1e-12)
            huber_w = jnp.where(sqrt_chi <= delta, 1.0, delta / sqrt_chi)
            huber_w = jnp.where(use_huber, huber_w, 1.0)
            w = (active & valid).astype(jnp.float32) * inv_sigma2 * huber_w
            wr = w[:, None, None] * jnp.where(row_valid[..., None], J, 0.0)
            H = jnp.einsum("nri,nrj->ij", wr, jnp.where(row_valid[..., None], J, 0.0),
                           precision=_HI)
            b = jnp.einsum("nri,nr->i", wr, jnp.where(row_valid, r, 0.0),
                           precision=_HI)
            H = H + 1e-6 * jnp.eye(6, dtype=H.dtype)
            dx = -jnp.linalg.solve(H, b)
            dx = jnp.where(jnp.all(jnp.isfinite(dx)), dx, jnp.zeros(6))
            return se3._mm(se3.se3_exp(dx[None])[0], Tcw), None

        Tcw, _ = jax.lax.scan(gn_step, Tcw, None, length=cfg.pose_opt_iters)

        # re-classify outliers for the next round
        _, _, chi2, _ = _project_residuals(Tcw, pts_w, obs_uv, obs_ur, inv_sigma2, cam)
        thresh = jnp.where(obs_ur >= 0, cfg.chi2_stereo, cfg.chi2_mono)
        active = valid & (chi2 <= thresh)
        return (Tcw, active), None

    (Tcw, active), _ = jax.lax.scan(
        gn_round, (Tcw_init, valid), jnp.arange(cfg.pose_opt_rounds))
    _, _, chi2, _ = _project_residuals(Tcw, pts_w, obs_uv, obs_ur, inv_sigma2, cam)
    return PoseOptResult(Tcw=Tcw, inliers=active,
                         n_inliers=jnp.sum(active), chi2=chi2)


pose_optimization_jit = jax.jit(
    pose_optimization, static_argnames=("cam", "cfg", "scale_factor"))
