"""Batched local bundle adjustment: dense-Schur Levenberg-Marquardt on
padded windows.

Replaces g2o's sparse ``LocalBundleAdjustment`` (reference
``ORB_SLAM2/src/Optimizer.cc:453`` + ``Thirdparty/g2o``) with a fixed-shape
formulation built for the MXU:

- the window holds up to ``n_kf`` keyframe poses and ``n_pts`` points;
  observations are a flat padded table (kf idx, pt idx, uv, uR, level, valid);
- each LM iteration builds the full system via batched 2x2-block algebra:
  per-point 3x3 Hessians are inverted in closed form, the pose-pose Schur
  complement S = Hcc - Hcp Hpp^-1 Hpc is a (6 nkf, 6 nkf) dense matrix
  assembled with one-hot matmuls, solved with Cholesky, and points are
  back-substituted — no sparse graph, no pointer chasing;
- Huber robust weights + a chi2 outlier round, like the reference's two-stage
  optimize (5 + 10 iterations with outlier removal in between);
- Marquardt-scaled damping with monotone accept/reject (the role of g2o's
  ``OptimizationAlgorithmLevenberg``): each candidate step is evaluated on
  the robust total cost and REJECTED (lambda x10) if it increases it. Plain
  GN with fixed absolute damping diverges here: a near-zero-parallax far
  point leaves Hpp nearly singular along the ray, the 1e-4-damped solve
  takes ~1e4 m point steps, and the Schur coupling drags keyframe poses
  meters per iteration (measured on the stereo 10-frame sequence: keyframe
  centers at 1e2..1e8 m after the shutdown sweeps).

Gauge: pose 0 of the window (the oldest keyframe) is held fixed, like the
reference fixing keyframe 0 / out-of-window anchors.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sindslam_tpu.config import CameraConfig, TrackingConfig
from sindslam_tpu.geometry import se3

_HI = jax.lax.Precision.HIGHEST


class BAProblem(NamedTuple):
    poses: jnp.ndarray      # (K, 4, 4) Tcw
    points: jnp.ndarray     # (P, 3) world
    obs_kf: jnp.ndarray     # (M,) int32 keyframe index
    obs_pt: jnp.ndarray     # (M,) int32 point index
    obs_uv: jnp.ndarray     # (M, 2)
    obs_ur: jnp.ndarray     # (M,) virtual-right u or -1
    obs_level: jnp.ndarray  # (M,) int32
    obs_valid: jnp.ndarray  # (M,) bool
    fixed_mask: jnp.ndarray  # (K,) bool — poses held constant (gauge/anchors)


class BAResult(NamedTuple):
    poses: jnp.ndarray
    points: jnp.ndarray
    obs_inlier: jnp.ndarray  # (M,) bool post-optimization classification
    mean_chi2: jnp.ndarray
    packed: jnp.ndarray      # poses | points | mean_chi2 flattened f32 —
    #                          ONE device->host transfer (each transfer is a
    #                          ~21 ms tunnel round trip)


def unpack_ba_result(packed, n_poses: int, n_points: int):
    """Host decode of BAResult.packed -> (poses (K,4,4), points (P,3), chi2)."""
    import numpy as np

    k16 = n_poses * 16
    poses = packed[:k16].reshape(n_poses, 4, 4).copy()
    pts = packed[k16:k16 + 3 * n_points].reshape(n_points, 3).copy()
    return poses, pts, float(packed[-1])


def _inv3x3(A: jnp.ndarray) -> jnp.ndarray:
    """Closed-form batched 3x3 inverse (adjugate / det). ``jnp.linalg.inv``
    on a (P, 3, 3) batch lowers to a ~3 ms LAPACK-style custom call per GN
    iteration on this TPU runtime (r3 trace); the adjugate is pure
    element-wise work. Inputs are damped SPD blocks, so det > 0."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    c00 = e * i - f * h
    c01 = c * h - b * i
    c02 = b * f - c * e
    c10 = f * g - d * i
    c11 = a * i - c * g
    c12 = c * d - a * f
    c20 = d * h - e * g
    c21 = b * g - a * h
    c22 = a * e - b * d
    det = a * c00 + b * c10 + c * c20
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
    adj = jnp.stack([jnp.stack([c00, c01, c02], -1),
                     jnp.stack([c10, c11, c12], -1),
                     jnp.stack([c20, c21, c22], -1)], -2)
    return adj * inv_det[..., None, None]


def _project_residuals(problem: BAProblem, cam: CameraConfig,
                       kf1h: jnp.ndarray):
    """Shared projection model: per-observation residual r (M, 3), row
    validity, plus the intermediates the Jacobian needs. ONE definition —
    the LM acceptance cost (``_chi2_eval``) and the normal equations
    (``_residuals_jac``) must always evaluate the same objective, or a
    step that lowers the real cost can be rejected against a stale one."""
    # pose lookup via the K-one-hot matmul (K is tiny): poses[obs_kf] is an
    # M x 16-element scalar-unit gather per GN iteration otherwise
    T = jnp.einsum("mk,kab->mab", kf1h, problem.poses,
                   precision=_HI)                   # (M, 4, 4)
    pw = problem.points[problem.obs_pt]             # (M, 3)
    R = T[:, :3, :3]
    t = T[:, :3, 3]
    pc = jnp.einsum("mij,mj->mi", R, pw, precision=_HI) + t
    z_ok = pc[:, 2] > 1e-3
    iz = 1.0 / jnp.where(z_ok, pc[:, 2], 1.0)

    u = cam.fx * pc[:, 0] * iz + cam.cx
    v = cam.fy * pc[:, 1] * iz + cam.cy
    ur = u - cam.bf * iz
    has_stereo = problem.obs_ur >= 0
    r = jnp.stack([u - problem.obs_uv[:, 0], v - problem.obs_uv[:, 1],
                   jnp.where(has_stereo, ur - problem.obs_ur, 0.0)], axis=-1)
    row_valid = jnp.stack([z_ok, z_ok, z_ok & has_stereo], -1) & \
        problem.obs_valid[:, None]
    return r, row_valid, z_ok, pc, R, iz


def _residuals_jac(problem: BAProblem, cam: CameraConfig, inv_sigma2,
                   kf1h: jnp.ndarray):
    """Per-observation residual r (M, 3), row validity, chi2, and Jacobians
    J_pose (M, 3, 6), J_point (M, 3, 3)."""
    r, row_valid, z_ok, pc, R, iz = _project_residuals(problem, cam, kf1h)
    X, Y = pc[:, 0], pc[:, 1]
    iz2 = iz * iz

    du = jnp.stack([cam.fx * iz, jnp.zeros_like(iz), -cam.fx * X * iz2], -1)
    dv = jnp.stack([jnp.zeros_like(iz), cam.fy * iz, -cam.fy * Y * iz2], -1)
    dur = du + jnp.stack([jnp.zeros_like(iz), jnp.zeros_like(iz), cam.bf * iz2], -1)
    dproj = jnp.stack([du, dv, dur], axis=1)        # (M, 3, 3) d(.)/dpc

    eye = jnp.broadcast_to(jnp.eye(3), (pc.shape[0], 3, 3))
    dpc_dxi = jnp.concatenate([eye, -se3.hat(pc)], axis=-1)   # (M, 3, 6)
    J_pose = jnp.matmul(dproj, dpc_dxi, precision=_HI)        # (M, 3, 6)
    J_point = jnp.matmul(dproj, R, precision=_HI)             # (M, 3, 3)

    chi2 = jnp.sum(jnp.where(row_valid, r * r, 0.0), -1) * inv_sigma2
    return r, row_valid, chi2, J_pose, J_point


def _chi2_eval(problem: BAProblem, cam: CameraConfig, inv_sigma2):
    """Residual-only chi2 per observation + which rows the current state
    puts behind the camera (those rows carry NO chi2, so the LM acceptance
    test must penalize them explicitly or a step that pushes points behind
    the camera reads as cost 0). Same projection model as the normal
    equations (``_project_residuals``)."""
    K = problem.poses.shape[0]
    kf1h = (problem.obs_kf[:, None] == jnp.arange(K)[None, :]
            ).astype(jnp.float32)
    r, row_valid, z_ok, _pc, _R, _iz = _project_residuals(problem, cam, kf1h)
    chi2 = jnp.sum(jnp.where(row_valid, r * r, 0.0), -1) * inv_sigma2
    return chi2, z_ok


def _robust_cost(chi2, z_ok, active, delta):
    """Total Huber cost over active rows; behind-camera rows cost as if at
    the Huber cap with a large residual (keeps the LM merit function
    monotone-meaningful)."""
    sqrt_chi = jnp.sqrt(chi2 + 1e-12)
    rho = jnp.where(sqrt_chi <= delta, chi2,
                    2.0 * delta * sqrt_chi - delta * delta)
    bad = active & ~z_ok
    return (jnp.sum(jnp.where(active & z_ok, rho, 0.0))
            + 1e4 * jnp.sum(bad.astype(jnp.float32)))


def _perobs_blocks(problem: BAProblem, cam, cfg: TrackingConfig, inv_sigma2,
                   active, use_huber, kf1h):
    """Per-observation normal-equation blocks (Hcc_o, Hpp_o, Hcp_o, bc_o,
    bp_o) with Huber robust weights applied — shared by the local
    dense-Schur solver here and the joint matrix-free PCG global solver
    (``gba.py``)."""
    r, row_valid, chi2, Jc, Jp = _residuals_jac(problem, cam, inv_sigma2,
                                                kf1h)

    delta = jnp.where(problem.obs_ur >= 0, jnp.sqrt(cfg.chi2_stereo),
                      jnp.sqrt(cfg.chi2_mono))
    sqrt_chi = jnp.sqrt(chi2 + 1e-12)
    hw = jnp.where(sqrt_chi <= delta, 1.0, delta / sqrt_chi)
    hw = jnp.where(use_huber, hw, 1.0)
    w = active.astype(jnp.float32) * inv_sigma2 * hw
    rv = row_valid.astype(jnp.float32)
    Jc_m = Jc * rv[..., None]
    Jp_m = Jp * rv[..., None]
    r_m = r * rv

    Hcc_o = jnp.einsum("mri,mrj,m->mij", Jc_m, Jc_m, w, precision=_HI)  # (M,6,6)
    Hpp_o = jnp.einsum("mri,mrj,m->mij", Jp_m, Jp_m, w, precision=_HI)  # (M,3,3)
    Hcp_o = jnp.einsum("mri,mrj,m->mij", Jc_m, Jp_m, w, precision=_HI)  # (M,6,3)
    bc_o = jnp.einsum("mri,mr,m->mi", Jc_m, r_m, w, precision=_HI)      # (M,6)
    bp_o = jnp.einsum("mri,mr,m->mi", Jp_m, r_m, w, precision=_HI)      # (M,3)
    return Hcc_o, Hpp_o, Hcp_o, bc_o, bp_o, chi2


def _prior_residual(poses: jnp.ndarray, prior_poses: jnp.ndarray
                    ) -> jnp.ndarray:
    """(K, 6) left-tangent deviation of each pose from its solve-entry
    estimate: xi_k = log(Tcw_k inv(prior_k))."""
    return se3.se3_log(se3._mm(poses, se3.se3_inverse(prior_poses)))


def _gn_iteration(problem: BAProblem, cam, cfg: TrackingConfig, inv_sigma2,
                  active, use_huber, lam, prior_poses=None,
                  prior_w: float = 0.0):
    K = problem.poses.shape[0]
    P = problem.points.shape[0]
    kf1h = (problem.obs_kf[:, None] == jnp.arange(K)[None, :]
            ).astype(jnp.float32)
    Hcc_o, Hpp_o, Hcp_o, bc_o, bp_o, chi2 = _perobs_blocks(
        problem, cam, cfg, inv_sigma2, active, use_huber, kf1h)

    # scatter to per-pose blocks via a small one-hot matmul; per-point and
    # per-(point, pose) blocks via segment sums over M (16k) rows — a one-hot
    # over P=4096 points would be a 256 MB intermediate
    Hcc = jnp.einsum("mk,mij->kij", kf1h, Hcc_o, precision=_HI)   # (K,6,6)
    bc = jnp.einsum("mk,mi->ki", kf1h, bc_o, precision=_HI)       # (K,6)
    Hpp = jax.ops.segment_sum(Hpp_o.reshape(-1, 9), problem.obs_pt,
                              num_segments=P).reshape(P, 3, 3)
    bp = jax.ops.segment_sum(bp_o, problem.obs_pt, num_segments=P)

    # Marquardt-scaled damping (relative to the block diagonal — absolute
    # damping under-regularizes the near-singular along-ray direction of
    # low-parallax points) + a small absolute floor, then fixed poses
    eye3 = jnp.broadcast_to(jnp.eye(3), Hpp.shape)
    Hpp = Hpp + lam * Hpp * jnp.eye(3) + 1e-5 * eye3
    Hpp_inv = _inv3x3(Hpp)                                         # (P,3,3)

    free = ~problem.fixed_mask

    # Wp (P, K, 6, 3): pose-point coupling blocks, scattered by the joint
    # (point, keyframe) index.
    joint = problem.obs_pt * K + problem.obs_kf
    Wp = jax.ops.segment_sum(Hcp_o.reshape(-1, 18), joint,
                             num_segments=P * K).reshape(P, K, 6, 3)
    WHinv = jnp.einsum("pkij,pjl->pkil", Wp, Hpp_inv, precision=_HI)
    # Schur off-term as one (K6, P3) x (P3, K6) matmul
    A = WHinv.transpose(1, 2, 0, 3).reshape(K * 6, P * 3)
    B = Wp.transpose(0, 3, 1, 2).reshape(P * 3, K * 6)
    S_off = jnp.matmul(A, B, precision=_HI).reshape(K, 6, K, 6)
    S = -S_off
    S = S.at[jnp.arange(K), :, jnp.arange(K), :].add(Hcc)
    g = bc - jnp.einsum("pkil,pl->ki", WHinv, bp, precision=_HI)

    # flatten with fixed poses masked out (rows/cols zeroed, diag 1)
    S = S.reshape(K * 6, K * 6)
    g = g.reshape(K * 6)
    free6 = jnp.repeat(free, 6)
    if prior_poses is not None and prior_w > 0.0:
        # finite-weight gauge prior anchoring every pose to its solve-entry
        # estimate (VERDICT r4 #4): cost += w ||log(Tcw inv(prior))||^2.
        # Blocks the weakly-constrained window SLIDE (a near-null direction
        # where a decimeter of collective motion buys ~0.3 chi2) without
        # hard-freezing drifted anchors, which the r4 A/B showed locks
        # accumulated drift into the map (the reference's lFixedCameras
        # trade, Optimizer.cc:453-550; that mechanism remains available via
        # ba_max_fixed_anchors). First-order prior Jacobian = identity.
        r_pr = _prior_residual(problem.poses, prior_poses).reshape(K * 6)
        S = S + jnp.diag(jnp.where(free6, prior_w, 0.0))
        g = g + jnp.where(free6, prior_w * r_pr, 0.0)
    S = jnp.where(free6[:, None] & free6[None, :], S, 0.0)
    dS = jnp.diagonal(S)
    S = S + jnp.diag(jnp.where(free6, lam * dS + 1e-5, 1.0))
    g = jnp.where(free6, g, 0.0)
    dx_c = -jnp.linalg.solve(S, g).reshape(K, 6)
    dx_c = jnp.where(jnp.isfinite(dx_c), dx_c, 0.0)

    # back-substitute points: dx_p = -Hpp^-1 (bp + W^T dx_c)
    Wt_dxc = jnp.einsum("pkij,ki->pj", Wp, dx_c, precision=_HI)
    dx_p = -jnp.einsum("pij,pj->pi", Hpp_inv, bp + Wt_dxc, precision=_HI)
    dx_p = jnp.where(jnp.isfinite(dx_p), dx_p, 0.0)

    new_poses = se3._mm(se3.se3_exp(dx_c), problem.poses)
    new_poses = jnp.where(problem.fixed_mask[:, None, None], problem.poses,
                          new_poses)
    # only move points that actually have observations
    pt_seen = jax.ops.segment_sum(active.astype(jnp.float32), problem.obs_pt,
                                  num_segments=P) > 0
    new_points = jnp.where(pt_seen[:, None], problem.points + dx_p,
                           problem.points)
    return problem._replace(poses=new_poses, points=new_points), chi2


@functools.partial(jax.jit, static_argnames=("cam", "cfg"))
def local_bundle_adjustment(problem: BAProblem, cam: CameraConfig,
                            cfg: TrackingConfig) -> BAResult:
    """Two-stage robust LM (parity: Optimizer.cc:453 — 5 iters, outlier
    removal, 10 more iters; monotone acceptance is g2o's Levenberg loop)."""
    inv_sigma2 = (1.0 / 1.2 ** 2) ** problem.obs_level.astype(jnp.float32)
    active = problem.obs_valid
    delta = jnp.where(problem.obs_ur >= 0, jnp.sqrt(cfg.chi2_stereo),
                      jnp.sqrt(cfg.chi2_mono))
    # gauge prior: anchor to the poses the window ENTERED the solve with
    prior_poses = problem.poses
    prior_w = float(getattr(cfg, "ba_pose_prior_weight", 0.0))
    free_pose = ~problem.fixed_mask

    def total_cost(prob, chi2, z_ok, active):
        cost = _robust_cost(chi2, z_ok, active, delta)
        if prior_w > 0.0:
            r_pr = _prior_residual(prob.poses, prior_poses)
            cost = cost + prior_w * jnp.sum(
                jnp.where(free_pose[:, None], r_pr * r_pr, 0.0))
        return cost

    def run(problem, active, n_iters, use_huber):
        chi2_0, z_ok0 = _chi2_eval(problem, cam, inv_sigma2)
        cost0 = total_cost(problem, chi2_0, z_ok0, active)

        def it(carry, _):
            prob, lam, cost = carry
            cand, _ = _gn_iteration(prob, cam, cfg, inv_sigma2, active,
                                    use_huber, lam, prior_poses=prior_poses,
                                    prior_w=prior_w)
            chi2_n, z_ok_n = _chi2_eval(cand, cam, inv_sigma2)
            cost_n = total_cost(cand, chi2_n, z_ok_n, active)
            ok = cost_n < cost
            prob = prob._replace(
                poses=jnp.where(ok, cand.poses, prob.poses),
                points=jnp.where(ok, cand.points, prob.points))
            lam = jnp.clip(jnp.where(ok, lam * (1.0 / 3.0), lam * 10.0),
                           1e-8, 1e6)
            cost = jnp.where(ok, cost_n, cost)
            return (prob, lam, cost), None

        # g2o's Levenberg initializes lambda = tau * max(diag H) with
        # tau=1e-5; the relative damping here plays the diag(H) role, so
        # lam0=1e-5 starts near-GN (the old absolute 1e-4 damping behaved
        # like GN too) and the monotone reject (x10) is what bounds the
        # low-parallax blow-up — NOT a heavy initial damping, which costs
        # convergence inside the fixed 5+10 iteration budget.
        (problem, _, _), _ = jax.lax.scan(
            it, (problem, jnp.float32(1e-5), cost0), None, length=n_iters)
        chi2, _ = _chi2_eval(problem, cam, inv_sigma2)
        return problem, chi2

    problem, chi2 = run(problem, active, 5, True)
    thresh = jnp.where(problem.obs_ur >= 0, cfg.chi2_stereo, cfg.chi2_mono)
    active = active & (chi2 <= thresh * 2.0)
    problem, chi2 = run(problem, active, cfg.ba_iterations, True)
    inliers = active & (chi2 <= thresh)
    mean_chi2 = jnp.sum(jnp.where(inliers, chi2, 0.0)) / \
        jnp.maximum(jnp.sum(inliers), 1)
    packed = jnp.concatenate([
        problem.poses.reshape(-1), problem.points.reshape(-1),
        mean_chi2.reshape(1)]).astype(jnp.float32)
    return BAResult(poses=problem.poses, points=problem.points,
                    obs_inlier=inliers, mean_chi2=mean_chi2, packed=packed)
