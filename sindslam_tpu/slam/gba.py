"""Joint full-map bundle adjustment: matrix-free PCG on the Schur complement.

The role of the reference's ``Optimizer::GlobalBundleAdjustemnt``
(``ORB_SLAM2/src/Optimizer.cc:41-126``, called from
``LoopClosing::RunGlobalBundleAdjustment`` at loop closure and
``System::Shutdown``): ONE joint solve over every keyframe and map point,
so loop-closure error is distributed globally instead of leaking through
the seams of overlapping local windows (``local_map.py::run_global_ba``'s
sweep fallback).

TPU-first shape: the reduced camera system ``S = Hcc - W Hpp^-1 W^T`` is
never materialized — at 128 keyframes x 16k points the coupling tensor
W alone would be ~600 MB. Instead each preconditioned-conjugate-gradient
iteration applies S matrix-free with two passes over the flat observation
table (segment-sums + batched 6x3 block einsums), exactly the
ITERATIVE_SCHUR strategy large-scale BA solvers use, and a natural fit for
XLA: every op is a fixed-shape batched contraction, no sparse indices.

- per-observation blocks come from ``ba.py::_perobs_blocks`` (shared with
  the local dense-Schur solver);
- preconditioner: the EXACT block diagonal of S — each (keyframe, point)
  pair has at most one observation, so ``S_kk = Hcc_k - sum_m Hcp_o[m]
  Hpp^-1[pt(m)] Hcp_o[m]^T`` accumulates per-observation without the joint
  (point, keyframe) scatter the local solver uses;
- Levenberg-Marquardt outer loop with monotone accept/reject on the robust
  Huber cost, same scheme as ``ba.py::local_bundle_adjustment`` (the role
  of g2o's ``OptimizationAlgorithmLevenberg``);
- gauge: ``fixed_mask`` poses (keyframe 0 + padding) are held exactly, via
  row/col masking inside the PCG operator.

Capacities are static (jit shapes); ``local_map.py::run_global_ba`` buckets
the live map into power-of-two capacities so recompiles are bounded.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from sindslam_tpu.config import CameraConfig, TrackingConfig
from sindslam_tpu.geometry import se3
from sindslam_tpu.slam.ba import (BAProblem, BAResult, _chi2_eval, _inv3x3,
                                  _perobs_blocks, _robust_cost)

_HI = jax.lax.Precision.HIGHEST


def _inv6x6_spd(M: jnp.ndarray) -> jnp.ndarray:
    """Batched 6x6 SPD inverse by 2x2-of-3x3 block Schur, built on the
    closed-form ``_inv3x3`` — ``jnp.linalg.inv`` on a (K,6,6) batch lowers
    to a LAPACK-style custom call on this TPU runtime (see the ``_inv3x3``
    docstring); the blockwise form is pure element-wise/matmul work."""
    A = M[..., :3, :3]
    B = M[..., :3, 3:]
    D = M[..., 3:, 3:]
    Ai = _inv3x3(A)
    AiB = jnp.matmul(Ai, B, precision=_HI)                    # (K,3,3)
    S = D - jnp.matmul(jnp.swapaxes(B, -1, -2), AiB, precision=_HI)
    Si = _inv3x3(S)
    TR = -jnp.matmul(AiB, Si, precision=_HI)
    TL = Ai - jnp.matmul(TR, jnp.swapaxes(AiB, -1, -2), precision=_HI)
    BL = jnp.swapaxes(TR, -1, -2)
    top = jnp.concatenate([TL, TR], axis=-1)
    bot = jnp.concatenate([BL, Si], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _lm_step(problem: BAProblem, cam, cfg: TrackingConfig, inv_sigma2,
             active, use_huber, lam, kf1h, n_cg: int):
    """One LM candidate step: build blocks, PCG-solve the reduced camera
    system, back-substitute points. Returns the candidate problem."""
    K = problem.poses.shape[0]
    P = problem.points.shape[0]
    obs_kf, obs_pt = problem.obs_kf, problem.obs_pt

    Hcc_o, Hpp_o, Hcp_o, bc_o, bp_o, _ = _perobs_blocks(
        problem, cam, cfg, inv_sigma2, active, use_huber, kf1h)

    # keyframe-axis reductions ride the MXU as one-hot matmuls (CLAUDE.md:
    # segment_sum serializes on the TPU scalar unit for small bin counts);
    # point-axis reductions stay segment_sums over the element axis (P is
    # large, a one-hot would be M x P)
    Hcc = jnp.einsum("mk,mij->kij", kf1h, Hcc_o, precision=_HI)   # (K,6,6)
    bc = jnp.einsum("mk,mi->ki", kf1h, bc_o, precision=_HI)       # (K,6)
    Hpp = jax.ops.segment_sum(Hpp_o.reshape(-1, 9), obs_pt,
                              num_segments=P).reshape(P, 3, 3)
    bp = jax.ops.segment_sum(bp_o, obs_pt, num_segments=P)

    # Marquardt damping on the full-H diagonal BEFORE the Schur reduction
    # (g2o damps H, not S) + absolute floors for zero-observation padding
    eye3 = jnp.eye(3)
    eye6 = jnp.eye(6)
    Hpp_d = Hpp + lam * Hpp * eye3 + 1e-5 * eye3
    Hpp_inv = _inv3x3(Hpp_d)                                      # (P,3,3)
    diag6 = jnp.diagonal(Hcc, axis1=-2, axis2=-1)                 # (K,6)
    Hcc_d = Hcc + (lam * diag6 + 1e-5)[..., None] * eye6

    free = ~problem.fixed_mask                                    # (K,)
    freeK = free[:, None].astype(jnp.float32)                     # (K,1)

    def Wt_apply(xc):
        """W^T x: (K,6) -> (P,3) via one pass over observations. The
        per-observation pose lookup is a kf1h matmul, not an (M,6) gather
        — this runs n_cg x n_iters times per solve."""
        x_m = jnp.einsum("mk,ki->mi", kf1h, xc, precision=_HI)    # (M,6)
        t = jnp.einsum("mij,mi->mj", Hcp_o, x_m, precision=_HI)   # (M,3)
        return jax.ops.segment_sum(t, obs_pt, num_segments=P)

    def W_apply(vp):
        """W v: (P,3) -> (K,6) via one pass over observations."""
        v_m = vp[obs_pt]                                          # (M,3)
        z = jnp.einsum("mij,mj->mi", Hcp_o, v_m, precision=_HI)   # (M,6)
        return jnp.einsum("mk,mi->ki", kf1h, z, precision=_HI)

    def S_apply(xc):
        """S x = (Hcc_d - W Hpp_d^-1 W^T) x, fixed poses clamped to 0."""
        xc = xc * freeK
        y = jnp.einsum("kij,kj->ki", Hcc_d, xc, precision=_HI)
        u = Wt_apply(xc)
        v = jnp.einsum("pij,pj->pi", Hpp_inv, u, precision=_HI)
        return (y - W_apply(v)) * freeK

    # reduced gradient and PCG right-hand side (solve S dx = -g)
    v0 = jnp.einsum("pij,pj->pi", Hpp_inv, bp, precision=_HI)
    g = bc - W_apply(v0)
    b = -g * freeK

    # exact S block diagonal for the preconditioner: each (kf, pt) pair has
    # at most one observation, so the per-pair coupling block IS the
    # per-observation block
    Hpi_m = Hpp_inv[obs_pt]                                       # (M,3,3)
    t1 = jnp.einsum("mij,mjl->mil", Hcp_o, Hpi_m, precision=_HI)  # (M,6,3)
    term = jnp.einsum("mil,mkl->mik", t1, Hcp_o, precision=_HI)   # (M,6,6)
    Sdiag = Hcc_d - jnp.einsum("mk,mij->kij", kf1h, term,
                               precision=_HI)
    Sdiag = jnp.where(free[:, None, None], Sdiag, eye6) + 1e-6 * eye6
    Minv = _inv6x6_spd(Sdiag)                                     # (K,6,6)

    def prec(rr):
        return jnp.einsum("kij,kj->ki", Minv, rr, precision=_HI) * freeK

    x = jnp.zeros((K, 6), jnp.float32)
    r = b
    z = prec(r)
    p = z
    rz = jnp.sum(r * z)

    def cg_it(carry, _):
        x, r, p, rz = carry
        Ap = S_apply(p)
        denom = jnp.sum(p * Ap)
        live = (rz > 1e-12) & (denom > 1e-20)
        alpha = jnp.where(live, rz / jnp.where(denom > 0, denom, 1.0), 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = prec(r)
        rz_n = jnp.sum(r * z)
        beta = jnp.where(live, rz_n / jnp.where(rz > 0, rz, 1.0), 0.0)
        p = z + beta * p
        return (x, r, p, rz_n), None

    (x, _, _, _), _ = jax.lax.scan(cg_it, (x, r, p, rz), None, length=n_cg)
    dx_c = jnp.where(jnp.isfinite(x), x, 0.0)

    # back-substitute points: dx_p = -Hpp^-1 (bp + W^T dx_c)
    u = bp + Wt_apply(dx_c)
    dx_p = -jnp.einsum("pij,pj->pi", Hpp_inv, u, precision=_HI)
    dx_p = jnp.where(jnp.isfinite(dx_p), dx_p, 0.0)

    new_poses = se3._mm(se3.se3_exp(dx_c), problem.poses)
    new_poses = jnp.where(problem.fixed_mask[:, None, None], problem.poses,
                          new_poses)
    pt_seen = jax.ops.segment_sum(active.astype(jnp.float32), obs_pt,
                                  num_segments=P) > 0
    new_points = jnp.where(pt_seen[:, None], problem.points + dx_p,
                           problem.points)
    return problem._replace(poses=new_poses, points=new_points)


@functools.partial(jax.jit,
                   static_argnames=("cam", "cfg", "n_iters", "n_cg"))
def joint_global_ba(problem: BAProblem, cam: CameraConfig,
                    cfg: TrackingConfig, n_iters: int = 20,
                    n_cg: int = 100) -> BAResult:
    """Joint robust LM over the whole map (parity: Optimizer.cc:41 — the
    reference's GlobalBundleAdjustemnt runs ``nIterations`` Huber-robust
    iterations with NO mid-solve outlier trim, unlike LocalBA's two-stage).
    The trim matters here: right after a loop closure the loop
    co-observations carry the largest residuals in the problem — a local-BA
    style chi2 trim after a few (inexact-Newton) iterations removes exactly
    the constraints the global solve exists to enforce, and the chain
    relaxes back to its drifted shape with near-zero residual (measured:
    120-keyframe loop, trim left 33 mm RMSE where the untrimmed solve
    converges below 0.1 mm). Outliers are classified once at the end, for
    reporting only."""
    K = problem.poses.shape[0]
    kf1h = (problem.obs_kf[:, None] == jnp.arange(K)[None, :]
            ).astype(jnp.float32)
    inv_sigma2 = (1.0 / 1.2 ** 2) ** problem.obs_level.astype(jnp.float32)
    active = problem.obs_valid
    delta = jnp.where(problem.obs_ur >= 0, jnp.sqrt(cfg.chi2_stereo),
                      jnp.sqrt(cfg.chi2_mono))

    def run(problem, active, n, use_huber):
        chi2_0, z_ok0 = _chi2_eval(problem, cam, inv_sigma2)
        cost0 = _robust_cost(chi2_0, z_ok0, active, delta)

        def it(carry, _):
            prob, lam, cost = carry
            cand = _lm_step(prob, cam, cfg, inv_sigma2, active, use_huber,
                            lam, kf1h, n_cg)
            chi2_n, z_ok_n = _chi2_eval(cand, cam, inv_sigma2)
            cost_n = _robust_cost(chi2_n, z_ok_n, active, delta)
            ok = cost_n < cost
            prob = prob._replace(
                poses=jnp.where(ok, cand.poses, prob.poses),
                points=jnp.where(ok, cand.points, prob.points))
            lam = jnp.clip(jnp.where(ok, lam * (1.0 / 3.0), lam * 10.0),
                           1e-8, 1e6)
            cost = jnp.where(ok, cost_n, cost)
            return (prob, lam, cost), None

        (problem, _, _), _ = jax.lax.scan(
            it, (problem, jnp.float32(1e-5), cost0), None, length=n)
        chi2, _ = _chi2_eval(problem, cam, inv_sigma2)
        return problem, chi2

    problem, chi2 = run(problem, active, n_iters, True)
    thresh = jnp.where(problem.obs_ur >= 0, cfg.chi2_stereo, cfg.chi2_mono)
    inliers = active & (chi2 <= thresh)
    mean_chi2 = jnp.sum(jnp.where(inliers, chi2, 0.0)) / \
        jnp.maximum(jnp.sum(inliers), 1)
    packed = jnp.concatenate([
        problem.poses.reshape(-1), problem.points.reshape(-1),
        mean_chi2.reshape(1)]).astype(jnp.float32)
    return BAResult(poses=problem.poses, points=problem.points,
                    obs_inlier=inliers, mean_chi2=mean_chi2, packed=packed)
