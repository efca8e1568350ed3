"""SE(3) pose-graph optimization: batched GN with autodiff edge Jacobians.

Replaces g2o's ``OptimizeEssentialGraph`` (reference
``ORB_SLAM2/src/Optimizer.cc:781``, Sim3 vertices + edges). For RGB-D the
scale is observable, so like the reference (``bFixScale=true`` for RGB-D) the
graph is pure SE(3). Edges carry measured relative poses (covisibility +
spanning-tree + loop edges); the residual per edge is

    r = log( T_meas^-1  ·  Tcw_i · Tcw_j^-1 )   in R^6

and Jacobians w.r.t. the left-multiplicative tangent of both endpoint poses
are the first-order adjoints (Ji = Adj(T_meas^-1), Jj = -Adj(T_meas^-1 T_ij)),
relinearized each GN iteration — autodiff through the matrix log NaNs at the
arccos boundary, so the analytic form is used. Fully batched over edges.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sindslam_tpu.geometry import se3

_HI = jax.lax.Precision.HIGHEST


class PoseGraph(NamedTuple):
    poses: jnp.ndarray      # (K, 4, 4) Tcw
    edge_i: jnp.ndarray     # (E,) int32
    edge_j: jnp.ndarray     # (E,) int32
    edge_T: jnp.ndarray     # (E, 4, 4) measured Tcw_i @ inv(Tcw_j)
    edge_w: jnp.ndarray     # (E,) float32 weights (0 disables)
    fixed: jnp.ndarray      # (K,) bool


def _edge_terms(Ti, Tj, T_meas):
    """Residual r = log(T_meas^-1 Ti Tj^-1) and analytic Jacobians.

    First-order perturbation calculus for Tcw_i <- exp(xi_i) Tcw_i:
      T_meas^-1 exp(xi_i) T_ij = exp(Adj(T_meas^-1) xi_i) (T_meas^-1 T_ij)
      => Ji = Adj(T_meas^-1)
    and Tcw_j <- exp(xi_j) Tcw_j gives T_ij exp(-xi_j):
      exp(r^) exp(-xi_j) => Jj = -Adj(T_meas^-1 T_ij) (~ -I near convergence).
    """
    T_ij = se3._mm(Ti, se3.se3_inverse(Tj[None])[0])
    E = se3._mm(se3.se3_inverse(T_meas[None])[0], T_ij)
    r = se3.se3_log(E[None])[0]
    Ji = se3.adjoint(se3.se3_inverse(T_meas[None])[0][None])[0]
    Jj = -se3.adjoint(E[None])[0]
    return r, Ji, Jj


@functools.partial(jax.jit, static_argnames=("n_iters",))
def optimize_pose_graph(graph: PoseGraph, n_iters: int = 20,
                        damping: float = 1e-5) -> jnp.ndarray:
    """Returns optimized (K, 4, 4) poses.

    Levenberg loop (the reference's ``OptimizeEssentialGraph`` runs g2o's
    ``OptimizationAlgorithmLevenberg``, ``Optimizer.cc:822``): each GN
    candidate step is accepted only if it lowers the total weighted edge
    cost; a rejected step re-tries with 10x the damping. Same monotone
    scheme as ``ba.py`` — fixed-damping GN diverged there on a
    near-singular Hessian, and a post-loop pose graph starts far from the
    linearization point (the loop edge's residual is the whole accumulated
    drift)."""
    K = graph.poses.shape[0]

    terms_fn = jax.vmap(_edge_terms)

    def total_cost(poses):
        Ti = poses[graph.edge_i]
        Tj = poses[graph.edge_j]
        r, _Ji, _Jj = terms_fn(Ti, Tj, graph.edge_T)
        return jnp.sum(graph.edge_w * jnp.sum(r * r, axis=-1))

    def gn_step(carry, _):
        poses, lam, cost = carry
        Ti = poses[graph.edge_i]
        Tj = poses[graph.edge_j]
        r, Ji, Jj = terms_fn(Ti, Tj, graph.edge_T)            # (E,6),(E,6,6)x2

        w = graph.edge_w
        # assemble H (K6, K6) and b (K6) with one-hot matmuls over E edges
        onehot_i = (graph.edge_i[:, None] == jnp.arange(K)[None, :]
                    ).astype(jnp.float32)
        onehot_j = (graph.edge_j[:, None] == jnp.arange(K)[None, :]
                    ).astype(jnp.float32)
        # stacked per-edge jacobian against the full state: J_e (E, 6, K*6)
        # implemented blockwise to stay small: H = sum_e w_e J_e^T J_e
        Jiw = Ji * w[:, None, None]
        Jjw = Jj * w[:, None, None]

        # block placement via (E, K) one-hots on both sides (K is small)
        Hii = jnp.einsum("ea,eij,eb->aibj", onehot_i,
                         jnp.einsum("eri,erj->eij", Ji, Ji, precision=_HI)
                         * w[:, None, None], onehot_i, precision=_HI)
        Hjj = jnp.einsum("ea,eij,eb->aibj", onehot_j,
                         jnp.einsum("eri,erj->eij", Jj, Jj, precision=_HI)
                         * w[:, None, None], onehot_j, precision=_HI)
        Hij = jnp.einsum("ea,eij,eb->aibj", onehot_i,
                         jnp.einsum("eri,erj->eij", Ji, Jj, precision=_HI)
                         * w[:, None, None], onehot_j, precision=_HI)
        H = (Hii + Hjj + Hij + jnp.swapaxes(jnp.swapaxes(Hij, 0, 2), 1, 3)
             ).reshape(K * 6, K * 6)
        bi = jnp.einsum("ea,eri,er->ai", onehot_i, Jiw, r, precision=_HI)
        bj = jnp.einsum("ea,eri,er->ai", onehot_j, Jjw, r, precision=_HI)
        b = (bi + bj).reshape(K * 6)

        free6 = jnp.repeat(~graph.fixed, 6)
        H = jnp.where(free6[:, None] & free6[None, :], H, 0.0)
        dH = jnp.diagonal(H)
        H = H + jnp.diag(jnp.where(free6, lam * dH + damping, 1.0))
        b = jnp.where(free6, b, 0.0)
        dx = -jnp.linalg.solve(H, b).reshape(K, 6)
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
        new_poses = se3._mm(se3.se3_exp(dx), poses)
        new_poses = jnp.where(graph.fixed[:, None, None], poses, new_poses)

        cost_n = total_cost(new_poses)
        ok = cost_n < cost
        poses = jnp.where(ok, new_poses, poses)
        lam = jnp.clip(jnp.where(ok, lam * (1.0 / 3.0), lam * 10.0),
                       1e-8, 1e6)
        cost = jnp.where(ok, cost_n, cost)
        return (poses, lam, cost), None

    carry0 = (graph.poses, jnp.float32(1e-5), total_cost(graph.poses))
    (poses, _, _), _ = jax.lax.scan(gn_step, carry0, None, length=n_iters)
    return poses


# ---------------------------------------------------------------- Sim(3)

def _edge_terms_sim3(Si, Sj, S_meas):
    """7-DoF residual r = log_sim3(S_meas^-1 Si Sj^-1) + first-order adjoint
    Jacobians (the Sim3 essential graph of the reference's monocular mode,
    ``Optimizer.cc:781`` with ``bFixScale=false``)."""
    from sindslam_tpu.geometry import sim3 as s3

    S_ij = s3._mm(Si, s3.sim3_inverse(Sj[None])[0])
    E = s3._mm(s3.sim3_inverse(S_meas[None])[0], S_ij)
    r = s3.sim3_log(E[None])[0]
    Ji = s3.sim3_adjoint(s3.sim3_inverse(S_meas[None])[0][None])[0]
    Jj = -s3.sim3_adjoint(E[None])[0]
    return r, Ji, Jj


@functools.partial(jax.jit, static_argnames=("n_iters",))
def optimize_pose_graph_sim3(graph: PoseGraph, n_iters: int = 25,
                             damping: float = 1e-5) -> jnp.ndarray:
    """Sim(3) essential-graph optimization: poses/edges are [[sR, t], [0, 1]]
    matrices; returns optimized (K, 4, 4) Sim3 poses. Same Levenberg
    accept/reject structure as the SE(3) solver, with 7-dim tangents so
    SCALE drift distributes around the loop (monocular parity:
    ``OptimizeEssentialGraph`` with ``bFixScale=false``)."""
    from sindslam_tpu.geometry import sim3 as s3

    K = graph.poses.shape[0]
    D = 7
    terms_fn = jax.vmap(_edge_terms_sim3)

    def total_cost(poses):
        r, _Ji, _Jj = terms_fn(poses[graph.edge_i], poses[graph.edge_j],
                               graph.edge_T)
        return jnp.sum(graph.edge_w * jnp.sum(r * r, axis=-1))

    def gn_step(carry, _):
        poses, lam, cost = carry
        r, Ji, Jj = terms_fn(poses[graph.edge_i], poses[graph.edge_j],
                             graph.edge_T)
        w = graph.edge_w
        onehot_i = (graph.edge_i[:, None] == jnp.arange(K)[None, :]
                    ).astype(jnp.float32)
        onehot_j = (graph.edge_j[:, None] == jnp.arange(K)[None, :]
                    ).astype(jnp.float32)
        Jiw = Ji * w[:, None, None]
        Jjw = Jj * w[:, None, None]
        Hii = jnp.einsum("ea,eij,eb->aibj", onehot_i,
                         jnp.einsum("eri,erj->eij", Ji, Ji, precision=_HI)
                         * w[:, None, None], onehot_i, precision=_HI)
        Hjj = jnp.einsum("ea,eij,eb->aibj", onehot_j,
                         jnp.einsum("eri,erj->eij", Jj, Jj, precision=_HI)
                         * w[:, None, None], onehot_j, precision=_HI)
        Hij = jnp.einsum("ea,eij,eb->aibj", onehot_i,
                         jnp.einsum("eri,erj->eij", Ji, Jj, precision=_HI)
                         * w[:, None, None], onehot_j, precision=_HI)
        H = (Hii + Hjj + Hij + jnp.swapaxes(jnp.swapaxes(Hij, 0, 2), 1, 3)
             ).reshape(K * D, K * D)
        bi = jnp.einsum("ea,eri,er->ai", onehot_i, Jiw, r, precision=_HI)
        bj = jnp.einsum("ea,eri,er->ai", onehot_j, Jjw, r, precision=_HI)
        b = (bi + bj).reshape(K * D)

        freeD = jnp.repeat(~graph.fixed, D)
        H = jnp.where(freeD[:, None] & freeD[None, :], H, 0.0)
        dH = jnp.diagonal(H)
        H = H + jnp.diag(jnp.where(freeD, lam * dH + damping, 1.0))
        b = jnp.where(freeD, b, 0.0)
        dx = -jnp.linalg.solve(H, b).reshape(K, D)
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
        new_poses = s3._mm(s3.sim3_exp(dx), poses)
        new_poses = jnp.where(graph.fixed[:, None, None], poses, new_poses)

        cost_n = total_cost(new_poses)
        ok = cost_n < cost
        poses = jnp.where(ok, new_poses, poses)
        lam = jnp.clip(jnp.where(ok, lam * (1.0 / 3.0), lam * 10.0),
                       1e-8, 1e6)
        cost = jnp.where(ok, cost_n, cost)
        return (poses, lam, cost), None

    carry0 = (graph.poses, jnp.float32(1e-5), total_cost(graph.poses))
    (poses, _, _), _ = jax.lax.scan(gn_step, carry0, None, length=n_iters)
    return poses
