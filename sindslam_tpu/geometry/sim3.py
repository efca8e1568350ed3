"""Sim(3) — similarity transforms for monocular loop closing.

The reference's monocular pipeline closes loops over Sim(3): scale drift is
unobservable in mono, so ``Sim3Solver`` estimates (s, R, t) between loop
keyframes (``ORB_SLAM2/src/Sim3Solver.cc``) and ``OptimizeEssentialGraph``
optimizes a Sim3 pose graph (``Optimizer.cc:781``, ``bFixScale=false``).

Representation: S = [[s*R, t], [0, 1]] as a (4, 4) matrix; tangent is the
7-vector [rho(3), phi(3), sigma(1)] with s = exp(sigma).

The translation coupling matrix W (t = W rho in exp) is evaluated as the
series W = sum_n X^n / (n+1)! with X = sigma*I + hat(phi): sigma*I commutes
with everything, so exp(X) = s * R exactly and the series is uniformly valid
in BOTH small-angle and small-scale regimes — no regime-split Taylor
branches (the closed form needs four of them). 24 Horner terms keep the
error below f32 round-off for |phi| <= pi, |sigma| <= 1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sindslam_tpu.geometry.se3 import _mm, hat, so3_exp, so3_log

_N_TERMS = 24


def _w_matrix(phi: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """W(phi, sigma) = integral_0^1 exp(u*(sigma I + hat(phi))) du, batched.
    phi (..., 3), sigma (...,) -> (..., 3, 3)."""
    X = hat(phi) + sigma[..., None, None] * jnp.eye(3, dtype=phi.dtype)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), X.shape)
    # Horner: W = I/1! + X/2! + X^2/3! + ... = sum X^n/(n+1)!
    W = eye / float(_N_TERMS + 1)
    for n in range(_N_TERMS - 1, 0, -1):
        W = eye + _mm(X, W) / float(n + 1)
    return W


def sim3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """(..., 7) [rho, phi, sigma] -> (..., 4, 4) [[sR, t], [0, 1]]."""
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    R = so3_exp(phi)
    s = jnp.exp(sigma)
    W = _w_matrix(phi, sigma)
    t = (_mm(W, rho[..., None]))[..., 0]
    T = jnp.zeros(xi.shape[:-1] + (4, 4), dtype=xi.dtype)
    T = T.at[..., :3, :3].set(s[..., None, None] * R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def sim3_log(S: jnp.ndarray) -> jnp.ndarray:
    """(..., 4, 4) -> (..., 7) [rho, phi, sigma]."""
    sR = S[..., :3, :3]
    t = S[..., :3, 3]
    det = jnp.linalg.det(sR)
    s = jnp.cbrt(jnp.maximum(det, 1e-30))
    R = sR / s[..., None, None]
    phi = so3_log(R)
    sigma = jnp.log(s)
    W = _w_matrix(phi, sigma)
    rho = jnp.linalg.solve(W, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)


def sim3_inverse(S: jnp.ndarray) -> jnp.ndarray:
    """[[sR, t], [0, 1]]^-1 = [[(1/s)R^T, -(1/s)R^T t], [0, 1]]."""
    sR = S[..., :3, :3]
    t = S[..., :3, 3]
    s2 = jnp.sum(sR[..., 0, :] * sR[..., 0, :], axis=-1)      # s^2
    inv_sRT = jnp.swapaxes(sR, -1, -2) / s2[..., None, None]  # (1/s) R^T
    ti = -(_mm(inv_sRT, t[..., None]))[..., 0]
    out = jnp.zeros_like(S)
    out = out.at[..., :3, :3].set(inv_sRT)
    out = out.at[..., :3, 3].set(ti)
    out = out.at[..., 3, 3].set(1.0)
    return out


def sim3_adjoint(S: jnp.ndarray) -> jnp.ndarray:
    """Adj(S) (..., 7, 7) with tangent ordering [rho, phi, sigma]:

        [ sR   hat(t) R   -t ]
        [ 0       R        0 ]
        [ 0       0        1 ]

    (Sophus Sim3::Adj; validated numerically against
    log(S exp(x) S^-1) in tests/test_sim3.py.)"""
    sR = S[..., :3, :3]
    t = S[..., :3, 3]
    s = jnp.cbrt(jnp.maximum(jnp.linalg.det(sR), 1e-30))
    R = sR / s[..., None, None]
    A = jnp.zeros(S.shape[:-2] + (7, 7), dtype=S.dtype)
    A = A.at[..., :3, :3].set(sR)
    A = A.at[..., :3, 3:6].set(_mm(hat(t), R))
    A = A.at[..., :3, 6].set(-t)
    A = A.at[..., 3:6, 3:6].set(R)
    A = A.at[..., 6, 6].set(1.0)
    return A


def sim3_from_se3(T: jnp.ndarray, s: jnp.ndarray | float = 1.0) -> jnp.ndarray:
    """Embed an SE(3) pose with scale s: [[s R, t], [0, 1]]."""
    T = jnp.asarray(T)
    s = jnp.broadcast_to(jnp.asarray(s, dtype=T.dtype), T.shape[:-2])
    return T.at[..., :3, :3].multiply(s[..., None, None])


def sim3_to_se3(S: jnp.ndarray) -> jnp.ndarray:
    """Drop the scale: [[sR, t]] -> [[R, t]] (the map-point re-anchoring
    applies the scale separately, matching LoopClosing::CorrectLoop's
    t/s normalization)."""
    sR = S[..., :3, :3]
    s = jnp.cbrt(jnp.maximum(jnp.linalg.det(sR), 1e-30))
    out = S.at[..., :3, :3].set(sR / s[..., None, None])
    return out


def sim3_scale(S: jnp.ndarray) -> jnp.ndarray:
    return jnp.cbrt(jnp.maximum(jnp.linalg.det(S[..., :3, :3]), 1e-30))


def sim3_transform_points(S: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply [[sR, t]] to (..., N, 3) points."""
    return jnp.einsum("...ij,...nj->...ni", S[..., :3, :3], pts,
                      precision=jax.lax.Precision.HIGHEST) \
        + S[..., None, :3, 3]
