"""SE(3) / SO(3) utilities in JAX.

Replaces the reference's scattered cv::Mat / Eigen / g2o::SE3Quat conversions
(``ORB_SLAM2/src/Converter.cc``) with a single functional, jit/vmap-friendly
representation: poses are 4x4 float32 matrices (world-to-camera ``Tcw`` unless
stated otherwise); tangent vectors are 6-vectors ``[rho, phi]`` (translation
first, rotation last three), matching the left-multiplicative update
``T <- exp(xi) @ T`` used by the Gauss-Newton solvers in slam/optimizer.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _mm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Matmul at full f32 precision.

    TPU matmuls default to bf16 inputs on the MXU; for 3x3/4x4 pose algebra
    that costs ~1e-2 absolute error, which is fatal for SLAM. These tiny
    matmuls are VPU-sized anyway, so force HIGHEST precision here (the big
    image/feature matmuls elsewhere keep the fast default).
    """
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def hat(phi: jnp.ndarray) -> jnp.ndarray:
    """so(3) hat operator: 3-vector -> 3x3 skew matrix. Batched over leading dims."""
    x, y, z = phi[..., 0], phi[..., 1], phi[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(phi: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues' formula, numerically safe near zero. (..., 3) -> (..., 3, 3)."""
    theta2 = jnp.sum(phi * phi, axis=-1, keepdims=True)[..., None]
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    K = hat(phi)
    K2 = _mm(K, K)
    # sin(t)/t and (1-cos t)/t^2 with Taylor fallbacks
    small = theta2 < 1e-12
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + a * K + b * K2


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """SO(3) log map. (..., 3, 3) -> (..., 3). Safe for angles near 0 and pi."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_theta = jnp.sin(theta)
    small = jnp.abs(sin_theta) < 1e-6
    # near pi: fall back to diagonal extraction
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis_pi = jnp.sqrt(jnp.maximum((diag - cos_theta[..., None]) / (1.0 - cos_theta[..., None] + 1e-12), 0.0))
    axis_pi = axis_pi * jnp.sign(w + 1e-12)
    scale = jnp.where(small[..., None], 0.5 + theta[..., None] ** 2 / 12.0,
                      theta[..., None] / (2.0 * jnp.where(small, 1.0, sin_theta)[..., None]))
    log_generic = scale * w
    log_pi = theta[..., None] * axis_pi
    near_pi = cos_theta < -0.999
    return jnp.where(near_pi[..., None], log_pi, log_generic)


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """se(3) exp: (..., 6) [rho, phi] -> (..., 4, 4)."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi)
    theta2 = jnp.sum(phi * phi, axis=-1, keepdims=True)[..., None]
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    K = hat(phi)
    K2 = _mm(K, K)
    small = theta2 < 1e-12
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2 * theta))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), K.shape)
    V = eye + b * K + c * K2
    t = (_mm(V, rho[..., None]))[..., 0]
    T = jnp.zeros(xi.shape[:-1] + (4, 4), dtype=xi.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    """SE(3) log: (..., 4, 4) -> (..., 6) [rho, phi]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    phi = so3_log(R)
    theta2 = jnp.sum(phi * phi, axis=-1, keepdims=True)[..., None]
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    K = hat(phi)
    K2 = _mm(K, K)
    small = theta2 < 1e-12
    # V^{-1} = I - K/2 + (1/theta^2)(1 - theta sin/(2(1-cos))) K^2
    half_theta = theta * 0.5
    cot = jnp.where(small, 1.0 / 12.0 + theta2 / 720.0,
                    (1.0 - half_theta * jnp.cos(half_theta) / jnp.where(small, 1.0, jnp.sin(half_theta))) / jnp.where(small, 1.0, theta2))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), K.shape)
    V_inv = eye - 0.5 * K + cot * K2
    rho = (_mm(V_inv, t[..., None]))[..., 0]
    return jnp.concatenate([rho, phi], axis=-1)


def se3_inverse(T: jnp.ndarray) -> jnp.ndarray:
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -(_mm(Rt, t[..., None]))[..., 0]
    out = jnp.zeros_like(T)
    out = out.at[..., :3, :3].set(Rt)
    out = out.at[..., :3, 3].set(ti)
    out = out.at[..., 3, 3].set(1.0)
    return out


def adjoint(T: jnp.ndarray) -> jnp.ndarray:
    """SE(3) adjoint for the [rho, phi] tangent ordering:
    Adj(T) = [[R, hat(t) R], [0, R]], shape (..., 6, 6)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    tR = _mm(hat(t), R)
    top = jnp.concatenate([R, tR], axis=-1)
    bot = jnp.concatenate([jnp.zeros_like(R), R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def transform_points(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply (..., 4, 4) transform to (..., N, 3) points."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return _mm(pts, jnp.swapaxes(R, -1, -2)) + t[..., None, :]


def quat_to_rotation(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (x, y, z, w) -> rotation matrix. TUM trajectory convention."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], axis=-1),
            jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], axis=-1),
            jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], axis=-1),
        ],
        axis=-2,
    )


def rotation_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> quaternion (x, y, z, w), w >= 0. Branch-free Shepperd."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # Four candidate constructions; pick the best-conditioned one.
    qw = jnp.sqrt(jnp.maximum(1.0 + tr, 0.0)) * 0.5
    qx = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 0.0)) * 0.5
    qy = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 0.0)) * 0.5
    qz = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 0.0)) * 0.5
    qx = jnp.copysign(qx, m21 - m12)
    qy = jnp.copysign(qy, m02 - m20)
    qz = jnp.copysign(qz, m10 - m01)
    q = jnp.stack([qx, qy, qz, qw], axis=-1)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def pose_from_tum(t_xyz: jnp.ndarray, q_xyzw: jnp.ndarray) -> jnp.ndarray:
    """TUM line (translation, quaternion) -> 4x4 camera-to-world matrix Twc."""
    T = jnp.zeros(t_xyz.shape[:-1] + (4, 4), dtype=t_xyz.dtype)
    T = T.at[..., :3, :3].set(quat_to_rotation(q_xyzw))
    T = T.at[..., :3, 3].set(t_xyz)
    T = T.at[..., 3, 3].set(1.0)
    return T
