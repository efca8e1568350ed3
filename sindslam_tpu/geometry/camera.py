"""Pinhole camera projection / back-projection as batched JAX ops.

Replaces the per-pixel loops of the reference (``ORB_SLAM2/src/Frame.cc:714-752``
ComputeStereoFromRGBD / UnprojectStereo and the back-projection loop in
``octomap_pub/src/pubPointCloud.cc:548-633``) with whole-image vectorized math.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from sindslam_tpu.config import CameraConfig


def backproject_grid(depth_m: jnp.ndarray, cam: CameraConfig) -> jnp.ndarray:
    """Back-project an (H, W) metric depth image to an (H, W, 3) camera-frame
    point cloud. Zero/invalid depth yields the zero point."""
    h, w = depth_m.shape
    vs = jnp.arange(h, dtype=depth_m.dtype)[:, None]
    us = jnp.arange(w, dtype=depth_m.dtype)[None, :]
    z = depth_m
    x = (us - cam.cx) / cam.fx * z
    y = (vs - cam.cy) / cam.fy * z
    return jnp.stack([x, y, z], axis=-1)


def project_points(pts_cam: jnp.ndarray, cam: CameraConfig) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Project (..., 3) camera-frame points to pixels.

    Returns ((..., 2) [u, v], (...,) bool validity: z > 0 and inside image).
    """
    z = pts_cam[..., 2]
    z_safe = jnp.where(z > 1e-6, z, 1.0)
    u = pts_cam[..., 0] / z_safe * cam.fx + cam.cx
    v = pts_cam[..., 1] / z_safe * cam.fy + cam.cy
    valid = (z > 1e-6) & (u >= 0) & (u <= cam.width - 1) & (v >= 0) & (v <= cam.height - 1)
    return jnp.stack([u, v], axis=-1), valid


def backproject_pixels(uv: jnp.ndarray, z: jnp.ndarray, cam: CameraConfig) -> jnp.ndarray:
    """Back-project (..., 2) pixels with (...,) depths to (..., 3) points."""
    x = (uv[..., 0] - cam.cx) / cam.fx * z
    y = (uv[..., 1] - cam.cy) / cam.fy * z
    return jnp.stack([x, y, z], axis=-1)


def virtual_right_u(u: jnp.ndarray, z: jnp.ndarray, cam: CameraConfig) -> jnp.ndarray:
    """RGB-D 'virtual right image' coordinate: uR = u - bf/z.

    Mirrors the reference's stereo formulation (``src/Frame.cc:714-735``) so the
    pose optimizer can use 3-D stereo residuals for points with valid depth.
    """
    z_safe = jnp.where(z > 1e-6, z, 1.0)
    return jnp.where(z > 1e-6, u - cam.bf / z_safe, -1.0)


def undistort_points(uv: jnp.ndarray, cam: CameraConfig, iters: int = 5) -> jnp.ndarray:
    """Iteratively undistort (..., 2) pixel coords (radial-tangential model).

    The reference calls ``cv::undistortPoints`` per frame
    (``src/Frame.cc:UndistortKeyPoints``); configs with all-zero coefficients
    (TUM3) short-circuit to identity.
    """
    if cam.k1 == 0.0 and cam.k2 == 0.0 and cam.p1 == 0.0 and cam.p2 == 0.0 and cam.k3 == 0.0:
        return uv
    x = (uv[..., 0] - cam.cx) / cam.fx
    y = (uv[..., 1] - cam.cy) / cam.fy
    x0, y0 = x, y
    for _ in range(iters):
        r2 = x * x + y * y
        radial = 1.0 + r2 * (cam.k1 + r2 * (cam.k2 + r2 * cam.k3))
        dx = 2.0 * cam.p1 * x * y + cam.p2 * (r2 + 2.0 * x * x)
        dy = cam.p1 * (r2 + 2.0 * y * y) + 2.0 * cam.p2 * x * y
        x = (x0 - dx) / radial
        y = (y0 - dy) / radial
    return jnp.stack([x * cam.fx + cam.cx, y * cam.fy + cam.cy], axis=-1)
