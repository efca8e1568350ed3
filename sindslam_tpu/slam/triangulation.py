"""Epipolar triangulation of new map points from covisible keyframe pairs.

TPU re-design of the reference's ``LocalMapping::CreateNewMapPoints``
(``ORB_SLAM2/src/LocalMapping.cc:207-452``): where the reference loops over
up to 20 covisible keyframes and per-feature epipolar searches, here the K
neighbor keyframes are lanes of ONE vmapped jitted dispatch — each lane does
dense mutual-NN descriptor matching gated by the epipolar constraint, then a
closed-form two-ray midpoint triangulation with the reference's acceptance
ladder (parallax, positive depth in both views, per-view reprojection chi2).

This is what maps structure beyond the RGB-D depth range: keypoints with no
(or too-far) depth get 3D positions from motion parallax instead.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sindslam_tpu.config import CameraConfig, TrackingConfig
from sindslam_tpu.frontend.orb import hamming_distance_matrix
from sindslam_tpu.slam.frame import FrameData

_HI = jax.lax.Precision.HIGHEST
_BIG = jnp.int32(1 << 20)


class TriangulationOut(NamedTuple):
    pts_w: jnp.ndarray   # (N, 3) world points per keypoint of the new KF
    ok: jnp.ndarray      # (N,) bool triangulation accepted


def _cam_rays_world(xy: jnp.ndarray, Tcw: jnp.ndarray, cam: CameraConfig):
    """Unit ray directions in world coords + camera center for pixels xy."""
    R = Tcw[:3, :3]
    t = Tcw[:3, 3]
    center = -jnp.matmul(R.T, t, precision=_HI)
    xn = (xy[:, 0] - cam.cx) / cam.fx
    yn = (xy[:, 1] - cam.cy) / cam.fy
    d_cam = jnp.stack([xn, yn, jnp.ones_like(xn)], axis=-1)
    d_w = jnp.matmul(d_cam, R, precision=_HI)   # R^T @ d per row
    d_w = d_w / jnp.linalg.norm(d_w, axis=-1, keepdims=True)
    return d_w, center


def _project(pts_w: jnp.ndarray, Tcw: jnp.ndarray, cam: CameraConfig):
    pc = jnp.matmul(pts_w, Tcw[:3, :3].T, precision=_HI) + Tcw[:3, 3]
    z = pc[:, 2]
    zs = jnp.where(z > 1e-6, z, 1.0)
    u = pc[:, 0] / zs * cam.fx + cam.cx
    v = pc[:, 1] / zs * cam.fy + cam.cy
    return jnp.stack([u, v], axis=-1), z


def _triangulate_pair(
    cur: FrameData, free1: jnp.ndarray, Tcw1: jnp.ndarray,
    xy2: jnp.ndarray, desc2: jnp.ndarray, level2: jnp.ndarray,
    valid2: jnp.ndarray, Tcw2: jnp.ndarray,
    cam: CameraConfig, cfg: TrackingConfig,
) -> TriangulationOut:
    N = cur.xy.shape[0]

    # ---- mutual-NN descriptor matching among free/valid keypoints
    D = hamming_distance_matrix(cur.desc, desc2)
    D = jnp.where(free1[:, None] & valid2[None, :], D, _BIG)
    best = jnp.argmin(D, axis=1)
    best_d = jnp.take_along_axis(D, best[:, None], axis=1)[:, 0]
    back = jnp.argmin(D, axis=0)
    mutual = back[best] == jnp.arange(N)
    matched = (best_d <= cfg.triangulate_max_hamming) & mutual

    x2 = xy2[best]                               # (N, 2) matched pixel in nbr
    sigma2_2 = 1.2 ** (2.0 * level2[best].astype(jnp.float32))
    sigma2_1 = 1.2 ** (2.0 * cur.level.astype(jnp.float32))

    # ---- epipolar constraint: distance of x2 to the epipolar line of x1
    # (ref ORBmatcher::CheckDistEpipolarLine). Line from the essential
    # geometry of T21 = Tcw2 @ Twc1: l2 = K^-T [t21]x R21 K^-1 x1.
    R1, t1 = Tcw1[:3, :3], Tcw1[:3, 3]
    R2, t2 = Tcw2[:3, :3], Tcw2[:3, 3]
    R21 = jnp.matmul(R2, R1.T, precision=_HI)
    t21 = t2 - jnp.matmul(R21, t1, precision=_HI)
    tx = jnp.array([[0, -t21[2], t21[1]],
                    [t21[2], 0, -t21[0]],
                    [-t21[1], t21[0], 0]], jnp.float32)
    E = jnp.matmul(tx, R21, precision=_HI)
    Kinv = jnp.array([[1.0 / cam.fx, 0, -cam.cx / cam.fx],
                      [0, 1.0 / cam.fy, -cam.cy / cam.fy],
                      [0, 0, 1.0]], jnp.float32)
    F = jnp.matmul(jnp.matmul(Kinv.T, E, precision=_HI), Kinv, precision=_HI)
    x1h = jnp.concatenate([cur.xy, jnp.ones((N, 1), jnp.float32)], axis=1)
    l2 = jnp.matmul(x1h, F.T, precision=_HI)     # (N, 3) line in image 2
    num = l2[:, 0] * x2[:, 0] + l2[:, 1] * x2[:, 1] + l2[:, 2]
    den = l2[:, 0] ** 2 + l2[:, 1] ** 2
    epi_d2 = num * num / jnp.maximum(den, 1e-12)
    epi_ok = epi_d2 < cfg.triangulate_epipolar_chi2 * sigma2_2

    # ---- two-ray midpoint triangulation
    d1, o1 = _cam_rays_world(cur.xy, Tcw1, cam)
    d2, o2 = _cam_rays_world(x2, Tcw2, cam)
    cos_par = jnp.sum(d1 * d2, axis=-1)
    b = cos_par
    w0 = o1 - o2                                  # (3,) broadcast below
    d1w = jnp.sum(d1 * w0, axis=-1)
    d2w = jnp.sum(d2 * w0, axis=-1)
    denom = jnp.maximum(1.0 - b * b, 1e-9)
    s = (b * d2w - d1w) / denom
    t = (d2w - b * d1w) / denom
    pts = 0.5 * ((o1 + s[:, None] * d1) + (o2 + t[:, None] * d2))

    # ---- acceptance ladder (LocalMapping.cc:318-430)
    uv1, z1 = _project(pts, Tcw1, cam)
    uv2, z2 = _project(pts, Tcw2, cam)
    e1 = jnp.sum((uv1 - cur.xy) ** 2, axis=-1)
    e2 = jnp.sum((uv2 - x2) ** 2, axis=-1)
    ok = (
        matched & epi_ok
        & (cos_par < cfg.triangulate_min_parallax_cos) & (cos_par > 0.0)
        & (z1 > 0.05) & (z2 > 0.05)
        & (z1 < cfg.triangulate_max_depth_m)
        & (e1 < cfg.triangulate_reproj_chi2 * sigma2_1)
        & (e2 < cfg.triangulate_reproj_chi2 * sigma2_2)
    )
    return TriangulationOut(pts_w=pts, ok=ok)


@functools.partial(jax.jit, static_argnames=("cam", "cfg"))
def triangulate_with_neighbors(
    cur: FrameData, free1: jnp.ndarray, Tcw1: jnp.ndarray,
    nbr_xy: jnp.ndarray,      # (K, N, 2)
    nbr_desc: jnp.ndarray,    # (K, N, 8)
    nbr_level: jnp.ndarray,   # (K, N)
    nbr_valid: jnp.ndarray,   # (K, N)
    nbr_Tcw: jnp.ndarray,     # (K, 4, 4)
    cam: CameraConfig, cfg: TrackingConfig,
) -> jnp.ndarray:
    """Triangulate the new keyframe's free keypoints against K neighbors.

    Returns a packed (N, 4) array [x, y, z, ok] — one readback. Each
    keypoint takes the first neighbor that produced an accepted point.
    """
    out = jax.vmap(
        lambda xy, de, lv, va, T: _triangulate_pair(
            cur, free1, Tcw1, xy, de, lv, va, T, cam, cfg)
    )(nbr_xy, nbr_desc, nbr_level, nbr_valid, nbr_Tcw)
    first = jnp.argmax(out.ok, axis=0)                      # (N,)
    any_ok = jnp.any(out.ok, axis=0)
    pts = out.pts_w[first, jnp.arange(cur.xy.shape[0])]
    return jnp.concatenate([pts, any_ok[:, None].astype(jnp.float32)], axis=1)
