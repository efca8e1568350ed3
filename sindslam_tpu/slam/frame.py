"""Per-frame container: ORB features + depth/virtual-stereo measurements.

Functional analogue of the reference's ``Frame`` (``ORB_SLAM2/src/Frame.cc``):
keypoints with per-keypoint depth sampled from the registered depth image,
the RGB-D virtual-right coordinate uR = u - bf/z (``Frame.cc:714-735``), and
unprojection to world points (``Frame.cc:737-752``). All tensors are fixed
capacity (the extractor's feature cap); invalid slots carry valid=False.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from sindslam_tpu.config import CameraConfig
from sindslam_tpu.frontend.orb import OrbFeatures
from sindslam_tpu.geometry import se3


class FrameData(NamedTuple):
    xy: jnp.ndarray       # (N, 2) keypoint pixels (full resolution)
    level: jnp.ndarray    # (N,) int32
    angle: jnp.ndarray    # (N,)
    desc: jnp.ndarray     # (N, 8) uint32
    valid: jnp.ndarray    # (N,) bool
    depth: jnp.ndarray    # (N,) metric depth (0 = invalid)
    ur: jnp.ndarray       # (N,) virtual-right u (-1 = mono)
    timestamp: float = 0.0


def build_frame(feats: OrbFeatures, depth_img: jnp.ndarray, cam: CameraConfig,
                timestamp: float = 0.0) -> FrameData:
    """Attach depth/uR measurements to extracted features.

    Depth is sampled at the rounded keypoint location; zero or out-of-range
    depth yields a mono observation (ur = -1), like the reference's
    ComputeStereoFromRGBD.
    """
    xi = jnp.clip(jnp.round(feats.xy[:, 0]).astype(jnp.int32), 0, cam.width - 1)
    yi = jnp.clip(jnp.round(feats.xy[:, 1]).astype(jnp.int32), 0, cam.height - 1)
    z = depth_img[yi, xi]
    z_ok = (z > 0.05) & jnp.isfinite(z)
    z = jnp.where(z_ok, z, 0.0)
    ur = jnp.where(z_ok, feats.xy[:, 0] - cam.bf / jnp.where(z_ok, z, 1.0), -1.0)
    return FrameData(xy=feats.xy, level=feats.level, angle=feats.angle,
                     desc=feats.desc, valid=feats.valid, depth=z, ur=ur,
                     timestamp=timestamp)


def unproject_to_world(frame: FrameData, Twc: jnp.ndarray, cam: CameraConfig
                       ) -> jnp.ndarray:
    """(N, 3) world points for keypoints with valid depth (zeros elsewhere)."""
    z = frame.depth
    x = (frame.xy[:, 0] - cam.cx) / cam.fx * z
    y = (frame.xy[:, 1] - cam.cy) / cam.fy * z
    pc = jnp.stack([x, y, z], axis=-1)
    return se3.transform_points(Twc, pc[None])[0]


def project_world_points(pts_w: jnp.ndarray, Tcw: jnp.ndarray, cam: CameraConfig):
    """World points -> (uv (N, 2), valid (N,) in-frustum bool)."""
    pc = se3.transform_points(Tcw, pts_w[None])[0]
    z = pc[:, 2]
    z_ok = z > 1e-3
    zs = jnp.where(z_ok, z, 1.0)
    u = pc[:, 0] / zs * cam.fx + cam.cx
    v = pc[:, 1] / zs * cam.fy + cam.cy
    inb = z_ok & (u >= 0) & (u <= cam.width - 1) & (v >= 0) & (v <= cam.height - 1)
    return jnp.stack([u, v], axis=-1), inb
