"""Per-frame container: ORB features + depth/virtual-stereo measurements.

Functional analogue of the reference's ``Frame`` (``ORB_SLAM2/src/Frame.cc``):
keypoints with per-keypoint depth sampled from the registered depth image,
the RGB-D virtual-right coordinate uR = u - bf/z (``Frame.cc:714-735``), and
unprojection to world points (``Frame.cc:737-752``). All tensors are fixed
capacity (the extractor's feature cap); invalid slots carry valid=False.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
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


@functools.partial(jax.jit, static_argnames=("cam",))
def _depth_ur(xy: jnp.ndarray, depth_img: jnp.ndarray, cam: CameraConfig):
    """Per-keypoint depth + virtual-right uR, with DEPTH-EDGE rejection.

    A corner detected ON a depth discontinuity (object boundary against a
    farther surface) reads a side-ambiguous depth; sensors with flying-pixel
    artifacts (ToF) deliver garbage there, which the reference implicitly
    relies on the sensor invalidating (``Frame::ComputeStereoFromRGBD``
    keeps any z > 0, ``Frame.cc:714``). The veto is OFF by default
    (config thresholds at inf): A/B on the benchmark suite showed the
    near-side edge depth is valid in rendered/structured-light-style data
    and those close corners carry the most pose information (masked ATE
    regressed 3-5x with the veto on). Keypoints failing the window test
    keep valid=True but become mono observations (depth 0 / uR -1)."""
    xi = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32), 0, cam.width - 1)
    yi = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32), 0, cam.height - 1)
    z = depth_img[yi, xi]
    z_ok = (z > 0.05) & jnp.isfinite(z)
    if np.isfinite(cam.depth_edge_abs_m) or np.isfinite(cam.depth_edge_rel):
        # window min/max over 8 neighbors at radius 2: an invalid neighbor
        # or a depth range beyond max(abs, rel * z) marks a discontinuity
        # (cam is a static jit arg, so the disabled path traces to nothing)
        zmin = z
        zmax = z
        any_bad = jnp.zeros_like(z_ok)
        for dy, dx in ((-2, 0), (2, 0), (0, -2), (0, 2),
                       (-2, -2), (2, 2), (-2, 2), (2, -2)):
            nz = depth_img[jnp.clip(yi + dy, 0, cam.height - 1),
                           jnp.clip(xi + dx, 0, cam.width - 1)]
            nb_ok = (nz > 0.05) & jnp.isfinite(nz)
            any_bad |= ~nb_ok
            zmin = jnp.minimum(zmin, jnp.where(nb_ok, nz, zmin))
            zmax = jnp.maximum(zmax, jnp.where(nb_ok, nz, zmax))
        edge = any_bad | ((zmax - zmin) >
                          jnp.maximum(cam.depth_edge_abs_m,
                                      cam.depth_edge_rel * z))
        z_ok &= ~edge
    z = jnp.where(z_ok, z, 0.0)
    ur = jnp.where(z_ok, xy[:, 0] - cam.bf / jnp.where(z_ok, z, 1.0), -1.0)
    return z, ur


def build_frame(feats: OrbFeatures, depth_img: jnp.ndarray, cam: CameraConfig,
                timestamp: float = 0.0) -> FrameData:
    """Attach depth/uR measurements to extracted features.

    Depth is sampled at the rounded keypoint location; zero or out-of-range
    depth yields a mono observation (ur = -1), like the reference's
    ComputeStereoFromRGBD. One jitted dispatch (per-frame host path: eager
    ops each cost a tunnel round trip + a ~0.4 s first-compile through the
    remote compile service).
    """
    z, ur = _depth_ur(feats.xy, depth_img, cam)
    return FrameData(xy=feats.xy, level=feats.level, angle=feats.angle,
                     desc=feats.desc, valid=feats.valid, depth=z, ur=ur,
                     timestamp=timestamp)


def frame_from_frontend(out, timestamp: float = 0.0) -> FrameData:
    """FrameData straight from a FrontendOutput — the fused front-end graph
    already computed per-keypoint depth/uR, so this is free (no dispatch)."""
    f = out.features
    return FrameData(xy=f.xy, level=f.level, angle=f.angle, desc=f.desc,
                     valid=f.valid, depth=out.kp_depth, ur=out.kp_ur,
                     timestamp=timestamp)


class HostFrame(NamedTuple):
    """Host (numpy) copy of a frame's feature tensors.

    Map bookkeeping (covisibility, BA-window assembly, keyframe insertion)
    is host-side; through the axon tunnel each device->host transfer costs a
    ~25 ms round trip, so keyframes cache ONE packed readback instead of
    re-fetching per use.
    """

    xy: np.ndarray       # (N, 2) float32
    level: np.ndarray    # (N,) int32
    angle: np.ndarray    # (N,) float32
    desc: np.ndarray     # (N, 8) uint32
    valid: np.ndarray    # (N,) bool
    depth: np.ndarray    # (N,) float32
    ur: np.ndarray       # (N,) float32


@jax.jit
def _host_pack(frame: FrameData) -> jnp.ndarray:
    import jax.lax as lax

    desc_f = lax.bitcast_convert_type(frame.desc, jnp.float32)  # (N, 8)
    return jnp.concatenate(
        [frame.xy,
         frame.ur[:, None], frame.depth[:, None],
         frame.level.astype(jnp.float32)[:, None],
         frame.angle[:, None],
         frame.valid.astype(jnp.float32)[:, None],
         desc_f], axis=1)


def decode_host_pack(h: np.ndarray) -> HostFrame:
    """Decode a transferred ``_host_pack`` array into a HostFrame."""
    d = np.ascontiguousarray(h[:, 7:15]).view(np.uint32)
    return HostFrame(xy=np.ascontiguousarray(h[:, :2]), ur=h[:, 2],
                     depth=h[:, 3], level=h[:, 4].astype(np.int32),
                     angle=h[:, 5], valid=h[:, 6] > 0.5, desc=d)


def to_host(frame: FrameData) -> HostFrame:
    """Materialize a frame to host with ONE transfer (f32 pack; descriptors
    ride along bitcast to f32 — each transfer is a ~21 ms tunnel trip)."""
    return decode_host_pack(np.asarray(_host_pack(frame)))


def unproject_host(host: HostFrame, Twc: np.ndarray, cam: CameraConfig
                   ) -> np.ndarray:
    """(N, 3) world points from a host frame — pure numpy, no device trip."""
    z = host.depth
    x = (host.xy[:, 0] - cam.cx) / cam.fx * z
    y = (host.xy[:, 1] - cam.cy) / cam.fy * z
    pc = np.stack([x, y, z], axis=-1).astype(np.float32)
    return pc @ Twc[:3, :3].T.astype(np.float32) + Twc[:3, 3].astype(np.float32)


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
