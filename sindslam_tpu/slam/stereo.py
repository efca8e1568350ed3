"""Rectified-stereo front-end: left/right ORB matching -> per-keypoint
depth -> the standard tracking pipeline.

Role of the reference's stereo input path (``Frame::ComputeStereoMatches``,
``src/Frame.cc:455-620``, driven by the stock ``ros_stereo.cc`` node):
extract ORB on both rectified images, match every left keypoint against
right keypoints on (nearly) the same row within the legal disparity range,
and convert disparity to depth with ``z = bf / d``. From there a stereo
frame is indistinguishable from an RGB-D frame (the RGB-D path itself is
formulated as virtual stereo), so tracking / mapping / BA / loop closing
need no changes.

TPU-native formulation: the reference's per-row candidate lists + SAD
subpixel refinement become ONE dense Hamming matrix (XOR+popcount on the
MXU lanes) masked by the row-band and disparity-range constraints, solved
with a row argmin plus left-right mutual consistency — a single jitted
dispatch for all keypoints — followed by the reference's SAD subpixel
refinement (an 11-px row window slid +-2 px with a parabola through the
best cost, ``Frame.cc:540-598``), batched over all matches.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sindslam_tpu.config import CameraConfig, ORBConfig, SystemConfig
from sindslam_tpu.frontend import orb
from sindslam_tpu.slam.frame import FrameData
from sindslam_tpu.slam.system import SlamSystem


def _sad_subpixel(grayL: jnp.ndarray, grayR: jnp.ndarray,
                  uvL: jnp.ndarray, ur0: jnp.ndarray, matched: jnp.ndarray,
                  half_w: int = 5, max_shift: int = 2) -> jnp.ndarray:
    """Subpixel disparity refinement (role of the reference's SAD window
    search + parabola, ``Frame.cc:540-598``): slide a (2*half_w+1)-px row
    window of the right image across +-max_shift around the matched
    column, fit a parabola through the best SAD and its neighbors."""
    h, w = grayL.shape
    offs = jnp.arange(-half_w, half_w + 1)
    vy = jnp.clip(jnp.round(uvL[:, 1]).astype(jnp.int32), 0, h - 1)
    xL = jnp.clip(jnp.round(uvL[:, 0]).astype(jnp.int32)[:, None] + offs[None],
                  0, w - 1)
    rowL = grayL[vy[:, None], xL]                           # (N, 2w+1)

    shifts = jnp.arange(-max_shift, max_shift + 1)
    xR0 = jnp.round(ur0).astype(jnp.int32)
    xR = jnp.clip(xR0[:, None, None] + shifts[None, :, None] + offs[None, None],
                  0, w - 1)                                  # (N, S, 2w+1)
    rowR = grayR[vy[:, None, None], xR]
    sad = jnp.sum(jnp.abs(rowR - rowL[:, None, :]), axis=-1)  # (N, S)

    best = jnp.argmin(sad, axis=1)
    S = shifts.shape[0]
    bi = jnp.clip(best, 1, S - 2)       # parabola needs both neighbors
    c0 = jnp.take_along_axis(sad, bi[:, None] - 1, 1)[:, 0]
    c1 = jnp.take_along_axis(sad, bi[:, None], 1)[:, 0]
    c2 = jnp.take_along_axis(sad, bi[:, None] + 1, 1)[:, 0]
    denom = c0 - 2.0 * c1 + c2
    delta = jnp.where(jnp.abs(denom) > 1e-6,
                      0.5 * (c0 - c2) / jnp.maximum(denom, 1e-6), 0.0)
    delta = jnp.clip(delta, -1.0, 1.0)
    ur_ref = xR0.astype(jnp.float32) + shifts[bi].astype(jnp.float32) + delta
    # reject refinements that wandered (edge-of-search best, flat cost)
    ok = matched & (best == bi)
    return jnp.where(ok, ur_ref, ur0)


@functools.partial(jax.jit, static_argnames=("cam", "max_hamming",
                                              "th_depth_mult"))
def stereo_match(featsL, featsR, cam: CameraConfig,
                 max_hamming: int = 80, min_z: float = 0.3,
                 grayL: jnp.ndarray | None = None,
                 grayR: jnp.ndarray | None = None,
                 th_depth_mult: float = 1e6,
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Left/right keypoint matching on rectified images.

    Returns (depth (N,), ur (N,)) for the left keypoints; depth 0 / ur -1
    where no right match exists. Row tolerance is 2 px scaled by the
    keypoint's pyramid level, like the reference's vRowIndices band
    (``Frame.cc:475-493``).

    ``th_depth_mult``: optional close-point policy — stereo depth beyond
    ``th_depth_mult * baseline`` is discarded (the reference's ThDepth=40,
    ``Examples/RGB-D/TUM1.yaml`` + ``Tracking.cc`` mThDepth, applied there
    at map-point creation). Off by default: the reference still CREATES far
    stereo points when close ones are scarce, and the BA's LM accept/reject
    loop (``ba.py``) — not this gate — is what keeps a fabricated
    near-zero-disparity far point from destabilizing the solve.
    """
    uvL, uvR = featsL.xy, featsR.xy
    D = orb.hamming_distance_matrix(featsL.desc, featsR.desc)  # (NL, NR)

    level_scale = 1.2 ** featsL.level.astype(jnp.float32)
    row_tol = 2.0 * level_scale
    row_ok = jnp.abs(uvL[:, 1:2] - uvR[None, :, 1]) <= row_tol[:, None]
    # pyramid-level consistency (reference Frame.cc:484-489: candidates come
    # from levels [l-1, l+1] only): a coarse-level blob matched to a fine
    # corner is how repeated texture fabricates near-zero-disparity fars
    lvl_ok = jnp.abs(featsL.level[:, None] - featsR.level[None, :]) <= 1
    disp = uvL[:, 0:1] - uvR[None, :, 0]                       # (NL, NR)
    max_disp = cam.bf / min_z
    disp_ok = (disp > 0.2) & (disp < max_disp)
    ok = row_ok & lvl_ok & disp_ok \
        & featsL.valid[:, None] & featsR.valid[None, :]

    BIG = jnp.int32(1 << 20)
    Dm = jnp.where(ok, D, BIG)
    best = jnp.argmin(Dm, axis=1)
    best_d = jnp.take_along_axis(Dm, best[:, None], axis=1)[:, 0]
    # left-right mutual consistency (the uniqueness the reference gets from
    # its per-row exclusive candidate lists): the chosen right keypoint's
    # best left partner must be this keypoint — kills repeated-texture
    # mismatches that otherwise put gross outliers in the depth tail
    best_back = jnp.argmin(Dm, axis=0)                        # per right kp
    mutual = best_back[best] == jnp.arange(uvL.shape[0])
    matched = (best_d <= max_hamming) & mutual

    ur = jnp.where(matched, uvR[best, 0], -1.0)
    if grayL is not None and grayR is not None:
        ur = jnp.where(matched,
                       _sad_subpixel(grayL, grayR, uvL, ur, matched), ur)
    # re-check the disparity bounds AFTER subpixel refinement: the SAD
    # search can move ur by up to max_shift+1 px, and a near-zero-disparity
    # match pushed negative must be REJECTED, not clamped — a clamped
    # disparity floor manufactures a bf/eps multi-km point that passes the
    # min_z gate and detonates bundle adjustment (reference discards
    # out-of-range refinements, Frame.cc:598-608)
    disparity = uvL[:, 0] - ur
    good = matched & (disparity > 0.2) & (disparity < max_disp)
    depth = jnp.where(good, cam.bf / jnp.maximum(disparity, 1e-3), 0.0)
    th_depth = th_depth_mult * cam.bf / cam.fx           # 40 x baseline
    depth = jnp.where((depth >= min_z) & (depth <= th_depth), depth, 0.0)
    ur = jnp.where(depth > 0, ur, -1.0)
    return depth, ur


def build_frame_stereo(grayL: jnp.ndarray, grayR: jnp.ndarray,
                       cfg: SystemConfig, timestamp: float = 0.0
                       ) -> FrameData:
    """ORB on both rectified images + stereo depth for the left features."""
    cam = cfg.camera
    zero = jnp.zeros((cam.height, cam.width), jnp.int32)
    featsL = orb.extract_orb(grayL, zero, cfg.orb,
                             height=cam.height, width=cam.width)
    featsR = orb.extract_orb(grayR, zero, cfg.orb,
                             height=cam.height, width=cam.width)
    depth, ur = stereo_match(featsL, featsR, cam,
                             grayL=grayL.astype(jnp.float32),
                             grayR=grayR.astype(jnp.float32))
    return FrameData(xy=featsL.xy, level=featsL.level, angle=featsL.angle,
                     desc=featsL.desc, valid=featsL.valid,
                     depth=depth, ur=ur, timestamp=timestamp)


class StereoSystem:
    """Stereo SLAM facade: ``track(left, right, t) -> (Tcw, is_keyframe)``.

    A thin composition: a stereo frame IS an RGB-D frame after
    ``build_frame_stereo`` (the reference's Frame ctor does exactly this
    reduction), so all of ``SlamSystem`` applies unchanged.
    """

    def __init__(self, cfg: SystemConfig):
        self.cfg = cfg
        self.slam = SlamSystem(cfg)

    def track(self, left: jnp.ndarray, right: jnp.ndarray,
              timestamp: float = 0.0) -> Tuple[np.ndarray, bool]:
        from sindslam_tpu.ops import image as im

        gl = im.rgb_to_gray(left) if left.ndim == 3 else left
        gr = im.rgb_to_gray(right) if right.ndim == 3 else right
        frame = build_frame_stereo(gl, gr, self.cfg, timestamp)
        return self.slam.track_frame(frame, timestamp)

    def trajectory(self):
        return self.slam.trajectory()

    def save_trajectory_tum(self, path: str) -> None:
        self.slam.save_trajectory_tum(path)

    def shutdown(self) -> None:
        self.slam.shutdown()

    @property
    def lost(self) -> bool:
        return self.slam.lost
