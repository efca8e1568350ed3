"""Frame-rate pose tracking (constant-velocity model + projection matching +
batched GN pose optimization).

Host-side state machine mirroring the structure of the reference's
``Tracking::Track`` / ``TrackWithMotionModel`` (``ORB_SLAM2/src/Tracking.cc:
304-560, 903``), with the device work (matching + optimization) batched into
one jitted dispatch per frame, per the host/device split in SURVEY.md §7.

This module provides the minimum end-to-end slice (frame-to-frame RGB-D
odometry); keyframe/local-map tracking lives in slam/local_map.py and is
layered on top by slam/system.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sindslam_tpu.config import CameraConfig, TrackingConfig
from sindslam_tpu.geometry import se3
from sindslam_tpu.slam import matching
from sindslam_tpu.slam.frame import FrameData, project_world_points, unproject_to_world
from sindslam_tpu.slam.optimizer import pose_optimization


class TrackStepResult(NamedTuple):
    Tcw: jnp.ndarray
    n_matches: jnp.ndarray
    n_inliers: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("cam", "cfg", "radius"))
def track_against_frame(
    prev: FrameData, prev_Twc: jnp.ndarray,
    cur: FrameData, Tcw_pred: jnp.ndarray,
    cam: CameraConfig, cfg: TrackingConfig, radius: float,
) -> TrackStepResult:
    """One device dispatch: unproject prev frame's depth points to world,
    project into the predicted current pose, match within the window, run
    robust GN pose optimization."""
    pts_w = unproject_to_world(prev, prev_Twc, cam)
    src_valid = prev.valid & (prev.depth > 0)
    proj_uv, in_frustum = project_world_points(pts_w, Tcw_pred, cam)
    proj_ok = src_valid & in_frustum

    m = matching.match_by_projection(
        proj_uv, proj_ok, prev.desc, prev.level,
        cur.xy, cur.desc, cur.level, cur.valid,
        radius=radius, max_dist=cfg.hamming_th_high,
    )
    # orientation-consistency filter (ref ORBmatcher.cc:45-140 uses it in
    # every frame<->frame search; map points carry no angle, so the map
    # match below stays unfiltered, like the reference's frame<->map path)
    m = matching.filter_rotation_consistency(m, prev.angle, cur.angle)
    tgt = jnp.maximum(m.idx, 0)
    obs_uv = cur.xy[tgt]
    obs_ur = jnp.where(m.valid, cur.ur[tgt], -1.0)
    obs_level = cur.level[tgt]

    res = pose_optimization(
        Tcw_pred, pts_w, obs_uv, obs_ur, obs_level, m.valid, cam, cfg)
    return TrackStepResult(Tcw=res.Tcw, n_matches=jnp.sum(m.valid),
                           n_inliers=res.n_inliers)


class FullTrackOut(NamedTuple):
    """Packed single-readback result of one full tracking step.

    Through the axon tunnel every device->host transfer costs a ~25 ms round
    trip, so the whole per-frame tracking (motion-model match + pose opt +
    local-map match + pose opt) is ONE dispatch returning a few packed arrays.
    """

    poses: jnp.ndarray    # (2, 4, 4): [frame-to-frame Tcw, map-refined Tcw]
    counts: jnp.ndarray   # (2,) int32: [frame inliers, map inliers]
    map_match_idx: jnp.ndarray   # (P,) int32 target keypoint per map point
    flags: jnp.ndarray    # (3, P) bool: [match valid, obs inlier, in frustum]
    packed: jnp.ndarray   # (34 + P/2,) float32: everything above in ONE
    #                       transfer (reading the four fields separately
    #                       costs four ~21 ms tunnel round trips). The four
    #                       per-point fields are bit-packed two-points-per-
    #                       word: idx+1 in bits 0-12 (N <= 8190), valid/
    #                       inlier/in-frustum in bits 13-15 — the payload is
    #                       ~8 KB instead of ~64 KB (the tunnel moves ~1 KB/ms
    #                       on top of its ~21 ms round-trip floor).
    packed_small: jnp.ndarray  # (34,) float32: poses + counts only — the
    #                       per-frame steady-state readback (136 B). The
    #                       per-point words above are consumed lazily: the
    #                       match/visibility bookkeeping batches to keyframe
    #                       time (SlamSystem._stats_pending), so non-keyframe
    #                       frames never pay the ~8 KB transfer.
    packed_pts: jnp.ndarray    # (P/2,) float32: the bit-packed point words


def unpack_track_points(words_f32: np.ndarray, P: int):
    """Decode the bit-packed per-point words -> (idx (P,), flags (3, P))."""
    words = np.ascontiguousarray(words_f32[:P // 2]).view(np.uint32)
    code = np.empty(P, np.uint32)
    code[0::2] = words & 0xFFFF
    code[1::2] = words >> 16
    idx = (code & 0x1FFF).astype(np.int32) - 1
    flags = np.stack([(code >> b) & 1 for b in (13, 14, 15)]).astype(bool)
    return idx, flags


def unpack_track_out(packed: np.ndarray, P: int):
    """Host-side decode of FullTrackOut.packed -> (poses, counts, idx, flags)."""
    poses = packed[:32].reshape(2, 4, 4).copy()
    counts = packed[32:34].astype(np.int32)
    idx, flags = unpack_track_points(packed[34:], P)
    return poses, counts, idx, flags


@functools.partial(jax.jit, static_argnames=("cam", "cfg", "radius"))
def full_track_step(
    prev: FrameData, prev_Twc: jnp.ndarray,
    cur: FrameData, Tcw_pred: jnp.ndarray,
    map_pos: jnp.ndarray, map_desc: jnp.ndarray, map_ok: jnp.ndarray,
    cam: CameraConfig, cfg: TrackingConfig, radius: float,
) -> FullTrackOut:
    from sindslam_tpu.slam.frame import project_world_points

    r1 = track_against_frame(prev, prev_Twc, cur, Tcw_pred, cam, cfg, radius)

    proj_uv, in_frustum = project_world_points(map_pos, r1.Tcw, cam)
    proj_ok = map_ok & in_frustum
    lvl0 = jnp.zeros(map_pos.shape[0], jnp.int32)
    m = matching.match_by_projection(
        proj_uv, proj_ok, map_desc, lvl0,
        cur.xy, cur.desc, cur.level, cur.valid,
        radius=cfg.search_radius_fine, max_dist=cfg.hamming_th_high,
        level_tolerance=8)
    tgt = jnp.maximum(m.idx, 0)
    opt = pose_optimization(
        r1.Tcw, map_pos, cur.xy[tgt],
        jnp.where(m.valid, cur.ur[tgt], -1.0), cur.level[tgt], m.valid,
        cam, cfg)

    # if the map solve is weak, keep the frame-to-frame pose
    good = opt.n_inliers >= cfg.min_tracked_points
    final = jnp.where(good, opt.Tcw, r1.Tcw)
    poses = jnp.stack([r1.Tcw, final])
    counts = jnp.stack([r1.n_inliers, opt.n_inliers]).astype(jnp.int32)
    flags = jnp.stack([m.valid, opt.inliers & m.valid, in_frustum & map_ok])
    # bit-pack the per-point fields, two points per f32 word (see FullTrackOut)
    code = ((m.idx + 1).astype(jnp.uint32)
            | (m.valid.astype(jnp.uint32) << 13)
            | ((opt.inliers & m.valid).astype(jnp.uint32) << 14)
            | ((in_frustum & map_ok).astype(jnp.uint32) << 15))
    words = jax.lax.bitcast_convert_type(
        code[0::2] | (code[1::2] << 16), jnp.float32)
    packed_small = jnp.concatenate([
        poses.reshape(-1), counts.astype(jnp.float32)])
    packed = jnp.concatenate([packed_small, words])
    return FullTrackOut(packed=packed, packed_small=packed_small,
                        packed_pts=words,
                        poses=poses, counts=counts, map_match_idx=m.idx,
                        flags=flags)


@functools.partial(jax.jit, static_argnames=("syscfg", "radius"))
def fused_frontend_track_step(
    rgb: jnp.ndarray, depth: jnp.ndarray, fe_state,
    prev: FrameData, prev_Twc: jnp.ndarray, Tcw_pred: jnp.ndarray,
    map_pos: jnp.ndarray, map_desc: jnp.ndarray, map_ok: jnp.ndarray,
    syscfg, radius: float,
):
    """FRONT-END + TRACKING as ONE device dispatch per frame.

    Through the axon tunnel every dispatch costs a full RPC round trip on
    top of compute; the r3 pipeline paid two per frame (front-end, then the
    fused track step). Inlining ``frontend_step`` and ``full_track_step``
    into one jitted graph halves the per-frame RPC count — and XLA gets to
    overlap the ORB/masking tail with the matching/optimization head.
    Returns (FrontendOutput, new front-end state, FullTrackOut)."""
    from sindslam_tpu.frontend.pipeline import frontend_step

    out, new_state = frontend_step(rgb, depth, fe_state, syscfg)
    cur = FrameData(xy=out.features.xy, level=out.features.level,
                    angle=out.features.angle, desc=out.features.desc,
                    valid=out.features.valid, depth=out.kp_depth,
                    ur=out.kp_ur, timestamp=0.0)
    res = full_track_step(prev, prev_Twc, cur, Tcw_pred,
                          map_pos, map_desc, map_ok,
                          syscfg.camera, syscfg.tracking, radius)
    # the keyframe host pack rides out of the SAME graph: if this frame is
    # promoted to a keyframe, its ~60 KB feature pack was already prefetched
    # at dispatch (host_prefetch) instead of costing a fresh dispatch + a
    # blocking ~25 ms tunnel readback at insertion time (r4 verdict #8,
    # README "remaining headroom": ~90 KB per-keyframe host pack)
    from sindslam_tpu.slam.frame import _host_pack

    return out, new_state, res, _host_pack(cur)


class OdometryTracker:
    """Constant-velocity frame-to-frame RGB-D odometry.

    Keeps host-side state (last frame tensors, last pose, velocity); all math
    per frame runs in a single jitted call. The first frame defines the world
    origin (identity pose), like the reference RGB-D initialization.
    """

    def __init__(self, cam: CameraConfig, cfg: TrackingConfig):
        self.cam = cam
        self.cfg = cfg
        self.prev: Optional[FrameData] = None
        self.Tcw = jnp.eye(4)
        self.velocity = jnp.eye(4)   # Tcw_t @ inv(Tcw_{t-1})
        self.lost = False

    def track(self, frame: FrameData) -> Tuple[np.ndarray, dict]:
        """Returns (Tcw (4, 4) numpy, info dict)."""
        info = {"n_matches": 0, "n_inliers": 0, "relocalized": False}
        if self.prev is None:
            self.prev = frame
            self.Tcw = jnp.eye(4)
            return np.asarray(self.Tcw), info

        prev_Twc = se3.se3_inverse(self.Tcw[None])[0]
        Tcw_pred = se3._mm(self.velocity, self.Tcw)

        res = track_against_frame(self.prev, prev_Twc, frame, Tcw_pred,
                                  self.cam, self.cfg,
                                  radius=self.cfg.search_radius_fine)
        n_inl = int(res.n_inliers)
        if n_inl < self.cfg.min_tracked_points:
            # wide-window retry from the last pose (motion model may be off),
            # mirroring the reference's th=2x retry in TrackWithMotionModel
            res = track_against_frame(self.prev, prev_Twc, frame, self.Tcw,
                                      self.cam, self.cfg,
                                      radius=self.cfg.search_radius_coarse)
            n_inl = int(res.n_inliers)
            info["relocalized"] = True

        if n_inl >= self.cfg.min_tracked_points:
            new_Tcw = res.Tcw
            self.velocity = se3._mm(new_Tcw, se3.se3_inverse(self.Tcw[None])[0])
            self.Tcw = new_Tcw
            self.lost = False
        else:
            # keep extrapolating; flag lost (reference sets mState=LOST)
            self.Tcw = Tcw_pred
            self.lost = True

        info["n_matches"] = int(res.n_matches)
        info["n_inliers"] = n_inl
        self.prev = frame
        return np.asarray(self.Tcw), info
