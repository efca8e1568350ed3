"""Map bookkeeping: map points, keyframes, covisibility, local BA windows.

Host-side structure-of-arrays replacing the reference's pointer-graph
``Map`` / ``MapPoint`` / ``KeyFrame`` objects (``ORB_SLAM2/src/Map.cc``,
``MapPoint.cc``, ``KeyFrame.cc``): map points live in fixed-capacity numpy
arrays (positions, descriptors, flags) with device mirrors taken per dispatch;
keyframes hold their (device) feature tensors, pose, and per-keypoint map-point
ids. Covisibility weights are shared-point counts (``KeyFrame::UpdateConnections``),
computed with vectorized set intersections.

Map-point culling and keyframe culling follow the reference policies in
simplified form (``LocalMapping.cc:170`` found-ratio cull; ``:KeyFrameCulling``
redundancy cull is deferred to the loop-closing round).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax.numpy as jnp

from sindslam_tpu.config import CameraConfig, TrackingConfig
from sindslam_tpu.slam.ba import BAProblem, local_bundle_adjustment
from sindslam_tpu.slam.frame import FrameData


@dataclass
class KeyFrame:
    kf_id: int
    frame: FrameData              # device tensors (fixed capacity N)
    Tcw: np.ndarray               # (4, 4)
    point_ids: np.ndarray         # (N,) int64 map-point id per keypoint, -1 none
    timestamp: float
    culled: bool = False          # redundant KFs are excluded, not deleted


class LocalMap:
    """Fixed-capacity map-point store + keyframe list."""

    def __init__(self, cam: CameraConfig, cfg: TrackingConfig):
        self.cam = cam
        self.cfg = cfg
        P = cfg.max_map_points
        self.pos = np.zeros((P, 3), np.float32)
        self.desc = np.zeros((P, 8), np.uint32)
        self.valid = np.zeros(P, bool)
        self.n_obs = np.zeros(P, np.int32)
        self.n_found = np.zeros(P, np.int32)   # matched while visible
        self.n_visible = np.zeros(P, np.int32)
        self.created_kf = np.zeros(P, np.int32)
        self._next = 0
        self.keyframes: List[KeyFrame] = []

    # ------------------------------------------------------------- points

    def allocate_points(self, positions: np.ndarray, descs: np.ndarray,
                        kf_id: int) -> np.ndarray:
        """Add new map points; returns their ids (or -1 where capacity full)."""
        n = len(positions)
        ids = np.full(n, -1, np.int64)
        free = self.cfg.max_map_points - self._next
        take = min(n, free)
        if take > 0:
            sl = slice(self._next, self._next + take)
            self.pos[sl] = positions[:take]
            self.desc[sl] = descs[:take]
            self.valid[sl] = True
            self.n_obs[sl] = 1
            self.n_found[sl] = 1
            self.n_visible[sl] = 1
            self.created_kf[sl] = kf_id
            ids[:take] = np.arange(self._next, self._next + take)
            self._next += take
        return ids

    def cull_points(self, current_kf_id: int) -> int:
        """Found-ratio + early-observation cull (LocalMapping.cc:170 policy:
        drop points matched in <25% of the frames that should see them, or
        points older than 2 KFs with <=2 observations)."""
        ratio = self.n_found / np.maximum(self.n_visible, 1)
        young = (current_kf_id - self.created_kf) >= 2
        weak = young & (self.n_obs <= 2)
        bad = self.valid & ((ratio < 0.25) | weak)
        # never cull points with many observations
        bad &= self.n_obs < 3
        n = int(bad.sum())
        self.valid[bad] = False
        return n

    def fuse_duplicates(self, kf: KeyFrame, dist_m: float = 0.03,
                        max_hamming: int = 50) -> int:
        """Merge newly created map points that duplicate older ones
        (SearchInNeighbors/Fuse role, reference ``LocalMapping.cc:454`` /
        ``ORBmatcher::Fuse``): a new point within ``dist_m`` of an older valid
        point with a close descriptor is redirected to the older id."""
        new_ids = np.unique(kf.point_ids[(kf.point_ids >= 0)])
        new_ids = new_ids[self.created_kf[new_ids] == kf.kf_id]
        if len(new_ids) == 0 or self._next - len(new_ids) <= 0:
            return 0
        old_valid = self.valid.copy()
        old_valid[new_ids] = False
        old_idx = np.where(old_valid[:self._next])[0]
        if len(old_idx) == 0:
            return 0
        from scipy.spatial import cKDTree

        tree = cKDTree(self.pos[old_idx])
        d, nn = tree.query(self.pos[new_ids], distance_upper_bound=dist_m)
        close = np.isfinite(d)
        n_fused = 0
        # descriptor check via popcount
        for ni, is_close, nnk in zip(new_ids, close, nn):
            if not is_close:
                continue
            oi = old_idx[nnk]
            ham = bin(int.from_bytes(
                (self.desc[ni] ^ self.desc[oi]).tobytes(), "little")).count("1")
            if ham > max_hamming:
                continue
            kf.point_ids[kf.point_ids == ni] = oi
            self.valid[ni] = False
            self.n_obs[oi] += 1
            n_fused += 1
        return n_fused

    def cull_keyframes(self, protect_last: int = 3, redundancy: float = 0.9
                       ) -> int:
        """Redundancy cull (reference ``LocalMapping::KeyFrameCulling``): a
        keyframe whose valid points are >=90% observed by >=3 other keyframes
        is marked culled (excluded from windows/covisibility, kept for the
        trajectory replay)."""
        n_culled = 0
        for kf in self.keyframes[:-protect_last]:
            if kf.culled:
                continue
            pids = kf.point_ids[kf.point_ids >= 0]
            pids = pids[self.valid[pids]]
            if len(pids) < 20:
                continue
            redundant = (self.n_obs[pids] >= 4).mean()
            if redundant >= redundancy:
                kf.culled = True
                n_culled += 1
        return n_culled

    # ---------------------------------------------------------- keyframes

    def insert_keyframe(self, frame: FrameData, Tcw: np.ndarray,
                        point_ids: np.ndarray, timestamp: float) -> KeyFrame:
        kf = KeyFrame(kf_id=len(self.keyframes), frame=frame,
                      Tcw=Tcw.copy(), point_ids=point_ids.copy(),
                      timestamp=timestamp)
        self.keyframes.append(kf)
        seen = point_ids[point_ids >= 0]
        self.n_obs[seen] += 1
        return kf

    def covisible_keyframes(self, kf: KeyFrame, k: int = 10,
                            min_shared: int = 15) -> List[KeyFrame]:
        """Keyframes sharing >= min_shared map points, strongest first."""
        mine = set(kf.point_ids[kf.point_ids >= 0].tolist())
        weights = []
        for other in self.keyframes:
            if other.kf_id == kf.kf_id or other.culled:
                continue
            shared = len(mine.intersection(
                other.point_ids[other.point_ids >= 0].tolist()))
            if shared >= min_shared:
                weights.append((shared, other))
        weights.sort(key=lambda x: -x[0])
        return [o for _, o in weights[:k]]

    # --------------------------------------------------------------- BA

    def build_ba_window(self, n_recent: Optional[int] = None
                        ) -> Optional[Tuple[BAProblem, List[KeyFrame], np.ndarray]]:
        """Assemble a padded BAProblem over the most recent keyframes.

        Returns (problem, window_kfs, point_id_lut) or None if too small.
        point_id_lut maps BA point slots -> global map-point ids.
        """
        cfg = self.cfg
        W = n_recent or cfg.ba_max_keyframes
        window = [k for k in self.keyframes if not k.culled][-W:]
        if len(window) < 2:
            return None

        # collect the union of observed points (cap ba_max_points).
        # IMPORTANT: materialize each keyframe's feature tensors to host ONCE
        # — indexing a device array per observation costs a full tunnel
        # round-trip (~25 ms) each, i.e. minutes per BA window.
        host_kf = [(np.asarray(kf.frame.xy), np.asarray(kf.frame.ur),
                    np.asarray(kf.frame.level)) for kf in window]
        pid_set: Dict[int, int] = {}
        obs: List[Tuple[int, int, int]] = []   # (kf slot, pt slot, keypoint idx)
        for s, kf in enumerate(window):
            ids = kf.point_ids
            for ki in np.where(ids >= 0)[0]:
                pid = int(ids[ki])
                if not self.valid[pid]:
                    continue
                if pid not in pid_set:
                    if len(pid_set) >= cfg.ba_max_points:
                        continue
                    pid_set[pid] = len(pid_set)
                obs.append((s, pid_set[pid], int(ki)))
        if len(obs) < 30:
            return None

        P = cfg.ba_max_points
        lut = np.full(P, -1, np.int64)
        for pid, slot in pid_set.items():
            lut[slot] = pid
        pts = np.zeros((P, 3), np.float32)
        pts[:len(pid_set)] = self.pos[lut[:len(pid_set)]]

        M = 4 * P
        obs = obs[:M]
        obs_kf = np.zeros(M, np.int32)
        obs_pt = np.zeros(M, np.int32)
        obs_uv = np.zeros((M, 2), np.float32)
        obs_ur = np.full(M, -1.0, np.float32)
        obs_lvl = np.zeros(M, np.int32)
        obs_ok = np.zeros(M, bool)
        for i, (s, pslot, ki) in enumerate(obs):
            xy_h, ur_h, lvl_h = host_kf[s]
            obs_kf[i] = s
            obs_pt[i] = pslot
            obs_uv[i] = xy_h[ki]
            obs_ur[i] = ur_h[ki]
            obs_lvl[i] = lvl_h[ki]
            obs_ok[i] = True

        poses = np.stack([kf.Tcw for kf in window]).astype(np.float32)
        K = cfg.ba_max_keyframes
        if len(window) < K:
            poses = np.concatenate(
                [poses, np.broadcast_to(np.eye(4, dtype=np.float32),
                                        (K - len(window), 4, 4))])
        fixed = np.zeros(K, bool)
        fixed[0] = True                      # gauge anchor: oldest in window
        fixed[len(window):] = True           # padding poses are inert

        problem = BAProblem(
            poses=jnp.asarray(poses), points=jnp.asarray(pts),
            obs_kf=jnp.asarray(obs_kf), obs_pt=jnp.asarray(obs_pt),
            obs_uv=jnp.asarray(obs_uv), obs_ur=jnp.asarray(obs_ur),
            obs_level=jnp.asarray(obs_lvl), obs_valid=jnp.asarray(obs_ok),
            fixed_mask=jnp.asarray(fixed),
        )
        return problem, window, lut

    def run_local_ba(self) -> Optional[float]:
        """Local BA over the recent window; writes back poses and points."""
        built = self.build_ba_window()
        if built is None:
            return None
        problem, window, lut = built
        res = local_bundle_adjustment(problem, self.cam, self.cfg)
        poses = np.asarray(res.poses)
        pts = np.asarray(res.points)
        for s, kf in enumerate(window):
            if s == 0:
                continue
            kf.Tcw = poses[s]
        n_used = int((lut >= 0).sum())
        ids = lut[:n_used]
        self.pos[ids] = pts[:n_used]
        return float(res.mean_chi2)

    # ----------------------------------------------------------- queries

    def local_point_tensors(self, around_kf: Optional[KeyFrame] = None
                            ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, np.ndarray]:
        """Padded device tensors of the local map for the tracker:
        (positions (P, 3), descriptors (P, 8), valid (P,), global ids (P,)).
        P = cfg.ba_max_points. 'Local' = points of the covisible window."""
        cfg = self.cfg
        P = cfg.ba_max_points
        if around_kf is None and self.keyframes:
            around_kf = self.keyframes[-1]
        pid_list: List[int] = []
        if around_kf is not None:
            kfs = [around_kf] + self.covisible_keyframes(around_kf)
            seen = set()
            for kf in kfs:
                for pid in kf.point_ids[kf.point_ids >= 0].tolist():
                    if pid not in seen and self.valid[pid]:
                        seen.add(pid)
                        pid_list.append(pid)
                        if len(pid_list) >= P:
                            break
                if len(pid_list) >= P:
                    break
        ids = np.full(P, -1, np.int64)
        ids[:len(pid_list)] = pid_list
        pos = np.zeros((P, 3), np.float32)
        desc = np.zeros((P, 8), np.uint32)
        ok = np.zeros(P, bool)
        if pid_list:
            pos[:len(pid_list)] = self.pos[pid_list]
            desc[:len(pid_list)] = self.desc[pid_list]
            ok[:len(pid_list)] = True
        return jnp.asarray(pos), jnp.asarray(desc), jnp.asarray(ok), ids
