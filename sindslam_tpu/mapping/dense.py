"""Dense static mapping: batched back-projection + occlusion veto + voxel rays.

Re-implements the reference's ``octomap_pub`` node (``octomap_pub/src/
pubPointCloud.cc``) TPU-first:

- ``generatePointCloud``'s stride-2 per-pixel loop (``:548-633``) becomes one
  batched back-projection; pixels with mask >= 240 (dynamic) or depth outside
  (0.01, 10) m are dropped (``:610-616``);
- the temporal occlusion veto (``:556-607``): every current point is
  reprojected into a 1-2-keyframe-old view; per-cluster counts of
  |d_now - d_then| > 0.13 d (or previously-dynamic hits) mark clusters with
  > 40% occluded points, which are erased and written back into the mask
  (``:641-667``);
- per-point ``insertRay`` loops (``:300-320``) become batched ray
  voxelization: fixed-count samples along each ray (misses) + the endpoint
  voxel (hit), scattered into the native C++ voxel store (log-odds + color),
  which integrates on a background thread (the ROS-decoupling role);
- ``StatisticalOutlierRemoval`` (``:291-296``, meanK=100 stddev=1.0) runs
  natively in the store at export/save time (kNN over the occupied-voxel
  hash, distance-sorted shell walk, multithreaded);
- map saves cover both reference output roles: flat ``.pcd``
  (``:184-185``) and octree ``.ot`` (ColorOcTree container), plus the
  octomap_server secondary map at 0.025 m
  (``octomap_mapping/octomap_server/src/OctomapServer.cpp:80``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from sindslam_tpu.config import CameraConfig, MappingConfig
from sindslam_tpu.ops import image as im

_RAY_STEPS = 16       # miss samples per (subsampled) ray
_MISS_SUBSAMPLE = 4   # 1 of every 4 points casts miss rays
_K_LABELS = 33


class VoxelBatch(NamedTuple):
    vox: jnp.ndarray     # (M, 3) int32 voxel coords
    rgb: jnp.ndarray     # (M, 3) uint8
    hit: jnp.ndarray     # (M,) bool
    valid: jnp.ndarray   # (M,) bool
    updated_mask: jnp.ndarray  # (H, W) int32 mask with vetoed clusters dynamic
    cluster_occluded: jnp.ndarray  # (_K_LABELS,) bool


@functools.partial(jax.jit, static_argnames=("cam", "cfg"))
def keyframe_to_voxels(
    rgb: jnp.ndarray,        # (H, W, 3) uint8
    depth: jnp.ndarray,      # (H, W) float32 m
    mask: jnp.ndarray,       # (H, W) int32 (255 dynamic / 125 static / 0)
    label: jnp.ndarray,      # (H, W) int32 cluster labels
    Twc: jnp.ndarray,        # (4, 4) camera-to-world
    old_depth: jnp.ndarray,  # (H, W) depth of an older keyframe
    old_mask: jnp.ndarray,   # (H, W) its dyna mask
    T_old_cw: jnp.ndarray,   # (4, 4) world-to-camera of the older keyframe
    cam: CameraConfig,
    cfg: MappingConfig,
) -> VoxelBatch:
    s = cfg.pixel_stride
    d = depth[::s, ::s]
    col = rgb[::s, ::s]
    msk = mask[::s, ::s]
    lbl = jnp.clip(label[::s, ::s], 0, _K_LABELS - 1)
    hh, ww = d.shape

    vs = (jnp.arange(hh, dtype=jnp.float32) * s)[:, None]
    us = (jnp.arange(ww, dtype=jnp.float32) * s)[None, :]
    ok = (d > cfg.depth_min_m) & (d < cfg.depth_max_m) & (msk < 240)

    x = (us - cam.cx) / cam.fx * d
    y = (vs - cam.cy) / cam.fy * d
    pc = jnp.stack([x, y, d], axis=-1)                       # camera frame
    R, t = Twc[:3, :3], Twc[:3, 3]
    pw = pc @ R.T + t                                        # world frame

    # ---- occlusion veto against the older keyframe
    Ro, to = T_old_cw[:3, :3], T_old_cw[:3, 3]
    p_old = pw @ Ro.T + to
    z_old = p_old[..., 2]
    zs = jnp.where(z_old > 1e-3, z_old, 1.0)
    u_old = p_old[..., 0] / zs * cam.fx + cam.cx
    v_old = p_old[..., 1] / zs * cam.fy + cam.cy
    in_old = (z_old > 1e-3) & (u_old >= 0) & (u_old <= cam.width - 1) & \
        (v_old >= 0) & (v_old <= cam.height - 1)
    d_then, _ = im.warp_bilinear(old_depth, v_old, u_old)
    m_then, _ = im.warp_bilinear(old_mask.astype(jnp.float32), v_old, u_old)
    occluded_px = in_old & (d_then > cfg.depth_min_m) & (
        (jnp.abs(z_old - d_then) > cfg.occlusion_rel_depth * z_old)
        | (m_then > 240.0))

    lab_flat = lbl.reshape(-1)
    onehot = (lab_flat[:, None] == jnp.arange(_K_LABELS)[None, :]
              ).astype(jnp.float32)
    occ_cnt = jnp.matmul((occluded_px & ok).reshape(1, -1).astype(jnp.float32),
                         onehot)[0]
    tot_cnt = jnp.matmul((in_old & ok).reshape(1, -1).astype(jnp.float32),
                         onehot)[0]
    cluster_occ = (occ_cnt / jnp.maximum(tot_cnt, 1.0)) > cfg.occluded_cluster_frac
    cluster_occ = cluster_occ.at[0].set(False)
    vetoed = cluster_occ[lab_flat].reshape(hh, ww) & (lbl > 0)
    ok = ok & ~vetoed

    # write the veto back into the (full-res) mask like the reference
    veto_full = jnp.repeat(jnp.repeat(vetoed, s, 0), s, 1)[:mask.shape[0],
                                                           :mask.shape[1]]
    updated_mask = jnp.where(veto_full, 255, mask).astype(jnp.int32)

    # ---- voxelization
    inv_res = 1.0 / cfg.voxel_size_m
    hit_vox = jnp.floor(pw * inv_res).astype(jnp.int32).reshape(-1, 3)
    hit_rgb = col.reshape(-1, 3).astype(jnp.uint8)
    hit_ok = ok.reshape(-1)

    # miss rays on a subsample of points: S samples strictly inside the ray
    sub = slice(None, None, _MISS_SUBSAMPLE)
    p_sub = pw.reshape(-1, 3)[sub]
    ok_sub = ok.reshape(-1)[sub]
    steps = (jnp.arange(_RAY_STEPS, dtype=jnp.float32) + 0.5) / (_RAY_STEPS + 1.0)
    q = t[None, None, :] + (p_sub - t[None, :])[:, None, :] * steps[None, :, None]
    miss_vox = jnp.floor(q * inv_res).astype(jnp.int32).reshape(-1, 3)
    miss_ok = jnp.repeat(ok_sub, _RAY_STEPS)
    miss_rgb = jnp.zeros((miss_vox.shape[0], 3), jnp.uint8)

    vox = jnp.concatenate([hit_vox, miss_vox])
    rgbv = jnp.concatenate([hit_rgb, miss_rgb])
    hit = jnp.concatenate([jnp.ones_like(hit_ok), jnp.zeros_like(miss_ok)])
    valid = jnp.concatenate([hit_ok, miss_ok])
    return VoxelBatch(vox=vox, rgb=rgbv, hit=hit, valid=valid,
                      updated_mask=updated_mask, cluster_occluded=cluster_occ)


class DenseMapper:
    """Keyframe-driven dense mapping: device geometry + native async store.

    Mirrors the reference pipeline's decimation (every ``keyframe_decimation``
    tracked frame, ``rgbd_tum_withros.cc:326``) and the 1-2-KF-old occlusion
    window (``pubPointCloud.cc:262-284``).
    """

    def __init__(self, cam: CameraConfig, cfg: MappingConfig):
        from sindslam_tpu.runtime.native import VoxelStore

        self.cam = cam
        self.cfg = cfg
        self.store = VoxelStore(cfg.voxel_size_m, cfg.log_odds_hit,
                                cfg.log_odds_miss, cfg.log_odds_min,
                                cfg.log_odds_max)
        self._history: list = []   # (depth, mask, Tcw) of recent keyframes
        self.n_inserted = 0

    def insert_keyframe(self, rgb: jnp.ndarray, depth: jnp.ndarray,
                        mask: jnp.ndarray, label: jnp.ndarray,
                        Tcw: np.ndarray) -> np.ndarray:
        """Insert one keyframe; returns the occlusion-updated mask (H, W)."""
        Twc = np.linalg.inv(Tcw).astype(np.float32)
        if self._history:
            old_depth, old_mask, old_Tcw = self._history[0]
        else:
            old_depth, old_mask, old_Tcw = depth, mask, Tcw
        batch = keyframe_to_voxels(
            rgb, depth, mask, label, jnp.asarray(Twc),
            old_depth, old_mask, jnp.asarray(old_Tcw.astype(np.float32)),
            self.cam, self.cfg)
        valid = np.asarray(batch.valid)
        self.store.insert(np.asarray(batch.vox)[valid],
                          np.asarray(batch.rgb)[valid],
                          np.ones(valid.sum(), np.uint8) *
                          np.asarray(batch.hit)[valid])
        self.n_inserted += 1
        self._history.append((depth, batch.updated_mask, Tcw))
        if len(self._history) > 2:
            self._history.pop(0)
        return np.asarray(batch.updated_mask)

    def _thr(self) -> float:
        return float(np.log(self.cfg.occupancy_threshold /
                            (1 - self.cfg.occupancy_threshold)))

    def export_cloud(self, filtered: bool = True
                     ) -> Tuple[np.ndarray, np.ndarray]:
        k = self.cfg.outlier_mean_k if filtered else 0
        return self.store.export(min_log_odds=self._thr(), min_hits=2,
                                 sor_mean_k=k, sor_stddev=self.cfg.outlier_std,
                                 sor_radius=self.cfg.outlier_search_radius_vox)

    def export_secondary(self) -> Tuple[np.ndarray, np.ndarray]:
        """Coarse colored map, the octomap_server role (OctomapServer.cpp:80)."""
        return self.store.export_coarse(
            self.cfg.secondary_resolution_m, min_log_odds=self._thr(),
            min_hits=2, sor_mean_k=self.cfg.outlier_mean_k,
            sor_stddev=self.cfg.outlier_std,
            sor_radius=self.cfg.outlier_search_radius_vox)

    def export_occupancy_2d(self, y_min: float = -0.5, y_max: float = 1.4,
                            resolution: Optional[float] = None
                            ) -> Tuple[np.ndarray, np.ndarray]:
        """Down-projected 2-D occupancy grid (the reference octomap_server's
        ``downprojected_map``, ``OctomapServer.cpp:1285`` update2DMap /
        handlePreNodeTraversal): voxels whose height (camera-down y) lies in
        [y_min, y_max] project onto the x-z plane.

        Returns (origin_xz (2,) float32 [m], grid (H, W) int8) with the
        nav_msgs/OccupancyGrid encoding: -1 unknown, 0 known-free, 100
        occupied. Occupied wins over free per cell; free cells come only
        from ray-carving evidence (export_free), never absence of data.
        """
        res = resolution or self.cfg.secondary_resolution_m
        occ, _rgb = self.export_cloud(filtered=False)
        free = self.store.export_free()

        def band(p):
            return p[(p[:, 1] >= y_min) & (p[:, 1] <= y_max)]

        occ = band(occ)
        free = band(free)
        pts = np.concatenate([occ, free]) if len(occ) + len(free) else \
            np.zeros((1, 3), np.float32)
        x0 = np.floor(pts[:, 0].min() / res) * res
        z0 = np.floor(pts[:, 2].min() / res) * res
        W = max(int(np.ceil((pts[:, 0].max() - x0) / res)) + 1, 1)
        H = max(int(np.ceil((pts[:, 2].max() - z0) / res)) + 1, 1)
        grid = np.full((H, W), -1, np.int8)
        if len(free):
            fi = ((free[:, 2] - z0) / res).astype(int)
            fj = ((free[:, 0] - x0) / res).astype(int)
            grid[fi.clip(0, H - 1), fj.clip(0, W - 1)] = 0
        if len(occ):
            oi = ((occ[:, 2] - z0) / res).astype(int)
            oj = ((occ[:, 0] - x0) / res).astype(int)
            grid[oi.clip(0, H - 1), oj.clip(0, W - 1)] = 100
        return np.array([x0, z0], np.float32), grid

    def save_pcd(self, path: str, filtered: bool = True) -> None:
        k = self.cfg.outlier_mean_k if filtered else 0
        self.store.save_pcd(path, min_log_odds=self._thr(), min_hits=2,
                            sor_mean_k=k, sor_stddev=self.cfg.outlier_std,
                            sor_radius=self.cfg.outlier_search_radius_vox)

    def save_ot(self, path: str, secondary: bool = False) -> None:
        """Octree-format save (reference pubPointCloud.cc:184-185); with
        secondary=True, at the octomap_server resolution."""
        res2 = self.cfg.secondary_resolution_m if secondary else 0.0
        self.store.save_ot(path, resolution2=res2, min_log_odds=self._thr(),
                           min_hits=2, sor_mean_k=self.cfg.outlier_mean_k,
                           sor_stddev=self.cfg.outlier_std,
                           sor_radius=self.cfg.outlier_search_radius_vox)

    def close(self) -> None:
        self.store.close()
