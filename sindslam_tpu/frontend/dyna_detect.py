"""DynaDetect: the per-frame dynamic-region detector (the contribution, L1).

Orchestrates the TPU-native equivalents of the reference's
``DynaDetect::DetectDynaArea`` (``ORB_SLAM2/src/DynaDetect.cc:1377-1666``):

    flow (n -> n-2, fallback n -> n-1 on large motion)   [ops/flow.py]
    k-means re-clustering (warm-started)                 [frontend/clustering.py]
    depth/plane edges                                    [frontend/edges.py]
    RAG component merge                                  [frontend/rag_merge.py]
    homography + residual thresholds                     [frontend/flow_mask.py]
    mask fusion + encoding                               [frontend/fusion.py]

Where the reference overlaps a flow thread with the clustering work via
``std::thread`` + promise (``:1396-1398,1553-1554``), here both are branches
of the same XLA computation — the compiler owns the overlap. Host control is
limited to the large-motion fallback (one scalar readback, mirroring the
reference's sequential re-run, ``:1121-1131``) and the 3-frame state rollover
(``:1660-1664``).

Output encoding (``:1622,1633-1634``): 255 = dynamic, 125 = static valid
depth, 0 = depth-invalid; plus the cluster label image for the mapping
back-end. The driver applies the final 15x15 ellipse dilation
(``rgbd_tum_noros.cc:108,138``).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from sindslam_tpu.config import CameraConfig, DynaConfig, FlowConfig, SystemConfig
from sindslam_tpu.frontend.clustering import seg_by_kmeans
from sindslam_tpu.frontend.edges import cal_occluded
from sindslam_tpu.frontend.flow_mask import flow_residual_mask, sample_weights
from sindslam_tpu.frontend.fusion import fuse_masks
from sindslam_tpu.frontend.rag_merge import rag_merge
from sindslam_tpu.ops import flow as flow_ops
from sindslam_tpu.ops import image as im


@functools.partial(jax.jit, static_argnames=("cfg",))
def _pyramid_fn(gray, cfg: FlowConfig):
    return flow_ops.working_pyramid(gray, cfg)


@functools.partial(jax.jit, static_argnames=("fcfg", "dcfg", "out_hw"))
def _flow_fallback_fn(pyr_cur, pyr_m1, pyr_m2, valid, prev_large,
                      fcfg: FlowConfig, dcfg: DynaConfig, out_hw,
                      prev_flow_w=None):
    return flow_ops.flow_fallback_from_pyramids(
        pyr_cur, pyr_m1, pyr_m2, valid, prev_large, fcfg,
        dcfg.large_motion_flow_px, dcfg.large_motion_frac, out_hw,
        prev_flow_w=prev_flow_w,
        compose_max_flow_px=dcfg.compose_max_flow_px)


@functools.partial(jax.jit, static_argnames=("cam", "cfg"))
def _geometry_fn(depth, prev_labels, cam: CameraConfig, cfg: DynaConfig):
    """k-means + edges + RAG merge (the 'geometry branch')."""
    kml, centers = seg_by_kmeans(depth, cam, cfg, prev_labels)
    er = cal_occluded(depth, cam, cfg)
    rr = rag_merge(kml, er.occluded1, er.occluded2, er.total_area, depth, cfg)
    return kml, er, rr


@functools.partial(jax.jit, static_argnames=("cfg",))
def _mask_fn(flow_u, flow_v, weight_map, valid, prev_high, label_img,
             cfg: DynaConfig, key, depth_m=None, prev_ratio_img=None,
             prev_dyn_score=None, unreliable=None, prev_dyn_depth=None,
             prev_dyn=None, flow_w=None, flow_scale=None):
    fm = flow_residual_mask(flow_u, flow_v, weight_map, valid, cfg, key,
                            depth_m=depth_m, unreliable=unreliable,
                            prev_dyn=prev_dyn)
    fu = fuse_masks(fm.low_mask, fm.high_mask, prev_high, label_img, valid,
                    cfg, prev_ratio_img=prev_ratio_img,
                    prev_dyn_score=prev_dyn_score,
                    prev_dyn_depth=prev_dyn_depth, depth_m=depth_m,
                    flow_w=flow_w, flow_scale=flow_scale)
    return fm, fu


class DynaDetector:
    """Stateful per-frame dynamic-region detector.

    State across frames (reference ``include/DynaDetect.h:164-179``): the two
    previous grayscale images (flow n->n-2), the previous dynamic mask and
    high-residual mask, previous cluster labels, and per-cluster dynamic
    ratios for the homography sampling weights.
    """

    def __init__(self, cfg: SystemConfig):
        self.cfg = cfg
        self.cam = cfg.camera
        h, w = self.cam.height, self.cam.width
        self._pyr_m1: Optional[tuple] = None    # working-scale flow pyramids
        self._pyr_m2: Optional[tuple] = None
        self._prev_large = jnp.asarray(False)
        self._prev_labels: Optional[jnp.ndarray] = None
        self._prev_high = jnp.zeros((h, w), bool)
        self._prev_mask = jnp.zeros((h, w), jnp.int32)
        self._prev_ratio_img = jnp.zeros((h, w), jnp.float32)
        self._dyn_score = jnp.zeros((h, w), jnp.float32)
        self._dyn_depth = jnp.zeros((h, w), jnp.float32)
        wh, ww = cfg.flow.working_height, cfg.flow.working_width
        self._flow_w = (jnp.zeros((wh, ww), jnp.float32),
                        jnp.zeros((wh, ww), jnp.float32))
        self._frame_idx = 0
        self._key = jax.random.PRNGKey(0)

    def detect(self, rgb: jnp.ndarray, depth_m: jnp.ndarray
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """rgb (H, W, 3) uint8, depth (H, W) metres ->
        (dyna_mask (H, W) int32 255/125/0, label_img (H, W) int32)."""
        cfg = self.cfg
        gray = im.rgb_to_gray(rgb)
        valid = (depth_m > 0.05) & (depth_m <= cfg.dyna.max_depth_m)

        if self._pyr_m1 is None:
            # frame 0: no flow yet; everything valid is static
            kml, er, rr = _geometry_fn(depth_m, None, self.cam, cfg.dyna)
            mask = jnp.where(valid, cfg.dyna.mask_static, cfg.dyna.mask_invalid
                             ).astype(jnp.int32)
            self._pyr_m1 = _pyramid_fn(gray, cfg.flow)
            self._prev_labels = kml
            self._prev_mask = mask
            self._frame_idx = 1
            return mask, rr.label_img

        # ---- flow: n -> n-2 preferred, n -> n-1 on large motion (or frame
        # 1, where n-2 == n-1). The in-graph coarse pre-test runs against
        # the target predicted by the previous verdict BEFORE the expensive
        # fine levels (see flow.flow_fallback_from_pyramids); target
        # pyramids are cached across frames.
        pyr_cur = _pyramid_fn(gray, cfg.flow)
        pyr_m2 = self._pyr_m2 if self._pyr_m2 is not None else self._pyr_m1
        u, v, lm, photo_err, flow_raw_w = _flow_fallback_fn(
            pyr_cur, self._pyr_m1, pyr_m2, valid, self._prev_large,
            cfg.flow, cfg.dyna, (self.cam.height, self.cam.width),
            prev_flow_w=self._flow_w)
        unreliable = photo_err > cfg.dyna.photo_err_max

        # ---- geometry branch
        kml, er, rr = _geometry_fn(depth_m, self._prev_labels, self.cam, cfg.dyna)

        # ---- sampling weights from the previous mask / ratios
        self._key, k1 = jax.random.split(self._key)
        wmap = sample_weights(self._prev_mask, self._prev_ratio_img, cfg.dyna, k1)

        self._key, k2 = jax.random.split(self._key)
        fm, fu = _mask_fn(u, v, wmap, valid, self._prev_high, rr.label_img,
                          cfg.dyna, k2, depth_m=depth_m,
                          prev_ratio_img=self._prev_ratio_img,
                          prev_dyn_score=self._dyn_score,
                          unreliable=unreliable,
                          prev_dyn_depth=self._dyn_depth,
                          prev_dyn=self._prev_mask == cfg.dyna.mask_dynamic,
                          flow_w=flow_raw_w,
                          flow_scale=jnp.where(lm, 1.0, 0.5))

        mask = fu.dyna_mask

        # ---- state rollover (reference DynaDetect.cc:1660-1664)
        self._pyr_m2 = self._pyr_m1
        self._pyr_m1 = pyr_cur
        self._prev_large = lm
        self._prev_labels = kml
        self._prev_high = fm.high_mask
        self._prev_mask = mask
        self._prev_ratio_img = fu.ratio_img
        self._dyn_score = fu.dyn_score
        self._dyn_depth = fu.dyn_depth
        self._flow_w = (flow_raw_w[0], flow_raw_w[1])
        self._frame_idx += 1
        return mask, rr.label_img


def dilate_mask_for_tracking(mask: jnp.ndarray, cfg: DynaConfig) -> jnp.ndarray:
    """Driver-side 15x15 ellipse dilation of the dynamic class
    (reference ``rgbd_tum_noros.cc:108,138``)."""
    dyn = (mask == cfg.mask_dynamic).astype(jnp.float32)
    wide = im.dilate_ellipse(dyn, cfg.mask_dilate_ksize) > 0.5
    return jnp.where(wide, cfg.mask_dynamic, mask).astype(jnp.int32)
