#!/usr/bin/env python3
"""Per-stage mask-IoU diagnosis on a benchmark sequence (dev tool).

Where does the detector lose IoU vs ground truth? For each frame, reports
recall/precision of every stage of the mask chain:

  low residual -> high residual -> eligible seeds -> filled -> promoted ->
  final (encoded+dilated)

Usage: [SEQ=dyn_walk] [SCALE=0.5] [FRAMES=8] python tools/profile_mask_iou.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from sindslam_tpu.utils import setup_compilation_cache
setup_compilation_cache()

from sindslam_tpu.datasets.synthetic import make_benchmark_sequence
from sindslam_tpu.evaluation.benchmark import scaled_system_config
from sindslam_tpu.frontend.clustering import seg_by_kmeans
from sindslam_tpu.frontend.edges import cal_occluded
from sindslam_tpu.frontend.flow_mask import flow_residual_mask, sample_weights
from sindslam_tpu.frontend.fusion import fuse_masks
from sindslam_tpu.frontend.rag_merge import rag_merge
from sindslam_tpu.ops import flow as flow_ops
from sindslam_tpu.ops import image as im

SEQ = os.environ.get("SEQ", "dyn_walk")
SCALE = float(os.environ.get("SCALE", "0.5"))
FRAMES = int(os.environ.get("FRAMES", "8"))

cfg = scaled_system_config(SCALE, n_features=600)
frames, _sc = make_benchmark_sequence(SEQ, n_frames=FRAMES, seed=0,
                                      scale=SCALE)


def pr(pred, gt):
    pred = np.asarray(pred, bool)
    gt = np.asarray(gt, bool)
    tp = (pred & gt).sum()
    rec = tp / max(gt.sum(), 1)
    prec = tp / max(pred.sum(), 1)
    iou = tp / max((pred | gt).sum(), 1)
    return rec, prec, iou


key = jax.random.PRNGKey(0)
pyr_m1 = pyr_m2 = None
prev_large = jnp.asarray(False)
prev_mask = jnp.zeros((cfg.camera.height, cfg.camera.width), jnp.int32)
prev_high = jnp.zeros((cfg.camera.height, cfg.camera.width), bool)
ratio_img = jnp.zeros((cfg.camera.height, cfg.camera.width), jnp.float32)
dyn_score = jnp.zeros((cfg.camera.height, cfg.camera.width), jnp.float32)
dyn_depth_st = jnp.zeros((cfg.camera.height, cfg.camera.width), jnp.float32)
prev_labels = None
flow_w = None

rows = []
for fi, (rgb, depth, gt_dyn, _p, _t) in enumerate(frames):
    gray = im.rgb_to_gray(jnp.asarray(rgb))
    d = jnp.asarray(depth)
    valid = (d > 0.05) & (d <= cfg.dyna.max_depth_m)
    pyr_cur = flow_ops.working_pyramid(gray, cfg.flow)
    if pyr_m1 is None:
        pyr_m1 = pyr_m2 = pyr_cur
        kml, _ = seg_by_kmeans(d, cfg.camera, cfg.dyna, prev_labels)
        prev_labels = kml
        continue
    u, v, lm, photo_err, flow_raw_w = flow_ops.flow_fallback_from_pyramids(
        pyr_cur, pyr_m1, pyr_m2, valid, prev_large, cfg.flow,
        cfg.dyna.large_motion_flow_px, cfg.dyna.large_motion_frac,
        (cfg.camera.height, cfg.camera.width), prev_flow_w=flow_w,
        compose_max_flow_px=cfg.dyna.compose_max_flow_px)
    unreliable = photo_err > cfg.dyna.photo_err_max
    kml, _ = seg_by_kmeans(d, cfg.camera, cfg.dyna, prev_labels)
    er = cal_occluded(d, cfg.camera, cfg.dyna)
    rr = rag_merge(kml, er.occluded1, er.occluded2, er.total_area, d, cfg.dyna)
    key, k1, k2 = jax.random.split(key, 3)
    wmap = sample_weights(prev_mask, ratio_img, cfg.dyna, k1)
    fm = flow_residual_mask(u, v, wmap, valid, cfg.dyna, k2, depth_m=d,
                            unreliable=unreliable)
    fu = fuse_masks(fm.low_mask, fm.high_mask, prev_high, rr.label_img,
                    valid, cfg.dyna, prev_ratio_img=ratio_img,
                    prev_dyn_score=dyn_score, prev_dyn_depth=dyn_depth_st,
                    depth_m=d, flow_w=flow_raw_w,
                    flow_scale=jnp.where(lm, 1.0, 0.5))
    dyn_wide = im.dilate_ellipse((fu.dyna_mask == cfg.dyna.mask_dynamic
                                  ).astype(jnp.float32),
                                 cfg.dyna.mask_dilate_ksize) > 0.5

    gt = np.asarray(gt_dyn, bool)
    if gt.sum() > 0:
        stats = {
            "low": pr(fm.low_mask, gt),
            "high": pr(fm.high_mask, gt),
            "filled": pr(fu.filled, gt),
            "final255": pr(np.asarray(fu.dyna_mask) == cfg.dyna.mask_dynamic,
                           gt),
            "driver_dil": pr(dyn_wide, gt),
        }
        row = {"frame": fi, "lm": bool(lm),
               "low_px": int(np.asarray(fm.low_mask).sum()),
               "high_px": int(np.asarray(fm.high_mask).sum()),
               "gt_px": int(gt.sum()),
               "thr": (float(fm.low_thresh), float(fm.high_thresh))
               if hasattr(fm, "low_thresh") else None}
        rows.append((row, stats))

    pyr_m2, pyr_m1 = pyr_m1, pyr_cur
    prev_large = lm
    prev_labels = kml
    prev_mask = fu.dyna_mask
    prev_high = fm.high_mask
    ratio_img = fu.ratio_img
    dyn_score = fu.dyn_score
    dyn_depth_st = fu.dyn_depth
    flow_w = (flow_raw_w[0], flow_raw_w[1])

print(f"sequence={SEQ} scale={SCALE} frames={FRAMES}")
for row, stats in rows:
    print(f"frame {row['frame']:2d} lm={int(row['lm'])} gt={row['gt_px']:6d} "
          f"low={row['low_px']:6d} high={row['high_px']:6d} thr={row['thr']}")
    for name, (rec, prec, iou) in stats.items():
        print(f"    {name:10s} recall={rec:.3f} precision={prec:.3f} "
              f"iou={iou:.3f}")
mean_iou = np.mean([s["final255"][2] for _r, s in rows])
mean_iou_d = np.mean([s["driver_dil"][2] for _r, s in rows])
print(f"MEAN final-mask IoU {mean_iou:.3f}  (driver-dilated {mean_iou_d:.3f})")
