"""Independent flow validation (r4 verdict #6): EPE and masking behavior on
imagery with DIFFERENT statistics from the generator the solver is tuned on.

Three probes, matching the Brox parameters the pipeline claims parity with
(``src/DynaDetect.cc:1028-1033``):

1. EPE on the held-out Gabor/dot texture family (no value-noise, no checker
   lattice) — the solver must generalize, not overfit the training texture.
2. Pure camera rotation: the RANSAC homography compensation is EXACTLY
   right (a rotation-only flow field IS a homography), so the residual mask
   must stay empty on a static scene.
3. Forward zoom: the homography is exactly WRONG (parallax at every depth
   discontinuity); the parallax-consistency exclusion must keep the static
   scene from mass false positives.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sindslam_tpu.datasets.synthetic import (make_default_scene,
                                             make_trajectory, _scale_scene)
from sindslam_tpu.evaluation.benchmark import scaled_system_config
from sindslam_tpu.ops import flow as flow_ops
from sindslam_tpu.ops import image as im

pytestmark = pytest.mark.filterwarnings("ignore")

SCALE = 0.5


def _render_pair(scene, T1, T2):
    rgb1, depth1, _ = scene.render(T1)
    rgb2, depth2, _ = scene.render(T2)
    return rgb1, depth1, rgb2, depth2


def _gt_flow(scene, depth1, T1, T2):
    H, W = depth1.shape
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float64)
    z = depth1.astype(np.float64)
    x = (xs - scene.cx) / scene.fx * z
    y = (ys - scene.cy) / scene.fy * z
    pts_c1 = np.stack([x, y, z], -1)
    T12 = np.linalg.inv(T2) @ T1
    p2 = pts_c1 @ T12[:3, :3].T + T12[:3, 3]
    u_gt = p2[..., 0] / p2[..., 2] * scene.fx + scene.cx - xs
    v_gt = p2[..., 1] / p2[..., 2] * scene.fy + scene.cy - ys
    valid = (z > 0.1) & (p2[..., 2] > 0.1)
    return u_gt, v_gt, valid


def _epe(cfg, scene, T1, T2):
    rgb1, depth1, rgb2, _ = _render_pair(scene, T1, T2)
    u_gt, v_gt, valid = _gt_flow(scene, depth1, T1, T2)
    g1 = im.rgb_to_gray(jnp.asarray(rgb1))
    g2 = im.rgb_to_gray(jnp.asarray(rgb2))
    # NOTE argument order matches the pipeline: (current, previous) solves
    # current->previous flow; here we want T1->T2 so pass (g2's target last)
    u, v = flow_ops.flow_at_working_scale(g1, g2, cfg.flow)
    un, vn = np.asarray(u), np.asarray(v)
    sel = valid & (np.hypot(u_gt, v_gt) < 60)
    epe = np.sqrt((un - u_gt) ** 2 + (vn - v_gt) ** 2)
    return float(epe[sel].mean()), float(np.hypot(u_gt, v_gt)[sel].mean())


def _mask_fraction(cfg, scene, T1, T2):
    """Dynamic-pixel fraction of the flow-residual mask on a STATIC scene
    (any firing is a false positive)."""
    from sindslam_tpu.frontend.flow_mask import flow_residual_mask

    rgb1, depth1, rgb2, _ = _render_pair(scene, T1, T2)
    g1 = im.rgb_to_gray(jnp.asarray(rgb1))
    g2 = im.rgb_to_gray(jnp.asarray(rgb2))
    u, v = flow_ops.flow_at_working_scale(g1, g2, cfg.flow)
    valid = (jnp.asarray(depth1) > 0.05) & (jnp.asarray(depth1) < 8.0)
    fm = flow_residual_mask(u, v, jnp.ones_like(g1), valid, cfg.dyna,
                            jax.random.PRNGKey(0),
                            depth_m=jnp.asarray(depth1))
    high = np.asarray(fm.high_mask) > 0
    return float(high.mean())


def _scene(style):
    sc = make_default_scene(seed=3, with_dynamic=False, texture_style=style)
    return _scale_scene(sc, SCALE)


def _pose(R=None, t=None):
    T = np.eye(4)
    if R is not None:
        T[:3, :3] = R
    if t is not None:
        T[:3, 3] = t
    return T


def test_flow_epe_heldout_vs_train():
    """EPE on the held-out family must be in the same class as the training
    family — an overfit solver collapses on out-of-family texture."""
    cfg = scaled_system_config(SCALE)
    poses = make_trajectory(8, amplitude=0.25, seed=0)
    epe_train, mag_t = _epe(cfg, _scene("train"), poses[2], poses[4])
    epe_held, mag_h = _epe(cfg, _scene("heldout"), poses[2], poses[4])
    assert mag_h > 1.0, mag_h          # real motion rendered
    # calibrated: train 0.52 px / held-out 0.62 px at 0.5 scale (r5); the
    # bound leaves ~2x headroom before declaring generalization broken
    assert epe_held < 1.6, (epe_held, epe_train)
    assert epe_held < 3.0 * max(epe_train, 0.3), (epe_held, epe_train)


def test_pure_rotation_mask_silent():
    """Rotation-only motion: the homography compensation is exact, so the
    high mask must not fire on a static held-out scene."""
    cfg = scaled_system_config(SCALE)
    yaw = np.deg2rad(1.2)
    R = np.array([[np.cos(yaw), 0, np.sin(yaw)], [0, 1, 0],
                  [-np.sin(yaw), 0, np.cos(yaw)]])
    frac = _mask_fraction(cfg, _scene("heldout"), _pose(), _pose(R=R))
    assert frac < 0.01, frac


def test_zoom_parallax_not_masked():
    """Forward zoom: the homography is structurally wrong (depth-dependent
    residual at every discontinuity); the parallax-consistency exclusion
    must keep static false positives bounded."""
    cfg = scaled_system_config(SCALE)
    frac = _mask_fraction(cfg, _scene("heldout"), _pose(),
                          _pose(t=[0, 0, 0.08]))
    assert frac < 0.05, frac
