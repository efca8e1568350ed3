"""Depth-free PnP RANSAC (VERDICT r3 #7): pose with NO prior from 2D-3D
pairs, robust to outliers — the reference's EPnP+RANSAC relocalization role
(``ORB_SLAM2/src/PnPsolver.cc``, used at ``Tracking.cc:357``)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sindslam_tpu.config import SystemConfig
from sindslam_tpu.geometry import se3
from sindslam_tpu.slam.pnp import ransac_pnp, relocalize_pnp

pytestmark = pytest.mark.filterwarnings("ignore")


def _scene(rng, n=200, xi=None):
    cfg = SystemConfig()
    cam = cfg.camera
    if xi is None:
        xi = np.array([0.4, -0.3, 0.5, 0.3, -0.2, 0.25], np.float32)
    Tcw = np.asarray(se3.se3_exp(jnp.asarray(xi)[None]))[0]
    # world points in front of the camera
    pc = np.stack([rng.uniform(-1.5, 1.5, n), rng.uniform(-1.0, 1.0, n),
                   rng.uniform(1.5, 6.0, n)], -1)
    Twc = np.linalg.inv(Tcw)
    pw = pc @ Twc[:3, :3].T + Twc[:3, 3]
    u = pc[:, 0] / pc[:, 2] * cam.fx + cam.cx
    v = pc[:, 1] / pc[:, 2] * cam.fy + cam.cy
    uv = np.stack([u, v], -1)
    inb = (u > 0) & (u < cam.width) & (v > 0) & (v < cam.height)
    return cfg, cam, Tcw, pw.astype(np.float32), uv.astype(np.float32), inb


def _pose_err(T_est, Tcw):
    e = np.asarray(se3.se3_log(jnp.asarray(
        (np.asarray(T_est) @ np.linalg.inv(Tcw))[None].astype(np.float32))))[0]
    return np.linalg.norm(e)


def test_ransac_pnp_no_prior_with_outliers():
    rng = np.random.default_rng(0)
    cfg, cam, Tcw, pw, uv, inb = _scene(rng)
    uv += rng.normal(0, 0.5, uv.shape)            # pixel noise
    out = rng.choice(len(pw), 60, replace=False)  # 30% outliers
    uv[out] += rng.uniform(40, 200, (60, 2)) * rng.choice([-1, 1], (60, 2))
    T_est, inl = ransac_pnp(jnp.asarray(pw), jnp.asarray(uv),
                            jnp.asarray(inb), cam, jax.random.PRNGKey(1))
    assert _pose_err(T_est, Tcw) < 0.03, _pose_err(T_est, Tcw)
    inl = np.asarray(inl)
    true_in = np.setdiff1d(np.where(inb)[0], out)
    assert inl[true_in].mean() > 0.8
    assert inl[out].mean() < 0.1


def test_relocalize_pnp_polish_mono():
    """Mono observations only (ur = -1): the GN polish must still converge
    from the DLT init — the mono kidnapping case the old
    GN-from-candidate-pose path could not serve."""
    rng = np.random.default_rng(2)
    cfg, cam, Tcw, pw, uv, inb = _scene(rng)
    uv += rng.normal(0, 0.3, uv.shape)
    key = jax.random.PRNGKey(3)
    T_est, n_inl = relocalize_pnp(jnp.asarray(pw), jnp.asarray(uv),
                                  jnp.asarray(inb), cam, cfg.tracking, key)
    assert T_est is not None
    assert n_inl > 0.8 * inb.sum()
    assert _pose_err(T_est, Tcw) < 0.01, _pose_err(T_est, Tcw)


def test_pnp_far_from_any_prior():
    """The recovered pose is 'far from everything': no initialization any
    candidate keyframe could provide — RANSAC must still find it (this is
    exactly where seeding GN at a candidate pose fails)."""
    rng = np.random.default_rng(4)
    xi = np.array([1.5, -2.0, 3.0, 0.9, -1.1, 0.7], np.float32)  # big motion
    cfg, cam, Tcw, pw, uv, inb = _scene(rng, xi=xi)
    T_est, inl = ransac_pnp(jnp.asarray(pw), jnp.asarray(uv),
                            jnp.asarray(inb), cam, jax.random.PRNGKey(5))
    assert _pose_err(T_est, Tcw) < 0.02, _pose_err(T_est, Tcw)
