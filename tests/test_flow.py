"""Tests for the variational optical-flow solver.

Ground-truth flows come from analytic warps of a textured synthetic image, so
endpoint error (EPE) is measured exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sindslam_tpu.config import FlowConfig
from sindslam_tpu.ops import flow as F
from sindslam_tpu.ops import image as im


def _textured(h=96, w=128, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 255, (h // 4, w // 4)).astype(np.float32)
    img = np.asarray(im.resize_bilinear(jnp.asarray(base), (h, w)))
    fine = rng.uniform(-20, 20, (h, w)).astype(np.float32)
    return np.clip(img + fine * 0.5, 0, 255)


def _shift_image(img, dx, dy):
    """Subpixel shift by bilinear sampling: out(x) = img(x - d) so the flow
    img->out equals (dx, dy)."""
    h, w = img.shape
    ys = jnp.arange(h, dtype=jnp.float32)[:, None] - dy
    xs = jnp.arange(w, dtype=jnp.float32)[None, :] - dx
    out, _ = im.warp_bilinear(jnp.asarray(img), ys + jnp.zeros((h, w)), xs + jnp.zeros((h, w)))
    return np.asarray(out)


TEST_CFG = FlowConfig(
    alpha=0.197, gamma=50.0, pyramid_scale=0.8, n_levels=6,
    outer_iterations=10, inner_iterations=3, solver_iterations=8,
)


def _epe(u, v, gt_u, gt_v, margin=8):
    du = np.asarray(u)[margin:-margin, margin:-margin] - gt_u
    dv = np.asarray(v)[margin:-margin, margin:-margin] - gt_v
    return float(np.sqrt(du ** 2 + dv ** 2).mean())


def test_flow_zero_on_identical():
    img = _textured()
    u, v = F.variational_flow(jnp.asarray(img), jnp.asarray(img), TEST_CFG)
    assert float(jnp.abs(u).max()) < 0.05
    assert float(jnp.abs(v).max()) < 0.05


def test_flow_small_translation():
    img = _textured()
    img2 = _shift_image(img, 1.5, -0.75)
    u, v = F.variational_flow(jnp.asarray(img), jnp.asarray(img2), TEST_CFG)
    assert _epe(u, v, 1.5, -0.75) < 0.25


def test_flow_larger_translation_uses_pyramid():
    img = _textured(128, 160, seed=1)
    img2 = _shift_image(img, 6.0, 4.0)
    u, v = F.variational_flow(jnp.asarray(img), jnp.asarray(img2), TEST_CFG)
    assert _epe(u, v, 6.0, 4.0) < 0.6


def test_flow_detects_independent_motion():
    """A moving patch inside a still scene must light up only at the patch."""
    img = _textured(96, 128, seed=2)
    img2 = img.copy()
    # move a 24x24 block right by 3 px
    img2[30:54, 50:74] = img[30:54, 47:71]
    u, v = F.variational_flow(jnp.asarray(img), jnp.asarray(img2), TEST_CFG)
    u = np.asarray(u)
    inside = np.abs(u[36:48, 56:68]).mean()
    outside = np.abs(np.concatenate([u[:20].ravel(), u[-20:].ravel()])).mean()
    assert inside > 1.0
    assert outside < 0.4
    assert inside > 3 * outside


def test_flow_jit_compiles_once():
    img = _textured(64, 96, seed=3)
    img2 = _shift_image(img, 1.0, 0.5)
    cfg = FlowConfig(n_levels=4, outer_iterations=5, inner_iterations=2, solver_iterations=5)
    f = jax.jit(lambda a, b: F.variational_flow(a, b, cfg))
    u, v = f(jnp.asarray(img), jnp.asarray(img2))
    u2, v2 = f(jnp.asarray(img2), jnp.asarray(img))  # reverse, same shapes
    assert u.shape == (64, 96)
    # forward and backward flows should be roughly opposite
    assert float((np.asarray(u)[20:-20, 20:-20] + np.asarray(u2)[20:-20, 20:-20]).mean()) < 0.3


def test_pyramid_shapes_static():
    shapes = F.pyramid_shapes(288, 384, 0.8, 10)
    assert shapes[0] == (288, 384)
    assert all(min(s) >= 16 for s in shapes)
    assert len(shapes) == 10
    assert shapes[1] == (230, 307)


def _smooth_textured(h, w, seed):
    """Coarse blobby texture the solver can track through large motion
    (fine random noise aliases away at coarse pyramid levels, making ALL
    solvers — full or pre-test — underestimate; see debug note in r3)."""
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 255, (h // 12, w // 12)).astype(np.float32)
    return np.asarray(im.resize_bilinear(jnp.asarray(base), (h, w)))


class TestFlowWithFallback:
    """The coarse pre-test fallback must (a) agree with the full-solve
    large-motion decision, (b) match the accuracy of the branch it picks."""

    CFG = FlowConfig(n_levels=5, outer_iterations=6, inner_iterations=2,
                     solver_iterations=6, working_height=72, working_width=96,
                     fallback_pretest_level=2)

    def _run(self, gray, gray_m1, gray_m2, valid):
        return F.flow_with_fallback(
            jnp.asarray(gray), jnp.asarray(gray_m1), jnp.asarray(gray_m2),
            jnp.asarray(valid), self.CFG,
            large_motion_flow_px=10.0, large_motion_frac=0.30)

    def test_small_motion_stays_on_n2(self):
        img = _textured(120, 160, seed=5)
        g_m2 = img
        g_m1 = _shift_image(img, -1.0, -0.5)
        g = _shift_image(img, -2.0, -1.0)   # flow n->n-2 = (2, 1): small
        valid = np.ones((120, 160), bool)
        u, v, lm = self._run(g, g_m1, g_m2, valid)
        assert not bool(lm)
        # accuracy parity with the plain n->n-2 solve
        assert abs(float(np.asarray(u)[30:-30, 30:-30].mean()) - 2.0) < 0.5
        assert abs(float(np.asarray(v)[30:-30, 30:-30].mean()) - 1.0) < 0.5

    def test_large_motion_falls_back_to_n1(self):
        img = _smooth_textured(120, 160, seed=6)
        g_m2 = img
        g_m1 = _shift_image(img, -14.0, 0.0)
        g = _shift_image(img, -28.0, 0.0)   # n->n-2 = 28 px: large motion
        valid = np.ones((120, 160), bool)
        u, v, lm = self._run(g, g_m1, g_m2, valid)
        assert bool(lm)
        # the returned flow must be the n->n-1 field (~14 px), not n->n-2
        assert abs(float(np.asarray(u)[30:-30, 40:-30].mean()) - 14.0) < 3.0

    def test_wide_baseline_composition_on_large_motion(self):
        """On a large-motion frame with prev_flow_w given, the returned
        DETECTION flow is the n->n-1 solve composed with the previous
        frame's (warped) field — a constant 14 px/frame translation must
        yield a ~28 px composed field; the raw-state return stays ~14 px.
        With composition gated off (compose_max below the motion) the
        detection flow is the raw n->n-1 field."""
        img = _smooth_textured(120, 160, seed=6)
        g_m2 = img
        g_m1 = _shift_image(img, -14.0, 0.0)
        g = _shift_image(img, -28.0, 0.0)
        valid = jnp.ones((120, 160), bool)
        pyr = lambda x: F.working_pyramid(jnp.asarray(x), self.CFG)
        # previous frame's raw flow field (n-1 -> n-2 = 14 px), constant
        wh, ww = self.CFG.working_height, self.CFG.working_width
        pu = jnp.full((wh, ww), 14.0 * ww / 160.0)
        pv = jnp.zeros((wh, ww))
        u, v, lm, _pe, raw = F.flow_fallback_from_pyramids(
            pyr(g), pyr(g_m1), pyr(g_m2), valid, jnp.asarray(True),
            self.CFG, 10.0, 0.30, (120, 160), prev_flow_w=(pu, pv),
            compose_max_flow_px=100.0)
        assert bool(lm) and bool(raw[2])
        interior = np.asarray(u)[30:-30, 45:-40]
        assert abs(float(interior.mean()) - 28.0) < 3.0, interior.mean()
        raw_mean = float(np.asarray(raw[0]).mean()) * (160.0 / ww)
        assert abs(raw_mean - 14.0) < 3.0, raw_mean
        # gate off: detection flow is the raw n->n-1 field
        u2, _v2, lm2, _pe2, raw2 = F.flow_fallback_from_pyramids(
            pyr(g), pyr(g_m1), pyr(g_m2), valid, jnp.asarray(True),
            self.CFG, 10.0, 0.30, (120, 160), prev_flow_w=(pu, pv),
            compose_max_flow_px=5.0)
        assert bool(lm2) and not bool(raw2[2])
        assert abs(float(np.asarray(u2)[30:-30, 45:-40].mean()) - 14.0) < 3.0

    def test_decision_matches_full_solve_decision(self):
        """The coarse-level decision agrees with the round-2 semantics
        (full-res magnitude histogram of the complete n->n-2 solve) on
        clearly-small and clearly-large motions."""
        for seed, shift, expect_large in [(7, 3.0, False), (8, 26.0, True)]:
            img = _smooth_textured(120, 160, seed=seed)
            g_m1 = _shift_image(img, -shift / 2, 0.0)
            g = _shift_image(img, -shift, 0.0)
            valid = np.ones((120, 160), bool)
            _u, _v, lm = self._run(g, g_m1, img, valid)
            # golden: decision from the FULL n->n-2 solve
            uf, vf = F.flow_at_working_scale(
                jnp.asarray(g), jnp.asarray(img), self.CFG)
            mag = np.sqrt(np.asarray(uf) ** 2 + np.asarray(vf) ** 2)
            frac_below = (mag <= 10.0).mean()
            assert (frac_below < 0.30) == expect_large
            assert bool(lm) == expect_large


def test_flow_at_working_scale_resolution():
    img = _textured(120, 160, seed=4)
    img2 = _shift_image(img, 2.0, 1.0)
    cfg = FlowConfig(n_levels=4, outer_iterations=6, inner_iterations=2,
                     solver_iterations=6, working_height=72, working_width=96)
    u, v = F.flow_at_working_scale(jnp.asarray(img), jnp.asarray(img2), cfg)
    assert u.shape == (120, 160)
    # magnitude must be in full-res units despite the 0.6x solve
    assert abs(float(np.asarray(u)[30:-30, 30:-30].mean()) - 2.0) < 0.5
