"""Accuracy regression harness: masked-vs-unmasked ATE thresholds.

VERDICT r1 #6: the ATE claims must be enforced by tests, on sequences harder
than the single default scene — fast camera, multiple movers, occlusion
crossings. Protocol parity: reference ``ORB_SLAM2/EVO/evaluate_ate.py`` on
fr3_walking_*; here the deterministic synthetic benchmark sequences stand in
(no TUM data in this environment).

Fast (non-slow) tests run at scale 0.5 (320x240) with the pixel-denominated
config scaled to match; full-resolution runs are @slow. bench.py reports the
full-res dyn_walk pair on TPU every round.
"""

import numpy as np
import pytest

from sindslam_tpu.evaluation.benchmark import accuracy_pair

pytestmark = pytest.mark.filterwarnings("ignore")


def test_multi_mover_masked_beats_unmasked():
    """Three independent movers: dynamic masking must keep tracking accurate
    while the unmasked run degrades."""
    r = accuracy_pair("multi_mover", n_frames=6, scale=0.5, n_features=600)
    assert np.isfinite(r["ate_masked_m"]), r
    # calibrated 2026-08: masked 0.0071, unmasked 0.0114, iou 0.50
    assert r["ate_masked_m"] < 0.015, r
    assert r["ate_masked_m"] <= r["ate_unmasked_m"] * 1.05 + 1e-4, r
    # the detector must actually find the movers (and the parallax filter
    # must not suppress them). Floor raised 0.3 -> 0.45 (r3) -> 0.60 (r4:
    # redistributed dilation margin — the reported mask is the tight
    # segmentation; measured 0.709).
    assert r["mask_iou"] > 0.60, r


def test_static_scene_masking_is_harmless():
    """No movers: enabling DynaDetect must not hurt accuracy (false-positive
    masking would erase good features)."""
    r = accuracy_pair("static", n_frames=6, scale=0.5, n_features=600)
    # calibrated 2026-08: masked 0.0041, unmasked 0.0045 (the
    # parallax-consistency exclusion is what makes this pass: without it the
    # close boxes' n-2 parallax was masked and ATE degraded to 0.10+)
    assert r["ate_masked_m"] < 0.01, r
    assert r["ate_unmasked_m"] < 0.01, r
    assert r["ate_masked_m"] < r["ate_unmasked_m"] + 0.004, r


@pytest.mark.slow
def test_dyn_walk_full_res():
    r = accuracy_pair("dyn_walk", n_frames=10, scale=1.0)
    assert r["ate_masked_m"] < 0.01, r
    assert r["ate_masked_m"] < r["ate_unmasked_m"] + 1e-3, r
    # floor raised 0.3 -> 0.55 -> 0.6 -> 0.64 (r3) -> 0.70 (r4: the
    # detector had ZERO missed mover pixels — the IoU deficit was boundary
    # overshoot from the double safety dilation; the reported mask now
    # carries the tight 4-iteration dilation while the feature-erasure
    # ellipse grew to keep the reference's total margin: measured 0.729
    # full-res on CPU, ATE masked 1.8 mm vs 14.6 unmasked)
    assert r["mask_iou"] > 0.70, r


@pytest.mark.slow
def test_fast_camera_large_motion():
    """Large inter-frame motion (the n-1 flow fallback path).

    Root-caused in r4 (VERDICT r3 #3): the regression was never mask
    precision — running with the GROUND-TRUTH mask was equally bad (0.073
    vs our 0.070) — it was the FEATURE BUDGET: erasure removed the
    best-conditioned close-range corners and nothing replaced them. With
    per-level budget refill (extract_orb over-selects 1.5x and penalizes
    dynamic candidates), masked tracking matches or beats unmasked at 4x
    walking speed. Calibrated r4: masked 0.031, unmasked 0.032."""
    r = accuracy_pair("fast_cam", n_frames=8, scale=0.5, n_features=600)
    assert r["ate_masked_m"] < 0.05, r
    # the VERDICT r3 #3 done-criterion: masked <= 1.3x unmasked at 4x speed
    assert r["ate_masked_m"] <= r["ate_unmasked_m"] * 1.3 + 1e-3, r
    assert r["mask_iou"] > 0.3, r


@pytest.mark.slow
def test_occlusion_crossing():
    """A mover sweeping across a static box's line of sight. Calibrated
    r3: masked 0.0066, unmasked 0.0061, iou 0.67 — the r3 SLAM core
    (essential graph, reference culling, async mapping) lifted the
    UNMASKED baseline from r2's 0.0168 to parity, so the margin criterion
    is now noise-level equivalence, not a 3x win."""
    r = accuracy_pair("occlusion_cross", n_frames=8, scale=0.5,
                      n_features=600)
    assert r["ate_masked_m"] < 0.02, r
    assert r["ate_masked_m"] <= r["ate_unmasked_m"] * 1.2 + 1e-3, r
    assert r["mask_iou"] > 0.5, r
