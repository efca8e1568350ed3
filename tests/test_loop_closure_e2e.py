"""End-to-end loop closure on the room-orbit sequence (VERDICT r3 #1).

The single most important previously-untested behavior: a full SLAM run over
a trajectory that actually REVISITS a place. The camera orbits a closed
textured room (300 frames, one revolution) accumulating real drift; at the
revisit the BoW detector must fire, the 3D-3D RANSAC + essential-graph
correction must run, and the post-loop ATE must come in well under the
loop-closing-OFF run. Parity: ``ORB_SLAM2/src/LoopClosing.cc:402-577`` +
post-loop GBA ``Optimizer.cc:781``; evaluation per the TUM ATE protocol.
"""

import numpy as np
import pytest

pytestmark = [pytest.mark.filterwarnings("ignore"), pytest.mark.slow]


def test_room_orbit_loop_closure():
    from sindslam_tpu.evaluation.benchmark import loop_closure_pair

    # 1.3 revolutions: the revisit dwell spans several keyframes, so the
    # covisibility-consistency window (3 consecutive detections) can fill
    r = loop_closure_pair(n_frames=330, scale=0.5, n_features=800,
                          orbits=1.3)
    # (a) a loop is actually detected and corrected at the revisit
    assert r["loops_closed"] >= 1, r
    # (b) the correction acts on keyframes: the keyframe-trajectory ATE
    #     (ref SaveKeyFrameTrajectoryTUM protocol) must drop vs the
    #     loop-closing-OFF run. The r5 projection-space SearchAndFuse gives
    #     the post-loop GBA cross-loop constraints; calibrated on this env
    #     0.179 vs 0.272 (-34%), so the margin demands a SUBSTANTIAL
    #     correction, not merely "does not hurt" (r4 margin was 0.92 at
    #     -18% measured; VERDICT r4 #9 asked for the tightening).
    assert r["kf_ate_loop_on_m"] < 0.80 * r["kf_ate_loop_off_m"], r
    # (c) the full replayed trajectory must improve >= 10% too (diluted by
    #     inter-keyframe tracking noise; calibrated 0.211 vs 0.284, -26%)
    assert r["ate_loop_on_m"] < 0.90 * r["ate_loop_off_m"], r
    # the joint GBA bucket covered the whole map (<= 128 keyframes)
    assert r["n_keyframes"] <= 128, r
    # long-run scaling (VERDICT r3 #6): per-frame host time stays bounded
    # over 330 frames — median late-window cost within 2x the early window
    # (loop-closure/GBA frames are spikes by design; medians exclude them)
    assert r["frame_ms_median_late"] < 2.0 * r["frame_ms_median_early"], r
    # bookkeeping stays bounded by the live map, not the frame count
    assert r["n_obs_pairs"] < 40 * r["n_keyframes"] * 30, r


def test_loop_closure_never_harmful_5_seeds():
    """r4 verdict #1 done-criterion: loop-ON keyframe ATE <= loop-OFF on
    EVERY seed (the acceptance gate + rollback guarantee), strictly better
    on >= 3 of 5. A correction that can hurt is worse than none — the
    reference gates corrections so they never degrade the map
    (LoopClosing.cc:231-400). Promoted veryslow -> slow (r4 verdict #9:
    the sweep must gate CI once the correction layers landed)."""
    from sindslam_tpu.evaluation.benchmark import loop_closure_pair

    wins = 0
    results = []
    for seed in range(5):
        r = loop_closure_pair(n_frames=300, scale=0.5, n_features=800,
                              orbits=1.25, seed=seed)
        results.append({k: r[k] for k in
                        ("kf_ate_loop_on_m", "kf_ate_loop_off_m",
                         "loops_closed")})
        # never harmful (small numerical slack only)
        assert r["kf_ate_loop_on_m"] <= 1.02 * r["kf_ate_loop_off_m"], \
            (seed, results)
        if r["kf_ate_loop_on_m"] < 0.95 * r["kf_ate_loop_off_m"]:
            wins += 1
    assert wins >= 3, results
