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

    r = loop_closure_pair(n_frames=300, scale=0.5, n_features=800)
    # (a) a loop is actually detected and corrected at the revisit
    assert r["loops_closed"] >= 1, r
    # (b) loop closing must substantially beat the loop-closing-OFF run
    assert r["ate_loop_on_m"] < 0.6 * r["ate_loop_off_m"], r
    # (c) absolute quality: the corrected orbit closes to well under the
    #     drift scale (calibrated: see PROGRESS notes / bench line)
    assert r["ate_loop_on_m"] < 0.15, r
    # the joint GBA bucket covered the whole map (<= 128 keyframes)
    assert r["n_keyframes"] <= 128, r
