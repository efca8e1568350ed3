"""Monocular Sim(3) loop closure end-to-end on RENDERED frames (r4 #5).

Real mono tracking over a room orbit accumulates real scale drift; the loop
must be detected via BoW, solved by the scale-estimating Horn RANSAC
(``Sim3Solver.cc`` parity), and corrected through the 7-DoF essential graph
(``Optimizer.cc:781`` with ``bFixScale=false``). Previously the Sim3 path
was only exercised on fabricated keyframes (``tests/test_sim3.py``)."""

import numpy as np
import pytest

pytestmark = [pytest.mark.filterwarnings("ignore"), pytest.mark.slow]


def test_mono_orbit_sim3_loop_closure():
    from sindslam_tpu.evaluation.benchmark import mono_loop_closure_pair

    r = mono_loop_closure_pair(n_frames=260, scale=0.5, n_features=800,
                               orbits=1.25)
    assert r["initialized"], r
    # (a) a Sim3 loop is actually detected and survives the acceptance gates
    assert r["loops_closed"] >= 1, r
    # (b) the loop edge measured REAL scale drift (a rigid loop would have
    #     s = 1): mono drift on this orbit reliably exceeds half a percent
    s = np.array(r["loop_scales"], np.float64)
    assert np.all(np.isfinite(s)) and np.all((s > 0.5) & (s < 2.0)), r
    # (c) the correction helps: scale-aligned keyframe ATE (TUM -s mode)
    #     must not get worse, and should improve
    assert r["kf_ate_loop_on_m"] <= 1.02 * r["kf_ate_loop_off_m"], r
