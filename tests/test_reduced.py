"""Reduced-dimension dynamics path: parity with the full OSF-HQP pipeline.

Mirrors the reference's redu_dyn_test (tests/sp_test/redu_dyn_test.cpp:
263-360): the reduced pipeline must produce (near-)identical torques to the
full pipeline on the same state/task stack.
"""

import numpy as np
import pytest

from conftest import make_standard_robot


@pytest.fixture(scope="module")
def pair():
    rd = make_standard_robot(1)
    rd.CalcContactConstraint()
    rd.CalcGravCompensation()

    rr = make_standard_robot(1)
    rr.ReducedDynamicsCalculate()
    rr.ReducedCalcContactConstraint()
    rr.ReducedCalcGravCompensation()
    return rd, rr


def test_chain_classification(pair):
    _, rr = pair
    idx = rr._ridx
    # Tocabi double support: both legs = contact chain (12 joints)
    assert idx.co_dof == 12
    assert idx.nc_dof == 21
    assert idx.reduced_system_dof == 24
    assert set(idx.co_links) == {0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12}


def test_reduced_gravity_matches_full(pair):
    rd, rr = pair
    assert (
        np.linalg.norm(np.asarray(rr.torque_grav_) - np.asarray(rd.torque_grav_))
        < 1e-10
    )


def test_lumped_inertia_consistency(pair):
    """nc-chain lumped mass/COM equals the direct sum over nc bodies."""
    _, rr = pair
    m = rr.model
    idx = rr._ridx
    rdyn = rr.rdyn
    mass_direct = sum(m.mass[i] for i in idx.nc_links)
    assert abs(float(rdyn.mass_nc) - mass_direct) < 1e-10
    # total = co + nc
    assert abs(
        float(rdyn.mass_nc) + sum(m.mass[i] for i in idx.co_links) - m.total_mass
    ) < 1e-10


def test_reduced_task_torque_matches_full_noqp():
    rd = make_standard_robot(1)
    rd.CalcContactConstraint()
    rd.CalcGravCompensation()
    rd.CalcTaskControlTorque(False)

    rr = make_standard_robot(1)
    rr.ReducedDynamicsCalculate()
    rr.ReducedCalcContactConstraint()
    rr.ReducedCalcGravCompensation()
    rr.ReducedCalcTaskControlTorque(False)
    assert (
        np.linalg.norm(np.asarray(rr.torque_task_) - np.asarray(rd.torque_task_))
        < 1e-10
    )


def test_reduced_full_pipeline_similarity():
    """HQP path: total commanded torque similar to the full pipeline within
    QP tolerance (redu_dyn_test.cpp:324-326 expects ≈ 0)."""
    rd = make_standard_robot(1)
    rd.CalcContactConstraint()
    rd.CalcGravCompensation()
    rd.CalcTaskControlTorque(True)
    rd.CalcContactRedistribute(True)

    rr = make_standard_robot(1)
    rr.ReducedDynamicsCalculate()
    rr.ReducedCalcContactConstraint()
    rr.ReducedCalcGravCompensation()
    rr.ReducedCalcTaskControlTorque(True)
    rr.ReducedCalcContactRedistribute(True, tangential_weight=False)

    tau_full = rd.torque_command()
    tau_red = rr.torque_command()
    assert np.linalg.norm(
        np.asarray(rr.torque_task_) - np.asarray(rd.torque_task_)
    ) < 1e-3
    assert np.linalg.norm(tau_full - tau_red) < 5e-2

    # reference-fidelity objective (tangential weighting): different torque,
    # but the commanded contact forces still satisfy every cone/CoP bound
    rr.ReducedCalcContactRedistribute(True, tangential_weight=True)
    tau_w = rr.torque_command()
    cf = rr.getContactForce(tau_w)
    for i, c in enumerate(rr.active_contacts()):
        R = np.asarray(rr.state.R[c.link])
        w_local = np.concatenate(
            [R.T @ cf[6 * i : 6 * i + 3], R.T @ cf[6 * i + 3 : 6 * i + 6]]
        )
        fz = w_local[2]
        assert fz < 0
        assert abs(w_local[4] / fz) <= c.plane_x + 1e-5
        assert abs(w_local[3] / fz) <= c.plane_y + 1e-5
        assert abs(w_local[0] / fz) <= c.friction_ratio + 1e-5
        assert abs(w_local[1] / fz) <= c.friction_ratio + 1e-5
