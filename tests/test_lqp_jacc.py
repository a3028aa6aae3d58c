"""Acceleration-level solvers: LQP lexicographic cascade + JACC per-level QPs.

The reference validates these by cross-family comparison (sp_test/
jacc_compare.cpp): torque-level HQP, acceleration-level JACC, and LQP must
produce similar torques on the same state. No goldens exist; we assert
(a) internal optimality/feasibility, (b) cross-family similarity.
"""

import numpy as np
import pytest

from conftest import make_standard_robot

MILD_F1 = np.array([0.05, 0.1, 0.05, 0.02, -0.02, 0.03])
MILD_F2 = np.array([0.02, -0.02, 0.02])


@pytest.fixture(scope="module")
def hqp_robot():
    rd = make_standard_robot(1)
    rd.SetTaskSpace(0, MILD_F1)
    rd.SetTaskSpace(1, MILD_F2)
    rd.CalcContactConstraint()
    rd.CalcGravCompensation()
    rd.CalcTaskControlTorque(True)
    rd.CalcContactRedistribute(True)
    return rd


def test_lqp_hierarchy_semantics(hqp_robot):
    rd = hqp_robot
    rd.ConfigureLQP()
    tau = rd.CalcControlTorqueLQP()
    res = rd.lqp_result
    st = rd.state
    y = np.asarray(res.y)
    qdd, fc = y[:39], y[39:]
    # L0 equality: floating-base Newton-Euler rows exactly satisfied
    ne = np.asarray(st.A)[:6] @ qdd + np.asarray(st.B)[:6] + np.asarray(rd.J_C).T[:6] @ fc
    assert np.linalg.norm(ne) < 1e-8
    # L1 equality: no contact acceleration
    assert np.linalg.norm(np.asarray(rd.J_C) @ qdd) < 1e-4
    # torque limits (L0 inequality, limit 200 per the builder)
    assert np.abs(tau).max() <= 200.0 + 1e-6
    assert np.isfinite(tau).all()


def test_lqp_similar_to_hqp(hqp_robot):
    rd = hqp_robot
    tau_hqp = rd.torque_command()
    rd.ConfigureLQP()
    tau_lqp = rd.CalcControlTorqueLQP()
    # different formulation, same physics: torques agree to a few percent
    assert np.linalg.norm(tau_lqp - tau_hqp) < 0.1 * np.linalg.norm(tau_hqp)


def test_jacc_similar_to_hqp(hqp_robot):
    rd = hqp_robot
    rd.qp_iters = 60
    tau_hqp = rd.torque_command()
    tau_jacc = rd.CalcTaskControlTorqueJACC()
    assert float(rd.jacc_result.primal_res) < 1e-8
    assert np.linalg.norm(tau_jacc - tau_hqp) < 0.1 * np.linalg.norm(tau_hqp)
    rd.qp_iters = 25


def test_jacc_dynamics_consistency(hqp_robot):
    """The JACC solution satisfies the full EoM: A q̈ + G = Sᵀτ − J_Cᵀ f_c."""
    rd = hqp_robot
    rd.qp_iters = 60
    rd.CalcTaskControlTorqueJACC()
    st = rd.state
    x = np.asarray(rd.jacc_result.x)
    n, m, c = 39, 33, 12
    qdd, tau, fc = x[:n], x[n : n + m], x[n + m : n + m + c]
    lhs = np.asarray(st.A) @ qdd + np.asarray(st.G)
    rhs = np.concatenate([np.zeros(6), tau]) - np.asarray(rd.J_C).T @ fc
    assert np.linalg.norm(lhs - rhs) < 1e-7
    rd.qp_iters = 25


def test_reduced_lqp_cascade(hqp_robot):
    """ConfigureLQP_R / CalcControlTorqueLQP_R + the _R_NC cascade
    (src/dwbc.cpp:4504-4760): reduced-coordinate LQP agrees with the
    torque-level HQP on the contact chain, and the nc cascade produces
    finite, bounded arm torques consistent with the HQP result."""
    import jax.numpy as jnp

    rd = hqp_robot
    tau_hqp = rd.torque_command()
    rd.ReducedDynamicsCalculate()
    rd.ReducedCalcContactConstraint()
    rd.ReducedCalcGravCompensation()
    rd.ConfigureLQP_R()
    tau_r = rd.CalcControlTorqueLQP_R()
    assert np.isfinite(tau_r).all()
    co = rd._ridx.co_dof
    assert np.linalg.norm(tau_r[:co] - tau_hqp[:co]) < 0.1 * np.linalg.norm(tau_hqp[:co])

    q_acc_R = rd.lqp_r_result.y[: rd._ridx.reduced_system_dof]
    rd.ConfigureLQP_R_NC(q_acc_R)
    tau_nc = rd.CalcControlTorqueLQP_R_NC()
    assert tau_nc.shape == (rd._ridx.nc_dof,)
    assert np.isfinite(tau_nc).all()
    assert np.linalg.norm(tau_nc - tau_hqp[co:]) < 0.5 * max(
        np.linalg.norm(tau_hqp[co:]), 1.0
    )


def test_jacc_r_nc_chain(hqp_robot):
    """CalcTaskControlTorqueJACC_R_NC (src/dwbc.cpp:4124-4302): nc-chain
    acceleration QP coupled to the reduced solution through the lumped-body
    COM-acceleration equality."""
    rd = hqp_robot
    rd.qp_iters = 60
    rd.ReducedDynamicsCalculate()
    rd.ReducedCalcContactConstraint()
    rd.ReducedCalcGravCompensation()
    rd.CalcTaskControlTorqueJACC_R()
    tau_nc = rd.CalcTaskControlTorqueJACC_R_NC()
    assert float(rd.jacc_r_nc_result.primal_res) < 1e-7
    idx = rd._ridx
    rdyn = rd.rdyn
    qdd = np.asarray(rd.acc_jacc_nc_)
    gacc = np.asarray(rd.gacc_jacc_nc_)
    # nc EoM equality: A_nc q̈ + G_nc = τ_nc
    assert np.linalg.norm(
        np.asarray(rdyn.A_NC_joint) @ qdd + np.asarray(rdyn.G_NC) - tau_nc
    ) < 1e-6
    # COM coupling: J_I_nc q̈ = ḡ_prev + g_acc (slack g_acc is minimized)
    prev_gacc = np.asarray(rd.acc_jacc_R_)[-6:]
    assert np.linalg.norm(
        np.asarray(rdyn.J_I_nc) @ qdd - gacc - prev_gacc
    ) < 1e-6
    assert np.isfinite(tau_nc).all()
    assert tau_nc.shape == (idx.nc_dof,)
    rd.qp_iters = 25


def test_jacc_reduced_coordinates(hqp_robot):
    """CalcTaskControlTorqueJACC_R (src/dwbc.cpp:3946-4122): reduced
    acceleration QPs agree with the torque-level HQP on the contact chain."""
    rd = hqp_robot
    rd.qp_iters = 60
    tau_hqp = rd.torque_command()
    rd.ReducedDynamicsCalculate()
    rd.ReducedCalcContactConstraint()
    rd.ReducedCalcGravCompensation()
    rd.CalcTaskControlTorqueJACC_R()
    assert float(rd.jacc_r_result.primal_res) < 1e-8
    full = np.asarray(rd.torque_jacc_full_)
    co = rd._ridx.co_dof
    assert np.linalg.norm(full[:co] - tau_hqp[:co]) < 0.1 * np.linalg.norm(tau_hqp[:co])
    rd.qp_iters = 25
