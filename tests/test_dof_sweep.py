"""DoF-sweep validation: full-vs-reduced parity across model topologies.

The reference validates its reduced-dimension construction across a 28-member
URDF family (tests/dof_test/dyros_tocabi_dof18..45.urdf) with the
dof_comparison executable (tests/sp_test/dof_comparison.cpp) and expects the
reduced pipeline's torques to match the full pipeline's (~0 similarity,
redu_dyn_test.cpp:324-326).  Here: the extreme ends of the family (18 and 45
DoF) run both pipelines with QP disabled — the analytic paths must agree to
linear-algebra accuracy, which exercises chain classification, nc-lumping,
and recomposition on very different topologies.
"""

import glob
import os

import numpy as np
import pytest

DOF_DIR = "/root/reference/tests/dof_test"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DOF_DIR), reason="reference dof_test URDFs not present"
)

ALL_DOFS = sorted(
    int(os.path.basename(u)[len("dyros_tocabi_dof"):-len(".urdf")])
    for u in glob.glob(os.path.join(DOF_DIR, "dyros_tocabi_dof*.urdf"))
)


def _build(urdf):
    import jax.numpy as jnp

    from libdwbc_tpu.kin.engine import Kinematics
    from libdwbc_tpu.model.compile import compile_urdf
    from libdwbc_tpu.wbc import types as T
    from libdwbc_tpu.wbc.robot import RobotData

    rd = RobotData(dtype=jnp.float64)
    rd.model = compile_urdf(urdf, floating=True)
    rd.kin = Kinematics(rd.model)
    rd.AddContactConstraint(6, T.CONTACT_6D, [0.03, 0, -0.1585], [0, 0, 1], 0.15, 0.075)
    rd.AddContactConstraint(12, T.CONTACT_6D, [0.03, 0, -0.1585], [0, 0, 1], 0.15, 0.075)
    rd.AddTaskSpace(0, T.TASK_LINK_6D, 0, np.zeros(3))
    rd.SetTorqueLimit(np.full(rd.model_dof_, 300.0))
    q = np.zeros(rd.model.nq)
    q[2] = 0.92983
    q[rd.model.ndof] = 1.0
    q[6 : 6 + 12] = [0.0, 0.0, -0.24, 0.6, -0.36, 0.0] * 2
    rd.UpdateKinematics(q, np.zeros(rd.model.ndof))
    rd.SetContact(True, True)
    rd.SetTaskSpace(0, np.array([0.1, 0.4, 0.1, 0.1, -0.1, 0.1]))
    return rd


@pytest.mark.parametrize("dof", [18, 45])
def test_full_vs_reduced_noqp_parity(dof):
    urdf = os.path.join(DOF_DIR, f"dyros_tocabi_dof{dof}.urdf")
    rd = _build(urdf)

    rd.CalcContactConstraint()
    tg_full = rd.CalcGravCompensation()
    rd.CalcTaskControlTorque(hqp=False)
    tau_full = np.asarray(rd.torque_grav_ + rd.torque_task_)

    rd.ReducedDynamicsCalculate()
    rd.ReducedCalcContactConstraint()
    tg_red = rd.ReducedCalcGravCompensation()
    rd.ReducedCalcTaskControlTorque(hqp=False)
    tau_red = np.asarray(rd.torque_grav_ + rd.torque_task_)

    assert rd.model_dof_ == dof
    if not getattr(rd, "_reduced_degenerate", False):
        # reduced dimension = contact-chain dof + 6 lumped dofs; at 18 DoF
        # this equals the full dimension (the reduction pays off above that,
        # matching the reference's dof_comparison findings)
        assert rd._ridx.reduced_model_dof == rd._ridx.co_dof + 6
        assert rd._ridx.reduced_model_dof <= rd.model_dof_
    # gravity parity is pre-QP linear algebra: tight
    assert np.abs(np.asarray(tg_full) - np.asarray(tg_red)).max() < 1e-8
    # task torque parity (analytic, no QP): the reference's similarity ≈ 0
    scale = max(np.abs(tau_full).max(), 1.0)
    assert np.abs(tau_full - tau_red).max() / scale < 1e-8
    assert np.isfinite(tau_red).all()


@pytest.mark.parametrize("dof", ALL_DOFS)
def test_full_vs_reduced_hqp_parity(dof):
    """QPs-ON full-vs-reduced parity across the complete 28-member topology
    family (tests/dof_test/dyros_tocabi_dof18..45.urdf), asserting the
    repo's own tolerance policy (CLAUDE.md):

    * τ_grav: pre-QP linear algebra → 1e-8;
    * τ_task: unit-Hessian δf* block → 2e-3;
    * Δτ_cmd out-of-span(NwJw): the only command disagreement allowed is a
      pure in-span contact-force redistribution (zero task-space effect) —
      the reference's ≈0 similarity expectation (redu_dyn_test.cpp:324-326)
      up to the documented flat-face indeterminacy.

    Like-for-like objectives on both sides (tangential_weight=False — the
    reduced path's tangential-weighted redistribution differs by design,
    in-span only; see benchmarks/dof_sweep.py)."""
    urdf = os.path.join(DOF_DIR, f"dyros_tocabi_dof{dof}.urdf")
    rd = _build(urdf)

    rd.CalcContactConstraint()
    rd.CalcGravCompensation()
    rd.CalcTaskControlTorque(hqp=True)
    rd.CalcContactRedistribute(hqp=True)
    tau_full = np.asarray(rd.torque_command())
    tg_full = np.asarray(rd.torque_grav_)
    tt_full = np.asarray(rd.torque_task_)
    NwJw = np.asarray(rd.cspace.NwJw)

    rd.ReducedDynamicsCalculate()
    rd.ReducedCalcContactConstraint()
    rd.ReducedCalcGravCompensation()
    rd.ReducedCalcTaskControlTorque(hqp=True)
    rd.ReducedCalcContactRedistribute(hqp=True, tangential_weight=False)
    tau_red = np.asarray(rd.torque_command())
    tg_red = np.asarray(rd.torque_grav_)
    tt_red = np.asarray(rd.torque_task_)

    assert np.isfinite(tau_red).all() and np.isfinite(tau_full).all()
    assert np.abs(tg_full - tg_red).max() < 1e-8
    assert np.abs(tt_full - tt_red).max() < 2e-3
    dtau = tau_full - tau_red
    coef, *_ = np.linalg.lstsq(NwJw, dtau, rcond=None)
    out_of_span = np.linalg.norm(dtau - NwJw @ coef)
    assert out_of_span < 5e-3, (
        f"dof{dof}: ‖Δτ_cmd‖={np.linalg.norm(dtau):.3e}, "
        f"out-of-span(NwJw) part {out_of_span:.3e}"
    )
