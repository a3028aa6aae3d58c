"""Non-6D contact types end-to-end (CONTACT_POINT, CONTACT_LINE).

The reference declares the three types (include/dwbc_contact_constraint.h:19-25)
and its own test fixture configures hand contacts (dwbc_test.cpp:66-71); we
run them live: per-type jacobian rows + constraint blocks through the facade,
the fused CompiledTick, and the masked multi-mode tick.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import CASE_FSTAR, CASE_Q, URDF, full_q

FOOT_PT = np.array([0.03, 0.0, -0.1585])
HAND_PT = np.array([0.03, 0.0, -0.1585])


def _hands_feet_config(model, hand_type, foot_type=None):
    from libdwbc_tpu.wbc import types as T
    from libdwbc_tpu.wbc.pipeline import PipelineConfig

    foot_type = T.CONTACT_6D if foot_type is None else foot_type
    mk = lambda link, ct, lx, ly: T.ContactDef(
        link=link, contact_type=ct, contact_point=FOOT_PT,
        contact_direction=np.array([0.0, 0.0, 1.0]),
        plane_x=lx, plane_y=ly, active=True,
    )
    contacts = (
        mk(6, foot_type, 0.15, 0.075),
        mk(12, foot_type, 0.15, 0.075),
        mk(23, hand_type, 0.04, 0.04),
        mk(31, hand_type, 0.04, 0.04),
    )
    task_specs = (((T.TASK_LINK_6D, 0),), ((T.TASK_LINK_ROTATION, 15),))
    return PipelineConfig(
        contacts=contacts, task_specs=task_specs,
        torque_limit=np.full(model.model_dof, 300.0), qp_iters=25,
    )


def _assert_cross_formulation(mres, sres, b, task_tol=2e-3, flat_tol=8e-2):
    """Masked-vs-static parity, split by how well each torque component is
    mathematically determined.  τ_grav is deterministic linear algebra.
    τ_task is driven by the δf* QP block (unit Hessian → pinned to the
    solver's dual tolerance).  τ_contact rides the contact block's flat
    optimal face — the reference gives f_c a ZERO Hessian in the task QPs
    (dwbc.cpp:990-991), so ANY point of the face is an equally valid
    solution and the two formulations (padded-masked vs static-shaped NwJw
    bases) legitimately select different ones; only feasibility and the
    face diameter are meaningful there."""
    np.testing.assert_allclose(
        np.asarray(mres.torque_grav[b]), np.asarray(sres.torque_grav),
        atol=1e-8,
    )
    np.testing.assert_allclose(
        np.asarray(mres.torque_task[b]), np.asarray(sres.torque_task),
        atol=task_tol,
    )
    assert float(np.asarray(mres.qp_primal_res[b])) < 1e-6
    np.testing.assert_allclose(
        np.asarray(mres.torque_cmd[b]), np.asarray(sres.torque_cmd),
        atol=flat_tol,
    )


@pytest.fixture(scope="module")
def hands_feet_tick(tocabi_model):
    from libdwbc_tpu.wbc import types as T
    from libdwbc_tpu.wbc.pipeline import CompiledTick

    cfg = _hands_feet_config(tocabi_model, T.CONTACT_POINT)
    return CompiledTick(tocabi_model, cfg, dtype=jnp.float64)


def test_point_contacts_hands_feet(hands_feet_tick):
    """The reference's own 4-contact fixture shape (dwbc_test.cpp:66-71)
    with the hand contacts as live 3-dof point contacts."""
    f1, f2 = CASE_FSTAR[1]
    res = hands_feet_tick(full_q(CASE_Q[1]), np.zeros(39), (f1, f2))
    tau = np.asarray(res.torque_cmd)
    assert np.isfinite(tau).all()
    assert float(res.qp_primal_res) < 1e-6
    cf = np.asarray(res.contact_force)
    assert cf.shape == (18,)  # 6+6+3+3
    # total vertical reaction carries the robot's weight
    fz_total = cf[2] + cf[8] + cf[14] + cf[17]
    assert fz_total < -400.0
    # torque limits respected
    assert np.abs(tau).max() <= 300.0 + 1e-6


def test_point_contact_facade_matches_fused(tocabi_model, hands_feet_tick):
    from libdwbc_tpu.wbc import types as T
    from libdwbc_tpu.wbc.robot import RobotData

    rd = RobotData()
    rd.LoadModelData(URDF, True, 0)
    rd.AddContactConstraint(6, T.CONTACT_6D, FOOT_PT, [0, 0, 1], 0.15, 0.075)
    rd.AddContactConstraint(12, T.CONTACT_6D, FOOT_PT, [0, 0, 1], 0.15, 0.075)
    rd.AddContactConstraint(23, T.CONTACT_POINT, HAND_PT, [0, 0, 1], 0.04, 0.04)
    rd.AddContactConstraint(31, T.CONTACT_POINT, HAND_PT, [0, 0, 1], 0.04, 0.04)
    rd.AddTaskSpace(0, T.TASK_LINK_6D, 0, np.zeros(3))
    rd.AddTaskSpace(1, T.TASK_LINK_ROTATION, 15, np.zeros(3))
    rd.SetTorqueLimit(np.full(33, 300.0))
    rd.UpdateKinematics(full_q(CASE_Q[1]), np.zeros(39))
    rd.SetContact(True, True, True, True)
    f1, f2 = CASE_FSTAR[1]
    rd.SetTaskSpace(0, f1)
    rd.SetTaskSpace(1, f2)
    assert rd.CalcContactConstraint() == 1
    rd.CalcGravCompensation()
    rd.CalcTaskControlTorque(True)
    rd.CalcContactRedistribute(True)

    res = hands_feet_tick(full_q(CASE_Q[1]), np.zeros(39), (f1, f2))
    np.testing.assert_allclose(
        np.asarray(res.torque_grav), np.asarray(rd.torque_grav_), atol=1e-9
    )
    # QP-dependent stages: this config is QP-degenerate — the hand point
    # contacts sit unloaded at the friction-cone vertex and the
    # redistribution space is rank-deficient, so the f_c optimum is a flat
    # FACE (reference: zero f_c Hessian, dwbc.cpp:990-991) and the two
    # compilations land on different valid points of it (verified: the
    # EAGER fused tick matches the facade exactly; only XLA fusion rounding
    # differs, amplified through the face).  Both satisfy every constraint
    # (primal_res == 0).  See CLAUDE.md "Flat-face torques".
    np.testing.assert_allclose(
        np.asarray(res.torque_task), np.asarray(rd.torque_task_), atol=5e-2
    )
    np.testing.assert_allclose(
        np.asarray(res.torque_contact), np.asarray(rd.torque_contact_),
        atol=2e-1,
    )
    assert float(res.qp_primal_res) < 1e-6


def test_masked_matches_static_point(tocabi_model, hands_feet_tick):
    """MaskedTick (padded rows + static type masks) reproduces the static
    per-type-shape tick on an all-active hands+feet point-contact config."""
    from libdwbc_tpu.wbc import types as T
    from libdwbc_tpu.wbc.masked import MaskedTick

    cfg = _hands_feet_config(tocabi_model, T.CONTACT_POINT)
    mt = MaskedTick(tocabi_model, cfg, dtype=jnp.float64)
    f1, f2 = CASE_FSTAR[1]
    B = 2
    qs = np.tile(full_q(CASE_Q[1]), (B, 1))
    qds = np.zeros((B, 39))
    fs = (np.tile(f1, (B, 1)), np.tile(f2, (B, 1)))
    mask = np.ones((B, 4))
    mres = mt(jnp.array(qs), jnp.array(qds), tuple(jnp.array(f) for f in fs),
              jnp.array(mask))
    sres = hands_feet_tick(full_q(CASE_Q[1]), np.zeros(39), (f1, f2))
    _assert_cross_formulation(mres, sres, b=0)
    # scenario 1: hands off → pure double-support answer
    mask2 = np.ones((B, 4)); mask2[1, 2:] = 0.0
    mres2 = mt(jnp.array(qs), jnp.array(qds), tuple(jnp.array(f) for f in fs),
               jnp.array(mask2))
    from libdwbc_tpu.wbc.pipeline import CompiledTick, standard_tocabi_config
    cfg2 = standard_tocabi_config(tocabi_model, qp_iters=25)
    tick2 = CompiledTick(tocabi_model, cfg2, dtype=jnp.float64)
    sres2 = tick2(full_q(CASE_Q[1]), np.zeros(39), (f1, f2))
    _assert_cross_formulation(mres2, sres2, b=1)


def test_line_contact_feet(tocabi_model):
    """Feet as 5-dof line contacts (edge stance): finite torques, feasible
    QPs, weight carried, and masked-path parity."""
    from libdwbc_tpu.wbc import types as T
    from libdwbc_tpu.wbc.masked import MaskedTick
    from libdwbc_tpu.wbc.pipeline import CompiledTick, PipelineConfig

    mk = lambda link: T.ContactDef(
        link=link, contact_type=T.CONTACT_LINE, contact_point=FOOT_PT,
        contact_direction=np.array([0.0, 0.0, 1.0]),
        plane_x=0.15, plane_y=0.0, active=True,
    )
    cfg = PipelineConfig(
        contacts=(mk(6), mk(12)),
        task_specs=(((T.TASK_LINK_6D, 0),), ((T.TASK_LINK_ROTATION, 15),)),
        torque_limit=np.full(tocabi_model.model_dof, 300.0), qp_iters=25,
    )
    tick = CompiledTick(tocabi_model, cfg, dtype=jnp.float64)
    f1, f2 = CASE_FSTAR[1]
    res = tick(full_q(CASE_Q[1]), np.zeros(39), (f1, f2))
    tau = np.asarray(res.torque_cmd)
    assert np.isfinite(tau).all()
    assert float(res.qp_primal_res) < 1e-6
    cf = np.asarray(res.contact_force)
    assert cf.shape == (10,)  # 5 + 5
    assert cf[2] + cf[7] < -400.0

    mt = MaskedTick(tocabi_model, cfg, dtype=jnp.float64)
    B = 2
    qs = np.tile(full_q(CASE_Q[1]), (B, 1))
    fs = (np.tile(f1, (B, 1)), np.tile(f2, (B, 1)))
    mres = mt(jnp.array(qs), np.zeros((B, 39)),
              tuple(jnp.array(f) for f in fs), jnp.ones((B, 2)))
    # component-split parity: see _assert_cross_formulation (line contacts
    # leave a wide flat face in the contact block).  task_tol is looser here
    # than elsewhere: the f_c Hessian block is exactly ZERO (no ε selection
    # term — see wbc/hqp.py), so with the cone rows weakly ACTIVE the active
    # constraints couple δf* to the basis-dependent f_c coordinates
    # (padded-masked vs static-5-row NwJw): different points on the flat
    # face imply slightly different δf* at equal objective to solver
    # tolerance, so even the task block moves ~1% between the two
    # formulations (measured 2.8e-2 abs / 0.9% rel).
    _assert_cross_formulation(mres, res, b=0, task_tol=5e-2, flat_tol=1e-1)


def test_line_rows_drop_local_x_moment(tocabi_model):
    """contact_jacobian_rows(LINE) = [J_pos; (RᵀJ_rot)[1:3]]."""
    from libdwbc_tpu.kin.engine import Kinematics
    from libdwbc_tpu.wbc import dynamics as dyn
    from libdwbc_tpu.wbc import types as T

    kin = Kinematics(tocabi_model)
    st = kin.update(jnp.asarray(full_q(CASE_Q[1])), jnp.zeros(39))
    from libdwbc_tpu.wbc.robot import RobotData  # noqa: F401  (fk helper below)
    J6 = st.J[6]
    R = st.R[6]
    rows = dyn.contact_jacobian_rows(J6, R, T.CONTACT_LINE)
    assert rows.shape == (5, 39)
    np.testing.assert_allclose(np.asarray(rows[0:3]), np.asarray(J6[0:3]))
    expect = np.asarray(R).T @ np.asarray(J6[3:6])
    np.testing.assert_allclose(np.asarray(rows[3:5]), expect[1:3], atol=1e-12)
