"""ReducedTick — the reduced-dimension pipeline as one compiled batched graph.

Parity protocol mirrors the reference's redu_dyn_test (torque similarity
full-vs-reduced, tests/sp_test/redu_dyn_test.cpp:302-326) plus this repo's
facade as ground truth (wbc/robot.py Reduced* methods, themselves validated
against the reference pipeline in tests/test_reduced.py).

Tolerance policy (CLAUDE.md): pre-QP quantities tight (1e-10);
QP-dependent torques at the solver floor (~1e-5 f64 same-formulation,
5e-2 cross-formulation flat-face policy).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import CASE_FSTAR, CASE_Q, full_q, make_standard_robot

from libdwbc_tpu.wbc.pipeline import CompiledTick, standard_tocabi_config
from libdwbc_tpu.wbc.reduced_tick import ReducedTick


@pytest.fixture(scope="module")
def rtick(tocabi_model):
    cfg = standard_tocabi_config(tocabi_model, qp_iters=25)
    return ReducedTick(tocabi_model, cfg, dtype=jnp.float64,
                       tangential_weight=True)


@pytest.mark.parametrize("case", [1, 2])
def test_parity_vs_facade(rtick, case):
    rd = make_standard_robot(case)
    rd.qp_iters = 25
    rd.ReducedDynamicsCalculate()
    rd.ReducedCalcContactConstraint()
    rd.ReducedCalcGravCompensation()
    rd.ReducedCalcTaskControlTorque(True, True)
    rd.ReducedCalcContactRedistribute(True, True, tangential_weight=True)

    res = rtick(full_q(CASE_Q[case]), np.zeros(39), CASE_FSTAR[case])
    np.testing.assert_allclose(
        np.asarray(res.torque_grav), np.asarray(rd.torque_grav_), atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(res.torque_task), np.asarray(rd.torque_task_), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(res.torque_contact), np.asarray(rd.torque_contact_),
        atol=1e-4,
    )
    assert float(res.qp_primal_res) < 1e-6


def test_batched_matches_single(rtick):
    B = 4
    rng = np.random.default_rng(0)
    q0 = full_q(CASE_Q[1])
    qs = np.tile(q0, (B, 1))
    qs[:, 6:39] += 0.02 * rng.standard_normal((B, 33))
    qds = np.zeros((B, 39))
    fs = tuple(np.tile(f, (B, 1)) for f in CASE_FSTAR[1])
    res_b = rtick(qs, qds, fs)
    assert res_b.torque_cmd.shape == (B, 33)
    assert np.isfinite(np.asarray(res_b.torque_cmd)).all()
    for i in (0, B - 1):
        res_i = rtick(qs[i], qds[i], tuple(f[i] for f in fs))
        np.testing.assert_allclose(
            np.asarray(res_b.torque_cmd[i]), np.asarray(res_i.torque_cmd),
            atol=1e-8,
        )


def test_warm_start_consistency(rtick):
    """Warm tick at reduced iterations lands on the cold solution (same
    formulation → tight τ, the warm-parity policy of test_warm_parity)."""
    q = full_q(CASE_Q[1])
    qd = np.zeros(39)
    fs = CASE_FSTAR[1]
    warm0 = rtick.init_warm(())
    res0, warm = rtick._tick_impl(
        jnp.asarray(q), jnp.asarray(qd),
        tuple(jnp.asarray(f, jnp.float64) for f in fs),
        warm=warm0, qp_iters=25,
    )
    res1, _ = rtick._tick_impl(
        jnp.asarray(q), jnp.asarray(qd),
        tuple(jnp.asarray(f, jnp.float64) for f in fs),
        warm=warm, qp_iters=8,
    )
    np.testing.assert_allclose(
        np.asarray(res1.torque_grav), np.asarray(res0.torque_grav), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(res1.torque_task), np.asarray(res0.torque_task), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(res1.torque_cmd), np.asarray(res0.torque_cmd), atol=5e-3
    )


def test_cross_formulation_vs_full(tocabi_model):
    """Full CompiledTick vs ReducedTick (min-norm redistribution on both):
    τ_grav at linear-algebra precision, τ_cmd at the cross-formulation
    flat-face policy (CLAUDE.md)."""
    cfg = standard_tocabi_config(tocabi_model, qp_iters=25)
    full = CompiledTick(tocabi_model, cfg, dtype=jnp.float64)
    red = ReducedTick(tocabi_model, cfg, dtype=jnp.float64,
                      tangential_weight=False)
    q = full_q(CASE_Q[1])
    qd = np.zeros(39)
    fs = CASE_FSTAR[1]
    rf = full(q, qd, fs)
    rr = red(q, qd, fs)
    np.testing.assert_allclose(
        np.asarray(rr.torque_grav), np.asarray(rf.torque_grav), atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(rr.torque_task), np.asarray(rf.torque_task), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(rr.torque_cmd), np.asarray(rf.torque_cmd), atol=5e-2
    )


def test_degenerate_all_contact_chain():
    """A model whose every joint is on the contact chain must refuse."""
    from libdwbc_tpu.model.compile import JointSpec, LinkSpec, compile_from_links
    from libdwbc_tpu.wbc import types as T
    from libdwbc_tpu.wbc.pipeline import PipelineConfig

    links = [
        LinkSpec("base", 3.0, np.zeros(3), np.diag([0.1, 0.1, 0.1]), -1),
        LinkSpec("l1", 1.0, np.array([0, 0, -0.2]), np.diag([0.01] * 3), 0),
    ]
    joints = [
        JointSpec("floating", name="root"),
        JointSpec("revolute", np.array([0, 1.0, 0]), np.array([0, 0, -0.3]),
                  name="j1"),
    ]
    model = compile_from_links(links, joints)
    cfg = PipelineConfig(
        contacts=(T.ContactDef(
            link=1, contact_type=T.CONTACT_POINT,
            contact_point=np.array([0.0, 0.0, -0.2]),
            contact_direction=np.array([0.0, 0.0, 1.0]),
            plane_x=0.0, plane_y=0.0,
            active=True,
        ),),
        task_specs=(((T.TASK_LINK_POSITION, 0),),),
        torque_limit=np.full(1, 50.0),
    )
    with pytest.raises(ValueError, match="degenerate"):
        ReducedTick(model, cfg)


def test_dof45_topology():
    """Largest DoF-sweep topology end-to-end through ReducedTick."""
    from libdwbc_tpu.model.compile import compile_urdf
    from libdwbc_tpu.wbc.pipeline import PipelineConfig
    from libdwbc_tpu.wbc import types as T

    path = "/root/reference/tests/dof_test/dyros_tocabi_dof45.urdf"
    model = compile_urdf(path, floating=True)
    foot = dict(
        contact_type=T.CONTACT_6D,
        contact_point=np.array([0.03, 0.0, -0.1585]),
        contact_direction=np.array([0.0, 0.0, 1.0]),
        plane_x=0.15, plane_y=0.075, active=True,
    )
    ub = model.body_index("upperbody_link")
    # links 6/12 + bent-knee double-support pose: the validated DoF-sweep
    # configuration (test_dof_sweep._build); a straight-leg zero pose puts
    # the contact jacobian at the knee singularity and both pipelines
    # (full included) blow up — that is a property of the pose, not a path
    cfg = PipelineConfig(
        contacts=(T.ContactDef(link=6, **foot), T.ContactDef(link=12, **foot)),
        task_specs=(((T.TASK_LINK_6D, 0),), ((T.TASK_LINK_ROTATION, ub),)),
        torque_limit=np.full(model.model_dof, 300.0),
        qp_iters=25,
    )
    tick = ReducedTick(model, cfg, dtype=jnp.float64, tangential_weight=False)
    q = np.zeros(model.nq)
    q[2] = 0.92983
    q[model.ndof] = 1.0
    q[6 : 6 + 12] = [0.0, 0.0, -0.24, 0.6, -0.36, 0.0] * 2
    res = tick(q, np.zeros(model.ndof), (CASE_FSTAR[1][0], CASE_FSTAR[1][1]))
    assert np.isfinite(np.asarray(res.torque_cmd)).all()
    # cross-check against the full tick
    fullt = CompiledTick(model, cfg, dtype=jnp.float64)
    rf2 = fullt(q, np.zeros(model.ndof), (CASE_FSTAR[1][0], CASE_FSTAR[1][1]))
    np.testing.assert_allclose(
        np.asarray(res.torque_grav), np.asarray(rf2.torque_grav), atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(res.torque_cmd), np.asarray(rf2.torque_cmd), atol=5e-2
    )


def test_warm_slots_match_single_contact(tocabi_model):
    """Warm-carry structure parity for configs that SKIP QPs (ADVICE r04):
    a single 6D contact has cfree=0 so the redistribution QP never runs,
    and use_hqp=False runs none — init_warm must emit exactly the slots
    _tick_impl's warm_out returns or a warm-chained lax.scan loop dies on
    a carry structure mismatch."""
    import jax

    q = full_q(CASE_Q[2])   # single-support case
    qd = np.zeros(39)
    fs = CASE_FSTAR[2]
    cfg = standard_tocabi_config(tocabi_model, both_feet=False, qp_iters=12)
    tick = ReducedTick(tocabi_model, cfg, dtype=jnp.float64,
                       tangential_weight=False)
    warm0 = tick.init_warm(())
    res, warm1 = tick._tick_impl(
        jnp.asarray(q), jnp.asarray(qd),
        tuple(jnp.asarray(f, jnp.float64) for f in fs),
        warm=warm0, qp_iters=12,
    )
    assert jax.tree_util.tree_structure(warm0) == \
        jax.tree_util.tree_structure(warm1)
    for (x0, l0), (x1, l1) in zip(warm0, warm1):
        assert x0.shape == x1.shape and l0.shape == l1.shape
    # the serving shape: warm chained through a scan (this is what broke)
    def body(w, _):
        r, w = tick._tick_impl(
            jnp.asarray(q), jnp.asarray(qd),
            tuple(jnp.asarray(f, jnp.float64) for f in fs),
            warm=w, qp_iters=6,
        )
        return w, r.torque_cmd
    _, taus = jax.lax.scan(body, warm1, None, length=2)
    assert np.isfinite(np.asarray(taus)).all()

    # use_hqp=False: no QPs at all -> zero warm slots, same contract
    import dataclasses
    cfg_nohqp = dataclasses.replace(cfg, use_hqp=False)
    tick2 = ReducedTick(tocabi_model, cfg_nohqp, dtype=jnp.float64,
                        tangential_weight=False)
    w0 = tick2.init_warm(())
    assert w0 == ()
    _, w1 = tick2._tick_impl(
        jnp.asarray(q), jnp.asarray(qd),
        tuple(jnp.asarray(f, jnp.float64) for f in fs),
        warm=w0, qp_iters=12,
    )
    assert w1 == ()
