"""Contact-mode hypothesis sweep tests (lax.switch over compiled modes)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import CASE_Q, full_q


@pytest.fixture(scope="module")
def hyp(tocabi_model):
    from libdwbc_tpu.parallel.hypotheses import contact_mode_ticks
    from libdwbc_tpu.wbc import types as T

    foot = dict(
        contact_type=T.CONTACT_6D,
        contact_point=np.array([0.03, 0.0, -0.1585]),
        contact_direction=np.array([0.0, 0.0, 1.0]),
        plane_x=0.15, plane_y=0.075, active=True,
    )
    contacts = [T.ContactDef(link=6, **foot), T.ContactDef(link=12, **foot)]
    task_specs = [((T.TASK_LINK_6D, 0),), ((T.TASK_LINK_ROTATION, 15),)]
    modes, ticks = contact_mode_ticks(
        tocabi_model, contacts, task_specs,
        np.full(33, 300.0), qp_iters=10, dtype=jnp.float64,
    )
    return modes, ticks


def test_mode_enumeration(hyp):
    modes, ticks = hyp
    assert set(modes) == {(True, True), (True, False), (False, True)}


def test_switch_matches_direct(hyp, tocabi_model):
    from libdwbc_tpu.parallel.hypotheses import make_hypothesis_tick

    modes, ticks = hyp
    tick_fn = jax.jit(make_hypothesis_tick(tocabi_model, modes, ticks))
    q = jnp.array(full_q(CASE_Q[1]))
    qd = jnp.zeros(39)
    fs = (jnp.array([0.1, 0.2, 0.1, 0.0, 0.0, 0.0]), jnp.array([0.05, 0.0, 0.0]))
    for i, (mode, tick) in enumerate(zip(modes, ticks)):
        out = tick_fn(jnp.int32(i), q, qd, fs)
        direct = tick(q, qd, fs)
        np.testing.assert_allclose(
            np.asarray(out[0]), np.asarray(direct.torque_cmd), atol=1e-9
        )


def test_batched_sweep_selects_feasible(hyp, tocabi_model):
    from libdwbc_tpu.parallel.hypotheses import hypothesis_sweep

    modes, ticks = hyp
    B = 6
    q = jnp.tile(jnp.array(full_q(CASE_Q[1])), (B, 1))
    qd = jnp.zeros((B, 39))
    fs = (
        jnp.tile(jnp.array([0.1, 0.2, 0.1, 0.0, 0.0, 0.0]), (B, 1)),
        jnp.tile(jnp.array([0.05, 0.0, 0.0]), (B, 1)),
    )
    mode_idx = jnp.array([0, 1, 2, 0, 1, 2], dtype=jnp.int32)
    tau, cost, best = hypothesis_sweep(
        tocabi_model, modes, ticks, mode_idx, q, qd, fs
    )
    assert tau.shape == (B, 33)
    assert np.isfinite(np.asarray(cost)).all()
    # standing double-support should beat single-support hypotheses on cost
    # (less torque, feasible constraints)
    both_idx = modes.index((True, True))
    costs = np.asarray(cost)
    assert costs[mode_idx == both_idx].min() <= costs.min() + 1e-6
