"""Persistent on-device control loop: closed-loop stability smoke test."""

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import CASE_Q, full_q


def test_closed_loop_standing(tocabi_model):
    """K ticks of WBC + forward-dynamics integration on device: the robot
    should remain upright (COM height ≈ constant, torques bounded) under a
    pelvis-hold + posture task."""
    from libdwbc_tpu.wbc.loop import forward_dynamics_transition, make_control_loop
    from libdwbc_tpu.wbc.pipeline import CompiledTick, standard_tocabi_config

    cfg = standard_tocabi_config(tocabi_model, qp_iters=15)
    tick = CompiledTick(tocabi_model, cfg, dtype=jnp.float64)
    loop = make_control_loop(
        tick, forward_dynamics_transition(tick), K=50, dt=0.001
    )

    q0 = jnp.array(full_q(CASE_Q[1]))
    qd0 = jnp.zeros(39)
    fstars = (jnp.zeros(6), jnp.zeros(3))
    res = loop(q0, qd0, fstars)

    assert np.isfinite(np.asarray(res.torques)).all()
    # gravity-compensated stand with zero f*: base barely moves in 50 ms
    dz = abs(float(res.q_final[2]) - float(q0[2]))
    assert dz < 0.01
    # torques stay within limits throughout
    assert np.abs(np.asarray(res.torques)).max() <= 300.0 + 1e-6
    assert float(np.asarray(res.qp_primal_res).max()) < 1e-6


def test_warm_start_loop_matches_cold(tocabi_model):
    """Warm-started loop (QP primal/dual carried across ticks, half the
    iteration budget after tick 0) reproduces the cold loop's torques."""
    from libdwbc_tpu.wbc.loop import forward_dynamics_transition, make_control_loop
    from libdwbc_tpu.wbc.pipeline import CompiledTick, standard_tocabi_config

    cfg = standard_tocabi_config(tocabi_model, qp_iters=20)
    tick = CompiledTick(tocabi_model, cfg, dtype=jnp.float64)
    q0 = jnp.array(full_q(CASE_Q[1]))
    qd0 = jnp.zeros(39)
    fstars = (jnp.zeros(6), jnp.zeros(3))

    cold = make_control_loop(tick, forward_dynamics_transition(tick), K=10)(
        q0, qd0, fstars
    )
    warm = make_control_loop(
        tick, forward_dynamics_transition(tick), K=10,
        warm_start=True, warm_iters=8,
    )(q0, qd0, fstars)

    tc, tw = np.asarray(cold.torques), np.asarray(warm.torques)
    assert np.isfinite(tw).all()
    assert float(np.asarray(warm.qp_primal_res).max()) < 1e-6
    # same trajectory to solver accuracy
    assert np.abs(tc - tw).max() < 1e-4 * max(np.abs(tc).max(), 1.0)


def test_open_loop_hold(tocabi_model):
    from libdwbc_tpu.wbc.loop import make_control_loop
    from libdwbc_tpu.wbc.pipeline import CompiledTick, standard_tocabi_config

    cfg = standard_tocabi_config(tocabi_model, qp_iters=10)
    tick = CompiledTick(tocabi_model, cfg, dtype=jnp.float64)
    loop = make_control_loop(tick, None, K=5)
    res = loop(jnp.array(full_q(CASE_Q[1])), jnp.zeros(39), (jnp.zeros(6), jnp.zeros(3)))
    # hold transition: identical state → identical torques every tick
    t = np.asarray(res.torques)
    assert np.abs(t - t[0]).max() < 1e-9
