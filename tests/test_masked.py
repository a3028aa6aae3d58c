"""Masked multi-mode tick: one graph over all contact modes.

Validation strategy: for each contact mode, the masked tick (padded arrays +
per-scenario mask) must reproduce the per-mode compiled tick (the lax.switch
path), which itself is golden-validated. NwJw's normalization
(J̄_cᵀ[sel,6:]·NwJw = I) is basis-independent, so the QPs see identical
problems and the torques must agree to solver accuracy.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import CASE_Q, full_q


@pytest.fixture(scope="module")
def ticks(tocabi_model):
    from libdwbc_tpu.wbc.masked import MaskedTick
    from libdwbc_tpu.wbc.pipeline import CompiledTick, standard_tocabi_config

    cfg2 = standard_tocabi_config(tocabi_model, both_feet=True, qp_iters=25)
    masked = MaskedTick(tocabi_model, cfg2, dtype=jnp.float64)
    both = CompiledTick(tocabi_model, cfg2, dtype=jnp.float64)
    import dataclasses

    cfg_l = dataclasses.replace(cfg2, contacts=(cfg2.contacts[0],))
    cfg_r = dataclasses.replace(cfg2, contacts=(cfg2.contacts[1],))
    left = CompiledTick(tocabi_model, cfg_l, dtype=jnp.float64)
    right = CompiledTick(tocabi_model, cfg_r, dtype=jnp.float64)
    return masked, both, left, right


def _inputs():
    q = jnp.array(full_q(CASE_Q[1]))
    qd = jnp.zeros(39)
    fstars = (
        jnp.array([0.1, 4.0, 0.1, 0.1, -0.1, 0.1]),
        jnp.array([0.1, -0.1, 0.1]),
    )
    return q, qd, fstars


def test_masked_double_support_matches_unmasked(ticks):
    masked, both, _, _ = ticks
    q, qd, fstars = _inputs()
    rm = masked(q, qd, fstars, jnp.array([1.0, 1.0]))
    rb = both(q, qd, fstars)
    assert np.allclose(rm.torque_grav, rb.torque_grav, atol=1e-9)
    assert np.allclose(rm.torque_task, rb.torque_task, atol=1e-6)
    assert np.allclose(rm.torque_cmd, rb.torque_cmd, atol=1e-5)
    assert np.allclose(rm.contact_force, rb.contact_force, atol=1e-4)


@pytest.mark.parametrize("mode", ["left", "right"])
def test_masked_single_support_matches_per_mode(ticks, mode):
    masked, _, left, right = ticks
    q, qd, fstars = _inputs()
    if mode == "left":
        mask = jnp.array([1.0, 0.0])
        ref_tick = left
        act = slice(0, 6)
        inact = slice(6, 12)
    else:
        mask = jnp.array([0.0, 1.0])
        ref_tick = right
        act = slice(6, 12)
        inact = slice(0, 6)
    rm = masked(q, qd, fstars, mask)
    rr = ref_tick(q, qd, fstars)
    assert np.allclose(rm.torque_grav, rr.torque_grav, atol=1e-9)
    # QP-dependent tolerance: the problems are equivalent but not bitwise
    # identical (extra masked rows/inert vars), so solutions agree only to
    # the QP accuracy floor (~1e-4, same as the reference's qpOASES --
    # objectives match to 1e-9 relative, verified)
    assert np.allclose(rm.torque_cmd, rr.torque_cmd, atol=5e-3)
    # padded contact rows observe (numerically) zero force
    cf = np.asarray(rm.contact_force)
    assert np.abs(cf[inact]).max() < 1e-6
    assert np.allclose(cf[act], np.asarray(rr.contact_force), atol=5e-2)


def test_masked_batch_mixed_modes(ticks):
    """One batched call with three different contact modes per scenario."""
    masked, both, left, right = ticks
    q, qd, fstars = _inputs()
    B = 3
    qs = jnp.broadcast_to(q, (B, q.shape[0]))
    qds = jnp.broadcast_to(qd, (B, qd.shape[0]))
    fs = tuple(jnp.broadcast_to(f, (B, f.shape[0])) for f in fstars)
    masks = jnp.array([[1.0, 1.0], [1.0, 0.0], [0.0, 1.0]])
    rm = masked(qs, qds, fs, masks)
    tb = np.asarray(both(q, qd, fstars).torque_cmd)
    tl = np.asarray(left(q, qd, fstars).torque_cmd)
    tr = np.asarray(right(q, qd, fstars).torque_cmd)
    tm = np.asarray(rm.torque_cmd)
    assert np.allclose(tm[0], tb, atol=1e-5)
    assert np.allclose(tm[1], tl, atol=5e-3)
    assert np.allclose(tm[2], tr, atol=5e-3)
    assert float(np.asarray(rm.qp_primal_res).max()) < 1e-6
