"""Centroidal utilities parity + randomized robustness loop.

The explicit angular-momentum matrix must match the CMM fast path
(reference cross-checks these in its CMM test, dwbc_test.cpp:490-728), and
the full HQP pipeline must stay feasible over randomized configurations
(the reference's 10k-iteration perturbed loop, tests/test.cpp:155-216 —
trimmed for CI time)."""

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import CASE_FSTAR, CASE_Q, full_q, make_standard_robot


def test_explicit_amm_matches_cmm(tocabi_kin):
    from libdwbc_tpu.kin.centroidal import angular_momentum_matrix, momentum

    kin = tocabi_kin
    rng = np.random.default_rng(0)
    q = full_q(CASE_Q[1])
    qd = rng.standard_normal(39) * 0.3
    st = kin.update(jnp.array(q), jnp.array(qd))
    H_explicit = np.asarray(angular_momentum_matrix(kin, st))
    H_fast = np.asarray(st.CMM)[3:6]
    assert np.abs(H_explicit - H_fast).max() < 1e-9
    # momentum observer consistent
    h = np.asarray(momentum(st))
    assert np.abs(h[3:6] - H_explicit @ qd).max() < 1e-9


def test_randomized_perturbed_loop():
    """Perturbed-configuration robustness: every QP stays feasible, torques
    bounded, over randomized states around the stand."""
    rd = make_standard_robot(1)
    rd.qp_iters = 20
    rng = np.random.default_rng(7)
    n_iter = 8
    for k in range(n_iter):
        q = full_q(CASE_Q[1])
        q[6:39] += 0.05 * rng.standard_normal(33)
        qd = 0.1 * rng.standard_normal(39)
        rd.UpdateKinematics(q, qd)
        rd.SetContact(True, True)
        rd.CalcContactConstraint()
        rd.SetTaskSpace(0, 0.3 * rng.standard_normal(6))
        rd.SetTaskSpace(1, 0.1 * rng.standard_normal(3))
        rd.CalcGravCompensation()
        assert rd.CalcTaskControlTorque(True) == 1
        assert rd.CalcContactRedistribute(True) == 1
        tau = rd.torque_command()
        assert np.isfinite(tau).all()
        assert np.abs(tau).max() <= 300.0 + 1e-6
    stats = rd.GetQPStats()
    assert stats["fail"] == 0
    assert stats["solves"] == n_iter * 3  # 2 task levels + redistribution
    assert stats["worst_primal_res"] < 1e-8
