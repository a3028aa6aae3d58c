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


def test_virtual_cmm(tocabi_kin):
    """CalcVirtualCMM parity properties (src/dwbc.cpp:1682-1709): all-body
    mask about the COM == the full AMM; the matrix is additive over body
    partitions at a fixed reference point; H_sub·q̇ equals the numerically
    integrated angular momentum of the subset."""
    from libdwbc_tpu.kin.centroidal import angular_momentum_matrix, virtual_cmm

    kin = tocabi_kin
    nb = kin.model.nbody
    rng = np.random.default_rng(3)
    q = full_q(CASE_Q[1])
    qd = rng.standard_normal(39) * 0.3
    st = kin.update(jnp.array(q), jnp.array(qd))

    H_all = np.asarray(virtual_cmm(kin, st, jnp.ones(nb)))
    np.testing.assert_allclose(
        H_all, np.asarray(angular_momentum_matrix(kin, st)), atol=1e-10
    )

    # additivity over a partition at a fixed point
    about = jnp.asarray([0.1, -0.2, 0.5])
    mask_a = jnp.asarray((np.arange(nb) < nb // 2).astype(float))
    mask_b = 1.0 - mask_a
    H_a = np.asarray(virtual_cmm(kin, st, mask_a, about))
    H_b = np.asarray(virtual_cmm(kin, st, mask_b, about))
    H_ab = np.asarray(virtual_cmm(kin, st, jnp.ones(nb), about))
    np.testing.assert_allclose(H_a + H_b, H_ab, atol=1e-10)

    # subset momentum against a direct per-body sum
    m = kin.model
    h_direct = np.zeros(3)
    about_n = np.asarray(about)
    for b in range(nb // 2):
        Rb = np.asarray(st.R[b])
        wb = np.asarray(st.w[b])
        vb = np.asarray(st.v[b])
        cw = Rb @ np.asarray(m.com[b])
        v_com = vb + np.cross(wb, cw)
        x_com = np.asarray(st.p[b]) + cw
        Iw = Rb @ np.asarray(m.inertia[b]) @ Rb.T
        h_direct += Iw @ wb + m.mass[b] * np.cross(x_com - about_n, v_com)
    np.testing.assert_allclose(H_a @ qd, h_direct, atol=1e-9)


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
