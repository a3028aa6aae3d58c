"""Kinematics-engine unit tests (model compiler, FK, Jacobians, CRBA, CMM)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import CASE_Q, full_q


def test_model_numbering(tocabi_model):
    m = tocabi_model
    assert m.nbody == 34
    assert m.ndof == 39
    assert m.model_dof == 33
    assert m.body_names[0] == "Pelvis_Link"
    assert m.body_names[6] == "L_AnkleRoll_Link"
    assert m.body_names[12] == "R_AnkleRoll_Link"
    assert m.body_names[15] == "Upperbody_Link"
    assert m.body_names[23] == "L_Wrist2_Link"
    # fixed feet lumped into ankles
    assert "L_Foot_Link" in m.fixed_frames
    assert m.fixed_frames["L_Foot_Link"][0] == 6
    assert abs(m.total_mass - 96.211282) < 1e-5


def test_jacobian_consistency_with_fd(tocabi_kin):
    """Point Jacobians agree with finite differences of FK through the
    quaternion tangent map."""
    kin = tocabi_kin
    rng = np.random.default_rng(0)
    q = full_q(CASE_Q[1])
    qd = np.zeros(39)
    fk = kin.fk(jnp.array(q))
    J, Jcom = kin.body_jacobians(fk)
    J = np.asarray(J)

    eps = 1e-7
    for dof in [0, 2, 4, 8, 20, 30]:
        dq = np.zeros(39)
        dq[dof] = 1.0
        # integrate q along tangent dq
        q2 = q.copy()
        q2[0:3] += eps * dq[0:3]
        # quaternion: body-frame angular velocity
        from scipy.spatial.transform import Rotation

        R0 = Rotation.from_quat([q[3], q[4], q[5], q[39]])
        R2 = R0 * Rotation.from_rotvec(eps * dq[3:6])
        xyzw = R2.as_quat()
        q2[3:6] = xyzw[0:3]
        q2[39] = xyzw[3]
        q2[6:39] += eps * dq[6:39]
        fk2 = kin.fk(jnp.array(q2))
        dv = (np.asarray(fk2.p) - np.asarray(fk.p)) / eps
        for b in [0, 6, 12, 23, 33]:
            np.testing.assert_allclose(J[b, 0:3, dof], dv[b], atol=1e-5)


def test_velocity_matches_jacobian(tocabi_kin):
    kin = tocabi_kin
    rng = np.random.default_rng(1)
    q = full_q(CASE_Q[2])
    qd = rng.standard_normal(39) * 0.3
    fk = kin.fk(jnp.array(q))
    w, v = kin.velocities(fk, jnp.array(qd))
    J, _ = kin.body_jacobians(fk)
    for b in [0, 5, 12, 20, 33]:
        pred = np.asarray(J[b]) @ qd
        np.testing.assert_allclose(np.asarray(v[b]), pred[0:3], atol=1e-10)
        np.testing.assert_allclose(np.asarray(w[b]), pred[3:6], atol=1e-10)


def test_mass_matrix_spd_and_energy(tocabi_kin):
    kin = tocabi_kin
    rng = np.random.default_rng(2)
    q = full_q(CASE_Q[1])
    qd = rng.standard_normal(39)
    st = kin.update(jnp.array(q), jnp.array(qd))
    A = np.asarray(st.A)
    assert np.allclose(A, A.T, atol=1e-12)
    assert np.linalg.eigvalsh(A).min() > 0
    # kinetic energy via A equals sum of body kinetic energies
    ke_A = 0.5 * qd @ A @ qd
    m = kin.model
    ke_sum = 0.0
    w, v = kin.velocities(kin.fk(jnp.array(q)), jnp.array(qd))
    fk = kin.fk(jnp.array(q))
    for b in range(m.nbody):
        rc = np.asarray(fk.com_w[b] - fk.p[b])
        vc = np.asarray(v[b]) + np.cross(np.asarray(w[b]), rc)
        R = np.asarray(fk.R[b])
        Iw = R @ m.inertia[b] @ R.T
        ke_sum += 0.5 * m.mass[b] * vc @ vc + 0.5 * np.asarray(w[b]) @ Iw @ np.asarray(w[b])
    assert abs(ke_A - ke_sum) < 1e-9 * max(1.0, abs(ke_A))


def test_bias_forces_match_energy_gradient(tocabi_kin):
    """τ from inverse dynamics at q̈=0 equals C q̇ + G: check against the
    power-balance identity  q̇ᵀ(B - G_total) = ½ q̇ᵀ Ȧ q̇."""
    kin = tocabi_kin
    rng = np.random.default_rng(3)
    q = full_q(CASE_Q[1])
    qd = rng.standard_normal(39) * 0.5
    st = kin.update(jnp.array(q), jnp.array(qd))
    # gravity part of B: bias at qd=0
    st0 = kin.update(jnp.array(q), jnp.array(np.zeros(39)))
    G_from_B = np.asarray(st0.B)
    np.testing.assert_allclose(G_from_B, np.asarray(st0.G), atol=1e-8)

    # power balance: d/dt(KE) = q̇ᵀ(τ - B + G) with τ=0 ⇒ q̇ᵀ(B-G) = -d(KE)/dt + Ȧ-term
    # use the standard identity q̇ᵀ C q̇ = ½ q̇ᵀ Ȧ q̇ (via jvp of A along q̇)
    eps = 1e-7
    q2 = q.copy()
    q2[0:3] += eps * qd[0:3]
    from scipy.spatial.transform import Rotation

    R0 = Rotation.from_quat([q[3], q[4], q[5], q[39]])
    R2 = R0 * Rotation.from_rotvec(eps * qd[3:6])
    xyzw = R2.as_quat()
    q2[3:6] = xyzw[0:3]
    q2[39] = xyzw[3]
    q2[6:39] += eps * qd[6:39]
    A2 = np.asarray(kin.update(jnp.array(q2), jnp.array(qd)).A)
    Adot = (A2 - np.asarray(st.A)) / eps
    lhs = qd @ (np.asarray(st.B) - G_from_B)
    rhs = 0.5 * qd @ Adot @ qd
    assert abs(lhs - rhs) < 1e-4 * max(1.0, abs(rhs))


def test_cmm_angular_momentum(tocabi_kin):
    """CMM·q̇ equals the total momentum about the COM (reference CMM test,
    dwbc_test.cpp:490-728)."""
    kin = tocabi_kin
    rng = np.random.default_rng(4)
    q = full_q(CASE_Q[1])
    qd = rng.standard_normal(39) * 0.4
    st = kin.update(jnp.array(q), jnp.array(qd))
    hmom = np.asarray(st.CMM) @ qd  # [linear; angular about COM]

    m = kin.model
    fk = kin.fk(jnp.array(q))
    w, v = kin.velocities(fk, jnp.array(qd))
    lin = np.zeros(3)
    ang = np.zeros(3)
    com = np.asarray(st.com_pos)
    for b in range(m.nbody):
        rc = np.asarray(fk.com_w[b] - fk.p[b])
        vc = np.asarray(v[b]) + np.cross(np.asarray(w[b]), rc)
        R = np.asarray(fk.R[b])
        Iw = R @ m.inertia[b] @ R.T
        lin += m.mass[b] * vc
        ang += Iw @ np.asarray(w[b]) + m.mass[b] * np.cross(
            np.asarray(fk.com_w[b]) - com, vc
        )
    np.testing.assert_allclose(hmom[0:3], lin, atol=1e-8)
    np.testing.assert_allclose(hmom[3:6], ang, atol=1e-8)


def test_vmap_batched_update(tocabi_kin):
    kin = tocabi_kin
    rng = np.random.default_rng(5)
    B = 4
    qs = np.stack([full_q(CASE_Q[1] + 0.01 * rng.standard_normal(33)) for _ in range(B)])
    qds = rng.standard_normal((B, 39)) * 0.1
    batched = jax.vmap(kin.update)(jnp.array(qs), jnp.array(qds))
    single = kin.update(jnp.array(qs[2]), jnp.array(qds[2]))
    np.testing.assert_allclose(np.asarray(batched.A[2]), np.asarray(single.A), atol=1e-12)
    np.testing.assert_allclose(np.asarray(batched.G[2]), np.asarray(single.G), atol=1e-12)
