"""Upper-body model sanity — BASELINE config 1 (CPU-checkable, no contact).

Mirrors the reference's rot_test harness (tests/sp_test/rot_test.cpp):
load dyros_tocabi_ub.urdf, set the case-1 arm pose, update kinematics, and
validate the dynamic quantities the harness prints (A, CMM) plus the
physical invariants it eyeballs:

* A symmetric positive definite; total mass = Σ body masses;
* CMM consistency: CMM·q̇ equals the summed per-body momentum about the
  COM (the reference's CMM test protocol, dwbc_test.cpp:490-728);
* base-yaw frame invariance of the joint-space mass matrix's actuated
  block (rot_test's rot_z experiment: joint-space dynamics cannot depend
  on world yaw).
"""

import numpy as np
import pytest

from conftest import URDF_UB

import jax.numpy as jnp


@pytest.fixture(scope="module")
def ub_model():
    from libdwbc_tpu.model.compile import compile_urdf

    return compile_urdf(URDF_UB, floating=True)


def _q_pose(model, yaw=0.0):
    q = np.zeros(model.nq)
    half = np.sin(yaw / 2.0)
    q[5] = half
    q[model.ndof] = np.cos(yaw / 2.0)
    arms = [0.3, 0.3, 1.5, -1.27, -1, 0, -1, 0]
    joints = [0, 0, 0] + arms + [0, 0] + [-a for a in arms]
    q[6 : 6 + len(joints)] = joints[: model.model_dof]
    return q


def test_upperbody_dynamics(ub_model):
    from libdwbc_tpu.kin.engine import Kinematics

    model = ub_model
    kin = Kinematics(model)
    q = _q_pose(model)
    rng = np.random.default_rng(0)
    qd = 0.3 * rng.standard_normal(model.ndof)
    st = kin.update(jnp.asarray(q), jnp.asarray(qd))

    A = np.asarray(st.A)
    assert np.isfinite(A).all()
    np.testing.assert_allclose(A, A.T, atol=1e-12)
    ev = np.linalg.eigvalsh(A)
    assert ev.min() > 0, "A must be SPD"
    # translational block = total mass · I (floating base, world frame)
    np.testing.assert_allclose(
        A[0:3, 0:3], model.total_mass * np.eye(3), atol=1e-10
    )

    # CMM·q̇ == summed rigid-body momentum about the whole-body COM
    mom = np.asarray(st.CMM) @ qd
    p_lin = np.zeros(3)
    L_ang = np.zeros(3)
    com = np.asarray(st.com_pos)
    for b in range(model.nbody):
        m_b = float(model.mass[b])
        Jb = np.asarray(st.Jcom[b])
        v_b = Jb[0:3] @ qd
        w_b = Jb[3:6] @ qd
        R_b = np.asarray(st.R[b])
        I_w = R_b @ np.asarray(model.inertia[b]) @ R_b.T
        r = np.asarray(st.com_w[b]) - com
        p_lin += m_b * v_b
        L_ang += I_w @ w_b + m_b * np.cross(r, v_b)
    np.testing.assert_allclose(mom[0:3], p_lin, atol=1e-8)
    np.testing.assert_allclose(mom[3:6], L_ang, atol=1e-8)


def test_upperbody_yaw_invariance(ub_model):
    """rot_test's rot_z experiment: the actuated-joint mass-matrix block and
    gravity vector are invariant to world yaw."""
    from libdwbc_tpu.kin.engine import Kinematics

    model = ub_model
    kin = Kinematics(model)
    qd = np.zeros(model.ndof)
    st0 = kin.update(jnp.asarray(_q_pose(model, 0.0)), jnp.asarray(qd))
    st1 = kin.update(jnp.asarray(_q_pose(model, np.pi / 2)), jnp.asarray(qd))
    np.testing.assert_allclose(
        np.asarray(st0.A)[6:, 6:], np.asarray(st1.A)[6:, 6:], atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(st0.G)[6:], np.asarray(st1.G)[6:], atol=1e-9
    )


def test_upperbody_fixed_base():
    """Fixed-base compile of the same URDF: A is model_dof² SPD and the
    gravity vector matches −Jᵀmg summed over bodies."""
    from libdwbc_tpu.kin.engine import Kinematics
    from libdwbc_tpu.model.compile import compile_urdf

    model = compile_urdf(URDF_UB, floating=False)
    assert model.ndof == model.model_dof and not model.floating
    kin = Kinematics(model)
    q = np.zeros(model.nq)
    q[3:11] = [0.3, 0.3, 1.5, -1.27, -1, 0, -1, 0]
    st = kin.update(jnp.asarray(q), jnp.asarray(np.zeros(model.ndof)))
    A = np.asarray(st.A)
    assert A.shape == (model.ndof, model.ndof)
    assert np.linalg.eigvalsh(A).min() > 0
    G_ref = np.zeros(model.ndof)
    for b in range(model.nbody):
        G_ref -= float(model.mass[b]) * (
            np.asarray(st.Jcom[b])[0:3].T @ model.gravity
        )
    np.testing.assert_allclose(np.asarray(st.G), G_ref, atol=1e-9)
