"""Model surgery, trajectory servo, and RL bridge tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import CASE_Q, URDF, full_q


# ------------------------------------------------------------- surgery
def test_change_link_to_fixed_preserves_dynamics(tocabi_model, tocabi_kin):
    from libdwbc_tpu.kin.engine import Kinematics
    from libdwbc_tpu.model import surgery

    m = tocabi_model
    body = m.body_index("L_Wrist2_Link")
    dof = int(m.q_index[body])
    m2 = surgery.change_link_to_fixed(m, body)
    assert m2.nbody == m.nbody - 1
    assert m2.ndof == m.ndof - 1
    assert abs(m2.total_mass - m.total_mass) < 1e-12

    # at a configuration with that joint at 0, the reduced mass matrix equals
    # the original with the frozen dof's row/col removed
    q = full_q(CASE_Q[1])
    q[dof] = 0.0
    st = tocabi_kin.update(jnp.array(q), jnp.array(np.zeros(39)))
    A_old = np.asarray(st.A)
    keepd = [i for i in range(39) if i != dof]
    A_expect = A_old[np.ix_(keepd, keepd)]

    k2 = Kinematics(m2)
    q2 = np.concatenate([q[:dof], q[dof + 1 :]])
    st2 = k2.update(jnp.array(q2), jnp.array(np.zeros(38)))
    assert np.abs(np.asarray(st2.A) - A_expect).max() < 1e-9


def test_delete_subtree(tocabi_model):
    from libdwbc_tpu.model import surgery

    m = tocabi_model
    arm_root = m.body_index("L_Shoulder1_Link")
    m2 = surgery.delete_subtree(m, arm_root)
    assert m2.nbody == m.nbody - 8  # L arm chain has 8 bodies
    assert m2.ndof == m.ndof - 8
    arm_mass = sum(m.mass[i] for i in range(m.nbody) if "L_Shoulder" in m.body_names[i]
                   or m.body_names[i].startswith(("L_Armlink", "L_Elbow", "L_Forearm", "L_Wrist")))
    assert abs(m2.total_mass - (m.total_mass - arm_mass)) < 1e-9


def test_add_fixed_link_payload(tocabi_model):
    from libdwbc_tpu.model import surgery

    m = tocabi_model
    hand = m.body_index("R_Wrist2_Link")
    m2 = surgery.add_link(
        m, hand, "payload", "fixed", np.zeros(3), np.array([0, 0, -0.1]),
        np.zeros(3), 2.0, np.zeros(3), 0.001 * np.eye(3),
    )
    assert abs(m2.total_mass - m.total_mass - 2.0) < 1e-12
    assert m2.mass[hand] == m.mass[hand] + 2.0


def test_change_link_inertia(tocabi_model):
    from libdwbc_tpu.model import surgery

    m = tocabi_model
    m2 = surgery.change_link_inertia(m, 15, 20.0, np.array([0.1, 0, 0]), np.eye(3))
    assert m2.mass[15] == 20.0
    assert abs(m2.total_mass - (m.total_mass - m.mass[15] + 20.0)) < 1e-9


def test_surgery_through_facade():
    from libdwbc_tpu.wbc import types as T
    from libdwbc_tpu.wbc.robot import RobotData

    rd = RobotData()
    rd.LoadModelData(URDF, True, 0)
    rd.AddContactConstraint(6, T.CONTACT_6D, [0.03, 0, -0.1585], [0, 0, 1], 0.15, 0.075)
    rd.AddContactConstraint(12, T.CONTACT_6D, [0.03, 0, -0.1585], [0, 0, 1], 0.15, 0.075)
    rd.AddTaskSpace(0, T.TASK_LINK_6D, 0, np.zeros(3))
    rd.ChangeLinkToFixedJoint("Head_Link")
    assert rd.model_dof_ == 32
    # contacts renumbered by name and still valid
    assert rd.model.body_names[rd.cc_[0].link] == "L_AnkleRoll_Link"
    q = np.zeros(rd.model.nq)
    q[2] = 0.92983
    q[rd.model.ndof] = 1.0
    rd.UpdateKinematics(q, np.zeros(rd.model.ndof))
    rd.SetContact(True, True)
    rd.CalcContactConstraint()
    tg = rd.CalcGravCompensation()
    assert np.isfinite(tg).all()


# ---------------------------------------------------------------- traj
def test_quintic_endpoints():
    from libdwbc_tpu.utils.traj import quintic_spline

    p, v, a = quintic_spline(0.0, 0.0, 2.0, 1.0, 0.5, 0.1, 3.0, -0.2, 0.0)
    assert abs(float(p) - 1.0) < 1e-12 and abs(float(v) - 0.5) < 1e-12
    p, v, a = quintic_spline(2.0, 0.0, 2.0, 1.0, 0.5, 0.1, 3.0, -0.2, 0.0)
    assert abs(float(p) - 3.0) < 1e-9 and abs(float(v) + 0.2) < 1e-9
    # clamping
    p, _, _ = quintic_spline(5.0, 0.0, 2.0, 1.0, 0.5, 0.1, 3.0, -0.2, 0.0)
    assert abs(float(p) - 3.0) < 1e-12


def test_quintic_matches_reference_formula():
    """Cross-check the closed-form coefficients against the reference's
    3x3 linear solve (src/math.cpp:127-186)."""
    from libdwbc_tpu.utils.traj import quintic_spline

    rng = np.random.default_rng(0)
    for _ in range(5):
        t0, dt = rng.uniform(0, 1), rng.uniform(0.5, 3.0)
        tf = t0 + dt
        x0, v0, a0, xf, vf, af = rng.standard_normal(6)
        ts = dt
        M = np.array(
            [
                [ts**3, ts**4, ts**5],
                [3 * ts**2, 4 * ts**3, 5 * ts**4],
                [6 * ts, 12 * ts**2, 20 * ts**3],
            ]
        )
        r = np.array(
            [xf - x0 - v0 * ts - a0 * ts**2 / 2, vf - v0 - a0 * ts, af - a0]
        )
        a4, a5, a6 = np.linalg.solve(M, r)
        t = t0 + 0.37 * dt
        tc = t - t0
        p_ref = x0 + v0 * tc + a0 / 2 * tc**2 + a4 * tc**3 + a5 * tc**4 + a6 * tc**5
        p, _, _ = quintic_spline(t, t0, tf, x0, v0, a0, xf, vf, af)
        assert abs(float(p) - p_ref) < 1e-10


def test_rotation_cubic_endpoints():
    from scipy.spatial.transform import Rotation

    from libdwbc_tpu.utils.traj import rotation_cubic

    R0 = Rotation.from_euler("xyz", [0.3, -0.2, 0.5]).as_matrix()
    Rf = Rotation.from_euler("xyz", [-0.1, 0.4, -0.3]).as_matrix()
    Rt = rotation_cubic(0.0, 0.0, 1.0, jnp.array(R0), jnp.array(Rf))
    assert np.abs(np.asarray(Rt) - R0).max() < 1e-7
    Rt = rotation_cubic(1.0, 0.0, 1.0, jnp.array(R0), jnp.array(Rf))
    assert np.abs(np.asarray(Rt) - Rf).max() < 1e-7


def test_servo_zero_error_at_target():
    from libdwbc_tpu.utils.traj import fstar_pos_pd

    pos = jnp.array([1.0, 2.0, 3.0])
    f, p_err, d_err = fstar_pos_pd(
        5.0, 0.0, 1.0, jnp.zeros(3), jnp.zeros(3), pos, jnp.zeros(3),
        pos, jnp.zeros(3),
        jnp.full(3, 100.0), jnp.full(3, 20.0), jnp.ones(3),
    )
    assert np.abs(np.asarray(f)).max() < 1e-9


def test_facade_trajectory_servo():
    from conftest import make_standard_robot

    rd = make_standard_robot(1)
    rd.SetTaskGain(0, [50.0] * 3, [10.0] * 3, [1.0] * 3, [40.0] * 3, [8.0] * 3, [1.0] * 3)
    st = rd.state
    p0 = np.asarray(st.p[0])
    rd.SetTrajectoryQuintic(0, 0.0, 2.0, p0, np.zeros(3), p0 + [0.1, 0, 0.05], np.zeros(3))
    rd.UpdateTaskSpace(control_time=0.5)
    f = rd._fstars[0]
    assert f.shape == (6,)
    assert f[0] > 0  # accelerating toward +x target
    # at t >= tf with robot at target, servo output ≈ 0
    rd.SetTrajectoryQuintic(0, 0.0, 2.0, p0, np.zeros(3), p0, np.zeros(3))
    rd.UpdateTaskSpace(control_time=3.0)
    assert np.abs(rd._fstars[0][:3]).max() < 1e-8


# -------------------------------------------------------------- bridge
def test_rl_bridge_matches_facade():
    from conftest import CASE_FSTAR, make_standard_robot
    from libdwbc_tpu.bridge import RlWBCBridge

    rd = make_standard_robot(1)
    rd.CalcContactConstraint()
    rd.CalcGravCompensation()
    rd.CalcTaskControlTorque(True)
    rd.CalcContactRedistribute(True)
    tau_ref = rd.torque_command()

    br = RlWBCBridge(0, urdf_path=URDF)
    # mujoco layout: [xyz, qw qx qy qz, joints]
    qpos = np.zeros(40)
    qpos[0:3] = [0, 0, 0.92983]
    qpos[3] = 1.0
    qpos[7:40] = CASE_Q[1]
    br.UpdateKinematics(qpos, np.zeros(39), np.zeros(39))
    br.SetContact(True, True)
    f1, f2 = CASE_FSTAR[1]
    br.SetTaskSpace(0, f1)
    br.SetTaskSpace(1, f2)
    br.CalcTorque()
    tau = np.array(br.getTorqueCommand())
    assert np.abs(tau - tau_ref).max() < 1e-4


def test_batched_bridge():
    from libdwbc_tpu.bridge import BatchedRlWBCBridge

    import os
    if not os.path.exists(os.path.join(os.path.dirname(os.path.dirname(__file__)), "models", "tocabi.npz")):
        pytest.skip("no serialized model")
    br = BatchedRlWBCBridge(4, qp_iters=8)
    qpos = np.zeros((4, 40), dtype=np.float32)
    qpos[:, 2] = 0.92983
    qpos[:, 3] = 1.0
    qpos[:, 7:40] = CASE_Q[1]
    tau = br.solve(
        qpos, np.zeros((4, 39), np.float32), np.zeros((4, 39), np.float32),
        np.tile([0.1, 0.2, 0.1, 0, 0, 0], (4, 1)).astype(np.float32),
        np.tile([0.05, 0, 0], (4, 1)).astype(np.float32),
    )
    assert tau.shape == (4, 33)
    assert np.isfinite(tau).all()
