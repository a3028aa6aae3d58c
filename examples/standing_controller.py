"""Example: Tocabi double-support standing controller, step by step.

Mirrors the reference's canonical usage sequence (tests/test.cpp:155-180):
load model → contacts → tasks → per-tick Update/Calc calls — then shows the
same thing as ONE fused compiled tick.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

URDF = "/root/reference/tests/dyros_tocabi.urdf"
MODEL = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "models", "tocabi.npz")


def standing_q(nq=40, ndof=39):
    q = np.zeros(nq)
    q[2] = 0.92983
    q[ndof] = 1.0
    q[6:18] = [0, 0, -0.24, 0.6, -0.36, 0] * 2          # legs bent
    q[21:29] = [0.3, 0.3, 1.5, -1.27, -1, 0, -1, 0]     # left arm
    q[31:39] = [-0.3, -0.3, -1.5, 1.27, 1, 0, 1, 0]     # right arm
    return q


def facade_demo():
    from libdwbc_tpu.wbc import types as T
    from libdwbc_tpu.wbc.robot import RobotData

    rd = RobotData()
    if os.path.exists(URDF):
        rd.LoadModelData(URDF, True, 1)
    else:
        from libdwbc_tpu.kin.engine import Kinematics
        from libdwbc_tpu.model.compile import RobotModel

        rd.model = RobotModel.load(MODEL)
        rd.kin = Kinematics(rd.model)

    rd.AddContactConstraint(6, T.CONTACT_6D, [0.03, 0, -0.1585], [0, 0, 1], 0.15, 0.075)
    rd.AddContactConstraint(12, T.CONTACT_6D, [0.03, 0, -0.1585], [0, 0, 1], 0.15, 0.075)
    rd.AddTaskSpace(0, T.TASK_LINK_6D, 0, np.zeros(3))
    rd.AddTaskSpace(1, T.TASK_LINK_ROTATION, 15, np.zeros(3))
    rd.SetTorqueLimit(np.full(33, 300.0))

    rd.UpdateKinematics(standing_q(), np.zeros(39))
    rd.SetContact(True, True)
    rd.CalcContactConstraint()
    rd.SetTaskSpace(0, np.array([0.0, 0.1, 0.0, 0.0, 0.0, 0.0]))
    rd.SetTaskSpace(1, np.array([0.0, 0.0, 0.05]))
    rd.CalcGravCompensation()
    rd.CalcTaskControlTorque(True)
    rd.CalcContactRedistribute(True)

    tau = rd.torque_command()
    cf = rd.getContactForce(tau)
    print("torque command (first 6 joints):", np.round(tau[:6], 2))
    print("left-foot contact wrench:", np.round(cf[:6], 1))
    print("ZMP:", np.round(rd.getZMP(cf), 4))
    return tau


def fused_demo():
    import jax.numpy as jnp

    from libdwbc_tpu.model.compile import RobotModel
    from libdwbc_tpu.wbc.pipeline import CompiledTick, standard_tocabi_config

    model = RobotModel.load(MODEL)
    tick = CompiledTick(model, standard_tocabi_config(model), dtype=jnp.float32)
    res = tick(
        standing_q().astype(np.float32), np.zeros(39, np.float32),
        (np.array([0, 0.1, 0, 0, 0, 0], np.float32),
         np.array([0, 0, 0.05], np.float32)),
    )
    print("fused tick torque (first 6):", np.round(np.asarray(res.torque_cmd[:6]), 2))
    print("QP primal residual:", float(res.qp_primal_res))


if __name__ == "__main__":
    facade_demo()
    fused_demo()
