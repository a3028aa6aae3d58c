"""Decompose the full-LQP vs reduced-LQP torque gap (dof_sweep's ~7.4 Nm
``lqp_torque_similarity``) into physically meaningful parts.

The two cascades are DIFFERENT optimization programs — the reference's own
harness (tests/sp_test/dof_comparison.cpp) compares their *timings* only,
never their torques; jacc_compare.cpp:370-505 compares solver families on
the SAME program.  A raw ‖Δτ‖ therefore needs decomposition, not an
assert:

1. **span(NwJw) component** — internal contact-force redistribution with
   zero task-space effect (flat-face indeterminacy, CLAUDE.md).
2. **Task-space effect** — the part that matters.  Under the active
   contact constraint J_C q̈ = 0, the constrained forward dynamics of a
   torque command is

       q̈(τ) = (A⁻¹N_C)(Sᵀτ − G)

   (A⁻¹N_C is the contact-consistent inverse inertia; J_C A⁻¹N_C = 0 by
   construction).  Each program's *achieved task acceleration*
   J_task·q̈(τ) is compared against the commanded f* and against the other
   program.  If both achieve f* to QP tolerance, the residual ‖Δτ‖ is
   pure null-space/regularization choice — the reference's A-weighted
   ‖q̈‖ cost (src/dwbc.cpp:4306-4325) picks different interior points in
   full vs reduced coordinates.

Writes benchmarks/lqp_gap_r04.json.
Usage: python benchmarks/lqp_gap.py [--dofs 18,33,45]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DOF_DIR = "/root/reference/tests/dof_test"


def analyze(urdf):
    import jax.numpy as jnp

    from libdwbc_tpu.kin.engine import Kinematics
    from libdwbc_tpu.model.compile import compile_urdf
    from libdwbc_tpu.wbc import types as T
    from libdwbc_tpu.wbc.robot import RobotData

    rd = RobotData(dtype=jnp.float64)
    rd.model = compile_urdf(urdf, floating=True)
    rd.kin = Kinematics(rd.model)
    rd.AddContactConstraint(6, T.CONTACT_6D, [0.03, 0, -0.1585], [0, 0, 1],
                            0.15, 0.075)
    rd.AddContactConstraint(12, T.CONTACT_6D, [0.03, 0, -0.1585], [0, 0, 1],
                            0.15, 0.075)
    rd.AddTaskSpace(0, T.TASK_LINK_6D, 0, np.zeros(3))
    rd.SetTorqueLimit(np.full(rd.model_dof_, 300.0))
    q = np.zeros(rd.model.nq)
    q[2] = 0.92983
    q[rd.model.ndof] = 1.0
    q[6:18] = [0.0, 0.0, -0.24, 0.6, -0.36, 0.0] * 2
    rd.UpdateKinematics(q, np.zeros(rd.model.ndof))
    rd.SetContact(True, True)
    fstar = np.array([0.1, 0.4, 0.1, 0.1, -0.1, 0.1])
    rd.SetTaskSpace(0, fstar)

    rd.CalcContactConstraint()
    rd.CalcGravCompensation()
    rd.CalcTaskSpace()

    # full LQP
    rd.ConfigureLQP()
    tau_l = np.asarray(rd.CalcControlTorqueLQP())

    # reduced LQP (+ nc cascade), sequence of dof_comparison.cpp:229-252
    rd.ReducedDynamicsCalculate()
    rd.ReducedCalcContactConstraint()
    rd.ReducedCalcGravCompensation()
    rd.ReducedCalcTaskSpace()
    rd.ConfigureLQP_R()
    rd.CalcControlTorqueLQP_R()
    q_acc_R = rd.lqp_r_result.y[: rd._ridx.reduced_system_dof]
    rd.ConfigureLQP_R_NC(q_acc_R)
    rd.CalcControlTorqueLQP_R_NC()
    tau_lr = np.asarray(rd.torque_lqp_)

    st = rd.state
    A_inv_N_C = np.asarray(rd.cspace.A_inv_N_C)
    G = np.asarray(st.G)
    n = rd.model.ndof
    m = rd.model_dof_
    S_T = np.zeros((n, m))
    S_T[6:, :] = np.eye(m)
    J_task = np.asarray(rd._task_jacobian(st, 0))
    J_C = np.asarray(rd._contact_jacobian(st))
    NwJw = np.asarray(rd.cspace.NwJw)

    def acc_of(tau):
        return A_inv_N_C @ (S_T @ tau - G)

    acc_f = acc_of(tau_l)
    acc_r = acc_of(tau_lr)

    dtau = tau_l - tau_lr
    coef, *_ = np.linalg.lstsq(NwJw, dtau, rcond=None)
    dtau_span = NwJw @ coef
    dtau_resid = dtau - dtau_span

    task_acc_f = J_task @ acc_f
    task_acc_r = J_task @ acc_r

    return dict(
        urdf=os.path.basename(urdf),
        model_dof=m,
        reduced_dof=int(rd._ridx.reduced_model_dof),
        dtau_norm=float(np.linalg.norm(dtau)),
        dtau_in_span_nwjw=float(np.linalg.norm(dtau_span)),
        dtau_outside_span=float(np.linalg.norm(dtau_resid)),
        # the part with physical meaning: achieved task acceleration
        task_acc_diff=float(np.abs(task_acc_f - task_acc_r).max()),
        task_acc_err_full=float(np.abs(task_acc_f - fstar).max()),
        task_acc_err_reduced=float(np.abs(task_acc_r - fstar).max()),
        contact_acc_full=float(np.abs(J_C @ acc_f).max()),
        contact_acc_reduced=float(np.abs(J_C @ acc_r).max()),
        # nc-chain part of Δτ (recomposition territory): actuated indices
        dtau_nc_chain=float(np.linalg.norm(
            dtau[np.asarray(rd._ridx.nc_joints) - 6]
        )) if rd._ridx.nc_dof else 0.0,
        dtau_co_chain=float(np.linalg.norm(
            dtau[np.asarray(rd._ridx.co_joints) - 6]
        )),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dofs", default="18,33,45")
    ap.add_argument("-o", "--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "lqp_gap_r04.json"))
    args = ap.parse_args()

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_ENABLE_X64"] = "1"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    rows = []
    for d in args.dofs.split(","):
        d = d.strip()
        if d == "33":
            urdf = "/root/reference/tests/dyros_tocabi.urdf"
        else:
            urdf = os.path.join(DOF_DIR, f"dyros_tocabi_dof{d}.urdf")
        row = analyze(urdf)
        rows.append(row)
        print(json.dumps(row))
    with open(args.out, "w") as f:
        json.dump(dict(rows=rows), f, indent=1)


if __name__ == "__main__":
    main()
