"""RobotData facade: the user-facing controller object.

API-compatible (in spirit and naming) with the reference's ``DWBC::RobotData``
(include/dwbc.h:59-430) but functionally organized: the object holds only
*static configuration* (model, contact defs, task defs, limits) plus the last
computed state; every computation is a pure jitted function of
``(q, qdot, f*)``.  ``CopyKinematicsData`` (src/dwbc.cpp:1711-1762) — the
reference's producer/consumer hand-off — is unnecessary: state pytrees are
immutable values.

Batched use: see ``libdwbc_tpu.parallel`` for vmap/shard_map wrappers around
the same pure tick functions.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..kin.engine import Kinematics, KinState
from ..model.compile import RobotModel, compile_urdf
from . import dynamics as dyn
from . import types as T
from .hqp import (
    contact_constraint_blocks,
    solve_contact_redistribution_qp,
    solve_task_level_qp,
)


class RobotData:
    """Stateful facade over the pure pipeline (reference parity surface)."""

    def __init__(self, dtype=jnp.float64):
        self.dtype = dtype
        self.model: RobotModel | None = None
        self.kin: Kinematics | None = None
        self.cc_: list[T.ContactDef] = []
        self.ts_: list[T.TaskDef] = []
        self.torque_limit_: np.ndarray | None = None
        self._fstars: dict[int, np.ndarray] = {}
        self._custom_J: dict[int, np.ndarray] = {}
        self.state: KinState | None = None
        # results of the last tick (numpy views for user inspection)
        self.torque_grav_ = None
        self.torque_task_ = None
        self.torque_contact_ = None
        self.qp_iters = 25

    # ------------------------------------------------------------ model
    def LoadModelData(self, urdf_path: str, floating: bool = True, verbose: int = 0):
        self.model = compile_urdf(urdf_path, floating)
        self.kin = Kinematics(self.model)
        if verbose:
            print(
                f"model '{self.model.name}': system dof {self.model.ndof}, "
                f"model dof {self.model.model_dof}, bodies {self.model.nbody}"
            )

    @property
    def system_dof_(self):
        return self.model.ndof

    @property
    def model_dof_(self):
        return self.model.model_dof

    def SetTorqueLimit(self, tlim):
        self.torque_limit_ = np.asarray(tlim, dtype=np.float64)

    # ---------------------------------------------------------- contacts
    def AddContactConstraint(
        self, link, contact_type, contact_point, contact_vector,
        lx=0.0, ly=0.0, verbose=False,
    ):
        if isinstance(link, str):
            link = self.model.body_index(link)
        for c in self.cc_:
            if c.link == link:
                return
        self.cc_.append(
            T.ContactDef(
                link=int(link),
                contact_type=contact_type,
                contact_point=np.asarray(contact_point, dtype=np.float64),
                contact_direction=np.asarray(contact_vector, dtype=np.float64),
                plane_x=float(lx), plane_y=float(ly),
            )
        )

    def ClearContactConstraint(self):
        self.cc_.clear()

    def SetContact(self, *flags: bool):
        for c, f in zip(self.cc_, flags):
            c.active = bool(f)
        for c in self.cc_[len(flags):]:
            c.active = False

    def SetFrictionRatio(self, idx: int, mu: float, mu_z: float):
        self.cc_[idx].friction_ratio = mu
        self.cc_[idx].friction_ratio_z = mu_z

    @property
    def contact_dof_(self) -> int:
        return sum(c.contact_dof for c in self.cc_ if c.active)

    def active_contacts(self) -> list[T.ContactDef]:
        return [c for c in self.cc_ if c.active]

    # ------------------------------------------------------------- tasks
    def AddTaskSpace(self, heirarchy: int, task_mode, link=None, task_point=None,
                     task_dof: int | None = None, verbose=False):
        """Either (mode, link, point) for a link task appended/merged at the
        given hierarchy, or task_dof for a custom-J task."""
        if task_dof is not None:
            self.ts_.append(T.TaskDef(links=[], custom_dof=task_dof))
            return
        if isinstance(link, str):
            link = self.model.body_index(link)
        tp = np.zeros(3) if task_point is None else np.asarray(task_point, float)
        tl = T.TaskLinkDef(mode=task_mode, link=int(link), task_point=tp)
        if heirarchy == len(self.ts_):
            self.ts_.append(T.TaskDef(links=[tl]))
        elif heirarchy < len(self.ts_):
            self.ts_[heirarchy].links.append(tl)
        else:
            raise ValueError("hierarchy index out of order")

    def AddTaskLink(self, heirarchy: int, task_mode, link, task_point=None):
        self.AddTaskSpace(heirarchy, task_mode, link, task_point)

    def ClearTaskSpace(self):
        self.ts_.clear()
        self._fstars.clear()

    def SetTaskSpace(self, heirarchy: int, f_star, J_task=None):
        self._fstars[heirarchy] = np.asarray(f_star, dtype=np.float64)
        if J_task is not None:
            self._custom_J[heirarchy] = np.asarray(J_task, dtype=np.float64)

    # -------------------------------------------------------- kinematics
    def UpdateKinematics(self, q, qdot, qddot=None, update_kinematics=True):
        q = jnp.asarray(q, dtype=self.dtype)
        qdot = jnp.asarray(qdot, dtype=self.dtype)
        self.state = self.kin.update(q, qdot)
        self._fk_cache = None
        return self.state

    # ------------------------------------------------- static assemblies
    def _contact_jacobian(self, st: KinState):
        """Stacked J_C for active contacts (src/dwbc.cpp:433-454)."""
        fk = self._fk(st)
        Js = []
        for c in self.active_contacts():
            J = self.kin.frame_point_jacobian(fk, c.link, jnp.asarray(c.contact_point, self.dtype))
            Js.append(J[: c.contact_dof])
        return jnp.concatenate(Js, axis=-2)

    def _fk(self, st: KinState):
        from ..kin.engine import FK

        # rebuild an FK view from state (cheap: slices of stored arrays)
        axis_w = jnp.einsum(
            "...bij,bj->...bi", st.R, jnp.asarray(self.model.axis, self.dtype)
        )
        return FK(R=st.R, p=st.p, axis_w=axis_w, com_w=st.com_w)

    def _task_jacobian(self, st: KinState, h: int):
        td = self.ts_[h]
        if td.custom_dof:
            return jnp.asarray(self._custom_J[h], self.dtype)
        fk = self._fk(st)
        rows = []
        for tl in td.links:
            link = tl.link
            if link == self.model.nbody:  # virtual COM link
                J6 = st.Jcom_total
            elif tl.mode in (T.TASK_LINK_6D_COM_FRAME, T.TASK_LINK_POSITION_COM_FRAME):
                J6 = st.Jcom[link]
            elif tl.mode in (T.TASK_LINK_6D_CUSTOM_FRAME, T.TASK_LINK_POSITION_CUSTOM_FRAME):
                J6 = self.kin.frame_point_jacobian(fk, link, jnp.asarray(tl.task_point, self.dtype))
            else:
                J6 = st.J[link]
            if tl.mode in (T.TASK_LINK_6D, T.TASK_LINK_6D_COM_FRAME, T.TASK_LINK_6D_CUSTOM_FRAME):
                rows.append(J6)
            elif tl.mode in (T.TASK_LINK_POSITION, T.TASK_LINK_POSITION_COM_FRAME, T.TASK_LINK_POSITION_CUSTOM_FRAME):
                rows.append(J6[..., 0:3, :])
            else:  # rotation tasks
                rows.append(J6[..., 3:6, :])
        return jnp.concatenate(rows, axis=-2)

    def _constraint_blocks(self, st: KinState):
        consts = []
        rotms = []
        for c in self.active_contacts():
            Z = dyn.zmp_const_matrix(c.plane_x, c.plane_y, dtype=self.dtype)
            F = dyn.force_const_matrix(c.friction_ratio, c.friction_ratio_z, dtype=self.dtype)
            consts.append(jnp.concatenate([Z, F], axis=0))
            rotms.append(st.R[c.link])
        return contact_constraint_blocks(consts, jnp.stack(rotms, axis=-3))

    # ----------------------------------------------------------- pipeline
    def CalcContactConstraint(self):
        st = self.state
        self.J_C = self._contact_jacobian(st)
        self.cspace = dyn.contact_space(self.J_C, st.A_inv)
        return 1

    def CalcGravCompensation(self):
        st = self.state
        tg, P_C = dyn.gravity_compensation(
            st.A_inv, self.cspace.W_inv, self.cspace.N_C, self.cspace.J_C_INV_T, st.G
        )
        self.torque_grav_ = tg
        self.P_C = P_C
        return np.asarray(tg)

    def CalcTaskSpace(self):
        st = self.state
        self._task_factors = []
        prev_null = jnp.eye(self.model_dof_, dtype=self.dtype)
        self._nulls = []
        for h in range(len(self.ts_)):
            J_task = self._task_jacobian(st, h)
            tf = dyn.task_jkt(J_task, st.A_inv, self.cspace.N_C, self.cspace.W_inv)
            self._task_factors.append((J_task, tf))
            null = dyn.task_null_space(
                tf.J_kt, tf.Lambda_task, J_task, self.cspace.A_inv_N_C, prev_null
            )
            self._nulls.append(null)
            prev_null = null

    def CalcTaskControlTorque(self, hqp: bool = True, init: bool = True,
                              update_task_space: bool = True):
        if update_task_space:
            self.CalcTaskSpace()
        st = self.state
        m = self.model_dof_
        torque_task = jnp.zeros(m, dtype=self.dtype)
        torque_contact = jnp.zeros(m, dtype=self.dtype)
        tlim = (
            jnp.asarray(self.torque_limit_, self.dtype)
            if self.torque_limit_ is not None
            else None
        )
        A_const, A_rot = self._constraint_blocks(st)
        self.qp_results = []
        for h, (J_task, tf) in enumerate(self._task_factors):
            fstar = jnp.asarray(self._fstars[h], self.dtype)
            null_prev = (
                jnp.eye(m, dtype=self.dtype) if h == 0 else self._nulls[h - 1]
            )
            if hqp:
                Ntorque = null_prev @ tf.J_kt @ tf.Lambda_task
                res = solve_task_level_qp(
                    Ntorque, fstar, self.torque_grav_ + torque_task,
                    self.cspace.NwJw, self.cspace.J_C_INV_T, self.P_C,
                    A_const, A_rot, tlim, iters=self.qp_iters,
                )
                self.qp_results.append(res)
                torque_h = tf.J_kt @ tf.Lambda_task @ (fstar + res.f_star_delta)
                torque_contact = self.cspace.NwJw @ res.contact_qp
            else:
                torque_h = tf.J_kt @ tf.Lambda_task @ fstar
            if h == 0:
                torque_task = torque_h
            else:
                torque_task = torque_task + self._nulls[h - 1] @ torque_h
        self.torque_task_ = torque_task
        self.torque_contact_ = torque_contact
        return 1

    def CalcContactRedistribute(self, hqp: bool = True, init: bool = True):
        st = self.state
        m = self.model_dof_
        torque_input = self.torque_grav_ + self.torque_task_ + self.torque_contact_
        tlim = (
            jnp.asarray(self.torque_limit_, self.dtype)
            if self.torque_limit_ is not None
            else None
        )
        if hqp:
            A_const, A_rot = self._constraint_blocks(st)
            sol = solve_contact_redistribution_qp(
                torque_input, self.cspace.NwJw, self.cspace.J_C_INV_T, self.P_C,
                A_const, A_rot, tlim, iters=self.qp_iters,
            )
            self.cf_redis_qp_ = sol.x
            self.torque_contact_ = self.torque_contact_ + self.cspace.NwJw @ sol.x
            return 1
        # closed-form two-foot redistribution (src/dwbc.cpp:1572-1612)
        if self.contact_dof_ != 12:
            self.torque_contact_ = jnp.zeros(m, dtype=self.dtype)
            return 0
        cf = dyn.contact_force_from_torque(
            torque_input, self.cspace.J_C_INV_T, self.P_C
        )
        con = self.active_contacts()
        fk = self._fk(st)
        pc = []
        for c in con:
            pw = st.p[c.link] + st.R[c.link] @ jnp.asarray(c.contact_point, self.dtype)
            pc.append(pw)
        # base yaw rotation (rpy from pelvis rotm, eulerAngles(2,1,0))
        R0 = st.R[0]
        yaw = jnp.arctan2(R0[1, 0], R0[0, 0])
        Rz = dyn.yaw_rotation(-yaw)
        rot12 = jnp.zeros((12, 12), dtype=self.dtype)
        for i in range(4):
            rot12 = rot12.at[3 * i : 3 * i + 3, 3 * i : 3 * i + 3].set(Rz)
        P1 = Rz @ (pc[0] - st.com_pos)
        P2 = Rz @ (pc[1] - st.com_pos)
        F12 = rot12 @ cf
        _, redist, eta = dyn.contact_redistribute_two(
            0.99, 0.26, 0.1, 1.0, 0.9, 0.9, P1, P2, F12
        )
        fc_redist = rot12.T @ redist
        desired = jnp.zeros(12, dtype=self.dtype)
        desired = desired.at[6:12].set(-cf[6:12] + fc_redist[6:12])
        V2T = jnp.swapaxes(self.cspace.V2, -1, -2)
        M = self.cspace.J_C_INV_T[..., :, -m:][..., 6:12, :] @ V2T
        self.torque_contact_ = V2T @ jnp.linalg.inv(M) @ desired[6:12]
        return 1

    # ------------------------------------------------------------ observers
    def getContactForce(self, command_torque):
        return np.asarray(
            dyn.contact_force_from_torque(
                jnp.asarray(command_torque, self.dtype),
                self.cspace.J_C_INV_T, self.P_C,
            )
        )

    def getZMP(self, contact_force):
        """Aggregate ZMP from per-contact wrenches (src/dwbc.cpp:898-939)."""
        cf = np.asarray(contact_force)
        st = self.state
        total_fz = 0.0
        zmp = np.zeros(3)
        poss = []
        for i, c in enumerate(self.active_contacts()):
            pw = np.asarray(st.p[c.link] + st.R[c.link] @ jnp.asarray(c.contact_point, self.dtype))
            poss.append(pw)
            total_fz += cf[2 + 6 * i]
        for i, c in enumerate(self.active_contacts()):
            fz = cf[6 * i + 2]
            if fz > -1e-3:
                zp = poss[i]
            else:
                zp = poss[i] + np.array(
                    [-cf[6 * i + 4] / fz, cf[6 * i + 3] / fz, 0.0]
                )
            zmp += zp * fz / total_fz
        return zmp

    # convenience: full tick
    def torque_command(self):
        return np.asarray(self.torque_grav_ + self.torque_task_ + self.torque_contact_)
