"""Fused control-tick pipeline: (q, q̇, f*) → τ as ONE XLA computation.

This is the TPU-native answer to the reference's per-tick call sequence
(UpdateKinematics → SetContact → CalcContactConstraint → CalcGravCompensation
→ CalcTaskControlTorque → CalcContactRedistribute, SURVEY.md §3.1).  The whole
tick — kinematics, contact-space factorization, task hierarchy, all QPs — is
traced once per static configuration and compiled to a single graph:

* no host↔device round trips inside the tick;
* trivially batchable with vmap (thousands of scenarios per step);
* shardable with shard_map across a device mesh (see parallel/).

Static configuration = (model, contact set + active pattern, task stack,
torque limits, QP iteration count).  Contact-mode switches recompile (cheap,
cached); the masked multi-mode batch path lives in parallel/hypotheses.py.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..kin.engine import FK, Kinematics
from ..model.compile import RobotModel
from . import dynamics as dyn
from . import types as T
from .hqp import (
    contact_constraint_blocks,
    solve_contact_redistribution_qp,
    solve_task_level_qp,
)


class TickResult(NamedTuple):
    torque_grav: jnp.ndarray
    torque_task: jnp.ndarray
    torque_contact: jnp.ndarray
    torque_cmd: jnp.ndarray
    contact_force: jnp.ndarray    # observed contact wrench under torque_cmd
    qp_gap: jnp.ndarray           # worst complementarity gap across QPs
    qp_primal_res: jnp.ndarray    # worst primal violation across QPs


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    contacts: tuple[T.ContactDef, ...]       # active contacts only
    task_specs: tuple[tuple[tuple[int, int], ...], ...]  # per level: ((mode, link), ...)
    torque_limit: np.ndarray | None
    qp_iters: int = 25
    use_hqp: bool = True


class CompiledTick:
    """One compiled WBC tick for a fixed configuration."""

    def __init__(self, model: RobotModel, cfg: PipelineConfig, dtype=jnp.float32):
        self.model = model
        self.cfg = cfg
        self.kin = Kinematics(model)
        self.dtype = dtype
        self._tick = jax.jit(self._tick_impl, static_argnames=("qp_iters",))

    # -------------------------------------------------------------- pieces
    def _fk_from_state(self, st):
        return FK(
            R=st.R,
            p=st.p,
            axis_w=jnp.einsum(
                "...bij,bj->...bi", st.R, jnp.asarray(self.model.axis, self.dtype)
            ),
            com_w=st.com_w,
        )

    def _contact_jacobian_from_state(self, st):
        return self._contact_jacobian(self._fk_from_state(st))

    def _contact_jacobian(self, fk: FK):
        Js = []
        for c in self.cfg.contacts:
            J = self.kin.frame_point_jacobian(
                fk, c.link, jnp.asarray(c.contact_point, self.dtype)
            )
            Js.append(J[..., : c.contact_dof, :])
        return jnp.concatenate(Js, axis=-2)

    def _constraint_blocks(self, st):
        consts = []
        rotms = []
        for c in self.cfg.contacts:
            Z = dyn.zmp_const_matrix(c.plane_x, c.plane_y, dtype=self.dtype)
            F = dyn.force_const_matrix(
                c.friction_ratio, c.friction_ratio_z, dtype=self.dtype
            )
            consts.append(jnp.concatenate([Z, F], axis=0))
            rotms.append(st.R[..., c.link, :, :])
        return contact_constraint_blocks(consts, jnp.stack(rotms, axis=-3))

    def _task_jacobian(self, st, level: int):
        rows = []
        for mode, link in self.cfg.task_specs[level]:
            if link == self.model.nbody:
                J6 = st.Jcom_total
            elif mode in (T.TASK_LINK_6D_COM_FRAME, T.TASK_LINK_POSITION_COM_FRAME):
                J6 = st.Jcom[..., link, :, :]
            else:
                J6 = st.J[..., link, :, :]
            if mode in (T.TASK_LINK_6D, T.TASK_LINK_6D_COM_FRAME, T.TASK_LINK_6D_CUSTOM_FRAME):
                rows.append(J6)
            elif mode in (
                T.TASK_LINK_POSITION,
                T.TASK_LINK_POSITION_COM_FRAME,
                T.TASK_LINK_POSITION_CUSTOM_FRAME,
            ):
                rows.append(J6[..., 0:3, :])
            else:
                rows.append(J6[..., 3:6, :])
        return jnp.concatenate(rows, axis=-2)

    # ------------------------------------------------------ warm-start carry
    def _level_dims(self):
        """Static (nv, rows) of each QP in the tick, in call order: one per
        task level then the redistribution QP."""
        cfg = self.cfg
        m = self.model.model_dof
        cdof = sum(c.contact_dof for c in cfg.contacts)
        cfree = cdof - 6
        k = 10 * len(cfg.contacts)  # 4 ZMP + 6 cone rows per contact
        lim_rows = 2 * m if cfg.torque_limit is not None else 0
        dims = []
        for level in cfg.task_specs:
            t = sum(
                6 if mode in (T.TASK_LINK_6D, T.TASK_LINK_6D_COM_FRAME,
                              T.TASK_LINK_6D_CUSTOM_FRAME) else 3
                for mode, _ in level
            )
            dims.append((t + cfree, lim_rows + k))
        dims.append((cfree, lim_rows + k))
        return dims

    def init_warm(self, batch=()):
        """Cold-start warm state: one (x, λ) pair per QP in the tick
        (x = 0, λ = 1 — the solver's cold initial point up to slack floors)."""
        return tuple(
            (jnp.zeros(batch + (nv,), self.dtype), jnp.ones(batch + (rows,), self.dtype))
            for nv, rows in self._level_dims()
        )

    # ---------------------------------------------------------------- tick
    def _tick_impl(self, q, qdot, fstars, warm=None, qp_iters=None):
        cfg = self.cfg
        m = self.model.model_dof
        st = self.kin.update(q, qdot)
        fk = FK(
            R=st.R,
            p=st.p,
            axis_w=jnp.einsum(
                "...bij,bj->...bi", st.R, jnp.asarray(self.model.axis, self.dtype)
            ),
            com_w=st.com_w,
        )

        J_C = self._contact_jacobian(fk)
        cs = dyn.contact_space(J_C, st.A_inv)
        torque_grav, P_C = dyn.gravity_compensation(
            st.A_inv, cs.W_inv, cs.N_C, cs.J_C_INV_T, st.G
        )

        tlim = (
            jnp.asarray(cfg.torque_limit, self.dtype)
            if cfg.torque_limit is not None
            else None
        )
        A_const, A_rot = self._constraint_blocks(st)

        batch = q.shape[:-1]
        eye_m = jnp.broadcast_to(jnp.eye(m, dtype=self.dtype), batch + (m, m))
        torque_task = jnp.zeros(batch + (m,), dtype=self.dtype)
        torque_contact = jnp.zeros(batch + (m,), dtype=self.dtype)
        gap = jnp.zeros(batch, dtype=self.dtype)
        pres = jnp.zeros(batch, dtype=self.dtype)
        iters = cfg.qp_iters if qp_iters is None else qp_iters
        warm_out = []

        prev_null = eye_m
        for h in range(len(cfg.task_specs)):
            J_task = self._task_jacobian(st, h)
            tf = dyn.task_jkt(J_task, st.A_inv, cs.N_C, cs.W_inv)
            fstar = fstars[h]
            if cfg.use_hqp:
                Ntorque = prev_null @ tf.J_kt @ tf.Lambda_task
                res = solve_task_level_qp(
                    Ntorque, fstar, torque_grav + torque_task,
                    cs.NwJw, cs.J_C_INV_T, P_C, A_const, A_rot, tlim,
                    iters=iters,
                    warm=None if warm is None else warm[h],
                )
                warm_out.append((res.x, res.lam))
                torque_h = jnp.einsum(
                    "...mt,...t->...m", tf.J_kt @ tf.Lambda_task,
                    fstar + res.f_star_delta,
                )
                torque_contact = jnp.einsum("...mc,...c->...m", cs.NwJw, res.contact_qp)
                gap = jnp.maximum(gap, res.gap)
                pres = jnp.maximum(pres, res.primal_res)
            else:
                torque_h = jnp.einsum(
                    "...mt,...t->...m", tf.J_kt @ tf.Lambda_task, fstar
                )
            if h == 0:
                torque_task = torque_h
            else:
                torque_task = torque_task + jnp.einsum(
                    "...mn,...n->...m", prev_null, torque_h
                )
            prev_null = dyn.task_null_space(
                tf.J_kt, tf.Lambda_task, J_task, cs.A_inv_N_C, prev_null
            )

        if cfg.use_hqp and cs.NwJw.shape[-1] > 0:
            torque_input = torque_grav + torque_task + torque_contact
            sol = solve_contact_redistribution_qp(
                torque_input, cs.NwJw, cs.J_C_INV_T, P_C, A_const, A_rot, tlim,
                iters=iters,
                warm=None if warm is None else warm[len(cfg.task_specs)],
            )
            warm_out.append((sol.x, sol.lam))
            torque_contact = torque_contact + jnp.einsum(
                "...mc,...c->...m", cs.NwJw, sol.x
            )
            gap = jnp.maximum(gap, sol.gap)
            pres = jnp.maximum(pres, sol.primal_res)

        torque_cmd = torque_grav + torque_task + torque_contact
        cforce = dyn.contact_force_from_torque(torque_cmd, cs.J_C_INV_T, P_C)
        result = TickResult(
            torque_grav=torque_grav,
            torque_task=torque_task,
            torque_contact=torque_contact,
            torque_cmd=torque_cmd,
            contact_force=cforce,
            qp_gap=gap,
            qp_primal_res=pres,
        )
        if warm is not None:
            return result, tuple(warm_out)
        return result

    def __call__(self, q, qdot, fstars) -> TickResult:
        q = jnp.asarray(q, self.dtype)
        qdot = jnp.asarray(qdot, self.dtype)
        fstars = tuple(jnp.asarray(f, self.dtype) for f in fstars)
        return self._tick(q, qdot, fstars)

    def batched(self):
        """Batched tick over a leading scenario axis (jitted).

        The whole pipeline broadcasts over leading batch dims natively (no
        vmap), which lets the QP layer see the full batch and route it to the
        Pallas lane-batched megakernel on TPU.
        """
        return jax.jit(self._tick_impl, static_argnames=("qp_iters",))


def standard_tocabi_config(
    model: RobotModel,
    both_feet: bool = True,
    torque_limit: float = 300.0,
    qp_iters: int = 25,
    swing_task: bool = False,
) -> PipelineConfig:
    """Reference test configurations (dwbc_test.cpp:63-77): double-support
    stand, pelvis 6D + upper-body rotation tasks; optional swing-foot task
    (single support, 3-level hierarchy — BASELINE config 3)."""
    foot = dict(
        contact_type=T.CONTACT_6D,
        contact_point=np.array([0.03, 0.0, -0.1585]),
        contact_direction=np.array([0.0, 0.0, 1.0]),
        plane_x=0.15,
        plane_y=0.075,
        active=True,
    )
    contacts = [T.ContactDef(link=6, **foot)]
    if both_feet:
        contacts.append(T.ContactDef(link=12, **foot))
    task_specs = [((T.TASK_LINK_6D, 0),), ((T.TASK_LINK_ROTATION, 15),)]
    if swing_task:
        task_specs.append(((T.TASK_LINK_6D, 12),))  # swing right foot
    return PipelineConfig(
        contacts=tuple(contacts),
        task_specs=tuple(tuple(s) for s in task_specs),
        torque_limit=np.full(model.model_dof, torque_limit),
        qp_iters=qp_iters,
    )
