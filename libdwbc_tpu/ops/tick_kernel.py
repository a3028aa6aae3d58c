"""The fused WBC tick as ONE element-leading program: q → τ.

This is the round-3 answer to the tick being glue-bound (~6% of its own
measured QP speed-of-light): instead of hundreds of XLA ops whose
(1024, 39, 39)-ish intermediates round-trip HBM between fusions, the ENTIRE
tick — forward kinematics, point jacobians, the mass matrix via a
world-frame composite-rigid-body pass, A⁻¹, the contact-space
factorization, per-level JKT, constraint assembly, and the three IPM QPs —
is expressed in the element-leading layout of ops/elemlin and runs inside
one or two Pallas kernel launches (wbc/fused.py).

Reference parity: this computes exactly the quantities of the per-tick call
sequence UpdateKinematics → CalcContactConstraint → CalcGravCompensation →
CalcTaskControlTorque → CalcContactRedistribute
(/root/reference/src/dwbc.cpp:279-1620, SURVEY.md §3.1), with the same
algorithmic substitutions already golden-validated in kin/engine.py,
wbc/dynamics.py, wbc/hqp.py and ops/qp.py:

* mass matrix: composite-rigid-body at the WORLD ORIGIN — spatial inertias
  are summed up the tree in world coordinates (plain adds, no X-transforms)
  and A[i,j] = S_i·(I^C_{body(j)} S_j) over ancestor dof pairs.
  Algebraically identical to RBDL's CRBA (src/dwbc.cpp:305) and to the
  KE-metric Gram form in kin/engine.py::mass_matrix, but needs NO body
  jacobians at all — the single biggest VMEM/FLOP saving of the fused path;
* gravity vector: G = −A[0:3,:]ᵀ·g — the reference's COM-jacobian-transpose
  form (src/dwbc.cpp:358) collapsed through CMM[0:3] = A[0:3] (the
  cm_rot6 top rows are [I 0], src/dwbc.cpp:331-341);
* contact space / JKT / QPs: elem-leading transposes of
  wbc/dynamics.py::contact_space/task_jkt and wbc/hqp.py's assembly, with
  N_C never materialized (J A⁻¹N_C = JA⁻¹ − (JA⁻¹J_Cᵀ)J̄_cᵀ);
* IPM: the predictor–corrector recurrence of ops/pallas_qp.py (same
  floors, caps, freeze rule, warm-start split steps, NaN guard).

Everything here is layout-agnostic over trailing batch dims: the same
functions trace as a plain XLA graph (CPU f64 parity tests in
tests/test_fused_tick.py) and inside a Pallas kernel ((8,128) batch tiles).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import elemlin as el
from ..wbc import types as T


def _np_zmp_block(lx, ly):
    Z = np.zeros((4, 6))
    Z[0, 2], Z[0, 4] = -lx, -1.0
    Z[1, 2], Z[1, 4] = -lx, 1.0
    Z[2, 2], Z[2, 3] = -ly, -1.0
    Z[3, 2], Z[3, 3] = -ly, 1.0
    return Z


def _np_force_block(mu, mu_z):
    F = np.zeros((6, 6))
    F[0, 0], F[0, 2] = 1.0, -mu
    F[1, 0], F[1, 2] = -1.0, -mu
    F[2, 1], F[2, 2] = 1.0, -mu
    F[3, 1], F[3, 2] = -1.0, -mu
    F[4, 5], F[4, 2] = 1.0, -mu_z
    F[5, 5], F[5, 2] = -1.0, -mu_z
    return F


def _np_constraint_block(c):
    """Static per-contact constraint block (wbc/dynamics.py:273-285)."""
    Z = _np_zmp_block(c.plane_x, c.plane_y)
    F = _np_force_block(c.friction_ratio, c.friction_ratio_z)
    if c.contact_type == T.CONTACT_6D:
        return np.concatenate([Z, F], axis=0)
    if c.contact_type == T.CONTACT_POINT:
        return F[:, 0:3]
    if c.contact_type == T.CONTACT_LINE:
        cols = [0, 1, 2, 4, 5]
        return np.concatenate([Z[0:2][:, cols], F[:, cols]], axis=0)
    raise ValueError(c.contact_type)


_SIX = (T.TASK_LINK_6D, T.TASK_LINK_6D_COM_FRAME, T.TASK_LINK_6D_CUSTOM_FRAME)
_POS = (T.TASK_LINK_POSITION, T.TASK_LINK_POSITION_COM_FRAME,
        T.TASK_LINK_POSITION_CUSTOM_FRAME)
_COM_FRAME = (T.TASK_LINK_6D_COM_FRAME, T.TASK_LINK_POSITION_COM_FRAME)


class TickProgram:
    """Static plan + element-leading implementation of one tick config.

    model: RobotModel; cfg: wbc.pipeline.PipelineConfig.
    """

    def __init__(self, model, cfg, dtype=jnp.float32):
        self.model = model
        self.cfg = cfg
        self.dtype = dtype
        m = model
        self.nbody = int(m.nbody)
        self.ndof = int(m.ndof)
        self.mdof = int(m.model_dof)
        assert m.floating, "fused tick: floating-base models only"

        self.parent = [int(x) for x in m.parent]
        self.q_index = [int(x) for x in m.q_index]
        self.axis = np.asarray(m.axis, np.float64)
        self.X_rot = np.asarray(m.X_T_rot, np.float64)
        self.X_trans = np.asarray(m.X_T_trans, np.float64)
        self.com = np.asarray(m.com, np.float64)
        self.inertia = np.asarray(m.inertia, np.float64)
        self.mass = np.asarray(m.mass, np.float64)
        self.amask = np.asarray(m.ancestor_mask, np.float64)
        self.gravity = np.asarray(m.gravity, np.float64)
        self.total_mass = float(m.total_mass)

        # dof owners (body carrying each joint dof; base dofs -> body 0)
        owner = np.zeros(self.ndof, np.int32)
        for i in range(1, self.nbody):
            owner[self.q_index[i]] = i
        self.owner = [int(x) for x in owner]

        # ancestor dof lists per dof (for the CRBA fill): dofs k with
        # amask[body(j)][k] == 1 are exactly the chain dofs root→body(j)
        self.anc_dofs = [
            [k for k in range(self.ndof) if self.amask[self.owner[j], k] > 0.5]
            for j in range(self.ndof)
        ]

        # ---- unified point-jacobian plan: contacts first, then task points
        self._points: list[tuple[int, tuple[float, float, float]]] = []

        def point_slot(link, pt):
            e = (int(link), tuple(float(x) for x in np.asarray(pt)))
            if e not in self._points:
                self._points.append(e)
            return self._points.index(e)

        self.contact_slots = []
        for c in cfg.contacts:
            self.contact_slots.append(point_slot(c.link, c.contact_point))
        self.task_slots = []          # per level: list of (kind, payload, mode)
        self.uses_tot = False
        for level in cfg.task_specs:
            lv = []
            for spec in level:
                mode, link = spec[0], spec[1]
                pt = np.asarray(spec[2], np.float64) if len(spec) > 2 else None
                if link == self.nbody:
                    lv.append(("tot", None, mode))
                    self.uses_tot = True
                elif mode in _COM_FRAME:
                    lv.append(("pt", point_slot(link, self.com[link]), mode))
                elif pt is not None and mode in (
                    T.TASK_LINK_6D_CUSTOM_FRAME, T.TASK_LINK_POSITION_CUSTOM_FRAME,
                    T.TASK_LINK_ROTATION_CUSTOM_FRAME,
                ):
                    lv.append(("pt", point_slot(link, pt), mode))
                else:
                    lv.append(("pt", point_slot(link, (0.0, 0.0, 0.0)), mode))
            self.task_slots.append(lv)
        self.level_tdofs = [
            sum(6 if mode in _SIX else 3 for _, _, mode in lv)
            for lv in self.task_slots
        ]

        # contacts static data
        self.cdof = sum(c.contact_dof for c in cfg.contacts)
        self.cfree = max(self.cdof - 6, 0)
        self.const_blocks = [_np_constraint_block(c) for c in cfg.contacts]
        self.k_rows = sum(b.shape[0] for b in self.const_blocks)
        self.tlim = (None if cfg.torque_limit is None
                     else np.asarray(cfg.torque_limit, np.float64))

        # QP dims per level + redistribution (must mirror
        # pipeline.CompiledTick._level_dims for warm-carry compatibility)
        lim_rows = 2 * self.mdof if self.tlim is not None else 0
        self.qp_dims = [
            (t + self.cfree, lim_rows + self.k_rows) for t in self.level_tdofs
        ]
        if self.cfree > 0:
            self.qp_dims.append((self.cfree, lim_rows + self.k_rows))

    # ----------------------------------------------------------- prestage
    def prestage(self, q):
        """q (nq,)+bt → dict of everything the QP chain + result need.

        Pallas-safe: all static model data enters as Python scalar literals
        (elemlin's *_ds/*_sd/svec helpers) — no captured array constants —
        and structural zeros in axes/transforms/constraint blocks cost
        nothing."""
        dtype = q.dtype
        zero = q[0] * 0.0

        # ---------------- FK (mirror of kin/engine.py::fk)
        x_, y_, z_, w_ = q[3], q[4], q[5], q[self.ndof]
        n2 = x_ * x_ + y_ * y_ + z_ * z_ + w_ * w_
        s = jnp.where(n2 > 0, 2.0 / n2, 0.0)
        xs, ys, zs = x_ * s, y_ * s, z_ * s
        wx, wy, wz = w_ * xs, w_ * ys, w_ * zs
        xx, xy, xz = x_ * xs, x_ * ys, x_ * zs
        yy, yz, zz = y_ * ys, y_ * zs, z_ * zs
        R0 = jnp.stack([
            jnp.stack([1.0 - (yy + zz), xy - wz, xz + wy], axis=0),
            jnp.stack([xy + wz, 1.0 - (xx + zz), yz - wx], axis=0),
            jnp.stack([xz - wy, yz + wx, 1.0 - (xx + yy)], axis=0),
        ], axis=0)
        p0 = q[0:3]

        def rodrigues(a, c_, s_):
            """c·I + s·K + (1-c)aaᵀ with STATIC axis a
            (kin/rotations.py:95-103); zero entries skipped."""
            K = np.array([[0.0, -a[2], a[1]], [a[2], 0.0, -a[0]],
                          [-a[1], a[0], 0.0]])
            aaT = np.outer(a, a)
            omc = 1.0 - c_
            rows = []
            for i in range(3):
                row = []
                for j in range(3):
                    acc = None
                    if i == j:
                        acc = c_
                    if K[i, j] != 0.0:
                        t = s_ * float(K[i, j])
                        acc = t if acc is None else acc + t
                    if aaT[i, j] != 0.0:
                        t = omc * float(aaT[i, j])
                        acc = t if acc is None else acc + t
                    row.append(zero if acc is None else acc)
                rows.append(jnp.stack(row, axis=0))
            return jnp.stack(rows, axis=0)

        R = [R0]
        p = [p0]
        axis_w = [jnp.stack([zero, zero, zero], axis=0)]
        com_w = [p0 + el.mv_ds(R0, self.com[0])]
        for i in range(1, self.nbody):
            par = self.parent[i]
            qi = q[self.q_index[i]]
            Rj = rodrigues(self.axis[i], jnp.cos(qi), jnp.sin(qi))
            Ri = el.mm(R[par], el.mm_sd(self.X_rot[i], Rj))
            pi = p[par] + el.mv_ds(R[par], self.X_trans[i])
            R.append(Ri)
            p.append(pi)
            axis_w.append(el.mv_ds(Ri, self.axis[i]))
            com_w.append(pi + el.mv_ds(Ri, self.com[i]))

        # ---------------- dof frames (kin/engine.py::_dof_frames)
        ax_cols, og_cols = [], []
        for k in range(3):
            e = [0.0, 0.0, 0.0]
            e[k] = 1.0
            ax_cols.append(el.svec(e, zero))
            og_cols.append(p0)
        for k in range(3):
            ax_cols.append(R0[:, k])
            og_cols.append(p0)
        for j in range(6, self.ndof):
            b = self.owner[j]
            ax_cols.append(axis_w[b])
            og_cols.append(p[b])
        ax = jnp.stack(ax_cols, axis=1)                 # (3, ndof)+bt
        og = jnp.stack(og_cols, axis=1)

        # ---------------- point jacobians (one per planned point)
        # base-translation dofs (cols 0:3) are pure linear (jv = axis,
        # jw = 0); every other dof is revolute — handled by column splits
        # instead of an is_trans mask
        mask_cache = {}

        def link_mask(link):
            if link not in mask_cache:
                mask_cache[link] = el.svec(self.amask[link], zero)
            return mask_cache[link]

        J_pts = []
        for link, pt in self._points:
            if any(pt):
                pw = p[link] + el.mv_ds(R[link], np.asarray(pt))
            else:
                pw = p[link]
            rel = pw[:, None] - og                       # (3, ndof)+bt
            jvr = jnp.stack([
                ax[1] * rel[2] - ax[2] * rel[1],
                ax[2] * rel[0] - ax[0] * rel[2],
                ax[0] * rel[1] - ax[1] * rel[0],
            ], axis=0)
            jv = jnp.concatenate([ax[:, 0:3], jvr[:, 3:]], axis=1)
            jw = jnp.concatenate([ax[:, 0:3] * 0.0, ax[:, 3:]], axis=1)
            mask = link_mask(link)[None]
            J_pts.append(jnp.concatenate([jv * mask, jw * mask], axis=0))

        # ---------------- mass matrix: world-origin composite rigid body
        IC = [None] * self.nbody
        for i in range(self.nbody):
            mi = float(self.mass[i])
            if mi == 0.0 and not self.inertia[i].any():
                continue                                  # massless pseudo-body
            Icm = el.mmT(el.mm_ds(R[i], self.inertia[i]), R[i])
            c3 = com_w[i]
            cc = el.dot(c3, c3)
            # I_ang = Icm + m(|c|²I − ccᵀ)
            I_ang = el.diag_add(Icm - mi * el.outer(c3, c3),
                                [mi * cc, mi * cc, mi * cc])
            chat = jnp.stack([
                jnp.stack([zero, -c3[2], c3[1]], axis=0),
                jnp.stack([c3[2], zero, -c3[0]], axis=0),
                jnp.stack([-c3[1], c3[0], zero], axis=0),
            ], axis=0)
            mEye = el.smat(mi * np.eye(3), zero)
            top = jnp.concatenate([I_ang, mi * chat], axis=1)
            bot = jnp.concatenate([-mi * chat, mEye], axis=1)
            IC[i] = jnp.concatenate([top, bot], axis=0)   # (6,6)+bt
        for i in range(self.nbody - 1, 0, -1):
            if IC[i] is None:
                continue
            par = self.parent[i]
            IC[par] = IC[i] if IC[par] is None else IC[par] + IC[i]

        def S_of_dof(j):
            if j < 3:
                e = [0.0] * 6
                e[3 + j] = 1.0
                return el.svec(e, zero)
            a3 = ax[:, j]
            o3 = og[:, j]
            return jnp.concatenate([a3, el.cross(o3, a3)], axis=0)

        S = [S_of_dof(j) for j in range(self.ndof)]
        A_entries = {}
        for j in range(self.ndof):
            if IC[self.owner[j]] is None:
                continue                                  # massless subtree
            f = el.mv(IC[self.owner[j]], S[j])           # (6,)+bt
            for i in self.anc_dofs[j]:
                if i <= j:
                    A_entries[(i, j)] = el.dot(S[i], f)
        rows = []
        for i in range(self.ndof):
            row = []
            for j in range(self.ndof):
                e = A_entries.get((min(i, j), max(i, j)))
                row.append(zero if e is None else e)
            rows.append(jnp.stack(row, axis=0))
        A = jnp.stack(rows, axis=0)                      # (ndof, ndof)+bt

        # gravity vector: G = −A[0:3,:]ᵀ g  (see module docstring)
        G = None
        for i in range(3):
            gi = float(self.gravity[i])
            if gi == 0.0:
                continue
            t = A[i] * (-gi)
            G = t if G is None else G + t

        A_inv = el.psd_inverse(A)

        out = dict(health=None)

        # Jcom_total rows (only when a task targets the virtual COM link)
        if self.uses_tot:
            M = self.total_mass
            skm = el.mm(R0, A[3:6, 0:3]) / M
            cfb = jnp.stack([skm[2, 1], skm[0, 2], skm[1, 0]], axis=0)
            cfb_hat = jnp.stack([
                jnp.stack([zero, -cfb[2], cfb[1]], axis=0),
                jnp.stack([cfb[2], zero, -cfb[0]], axis=0),
                jnp.stack([-cfb[1], cfb[0], zero], axis=0),
            ], axis=0)
            CMM_bot = (el.mm(el.transpose(cfb_hat), A[0:3])
                       + el.mm(R0, A[3:6]))
            com_inertia = (el.mm(el.mm(R0, A[3:6, 3:6]), el.transpose(R0))
                           - M * el.mm(cfb_hat, el.transpose(cfb_hat)))
            # solve com_inertia X = CMM_bot (SPD 3×3, chol fwd/back subst)
            Lci = el.chol(com_inertia)
            y = el.solve_lower(Lci, CMM_bot)
            U = el.transpose(Lci)
            xs = [None] * 3
            for i2 in reversed(range(3)):
                acc = y[i2]
                for k2 in range(i2 + 1, 3):
                    acc = acc - U[i2, k2][None] * xs[k2]
                xs[i2] = acc / U[i2, i2][None]
            Jt_bot = jnp.stack(xs, axis=0)
            out["Jcom_total"] = jnp.concatenate([A[0:3] / M, Jt_bot], axis=0)

        # ---------------- contact jacobian rows (per type)
        Jc_rows = []
        for slot, c in zip(self.contact_slots, self.cfg.contacts):
            J6 = J_pts[slot]
            if c.contact_type == T.CONTACT_6D:
                Jc_rows.append(J6)
            elif c.contact_type == T.CONTACT_POINT:
                Jc_rows.append(J6[0:3])
            else:  # CONTACT_LINE
                Jloc = el.mm(el.transpose(R[c.link]), J6[3:6])
                Jc_rows.append(jnp.concatenate([J6[0:3], Jloc[1:3]], axis=0))
        J_C = jnp.concatenate(Jc_rows, axis=0)           # (cdof, ndof)+bt

        # ---------------- contact space (wbc/dynamics.py::contact_space)
        JAinv = el.mm(J_C, A_inv)
        Mc = el.mmT(JAinv, J_C)
        Mc = 0.5 * (Mc + el.transpose(Mc))
        health = jnp.minimum(
            el.chol_health(Mc),
            el.chol_health(el.mTm(J_C[:, 0:6], J_C[:, 0:6])),
        )
        Lambda_c = el.psd_inverse(Mc)
        Jbar = el.mm(Lambda_c, JAinv)                    # J̄_cᵀ (cdof, ndof)+bt
        P_C = el.mv(Jbar, G)
        NCG = G - el.mTv(J_C, P_C)

        Wfree = (A_inv[6:, 6:]
                 - el.mTm(JAinv[:, 6:], Jbar[:, 6:]))
        Wfree = 0.5 * (Wfree + el.transpose(Wfree))

        if self.cfree > 0:
            Ny = el.complete_basis(J_C[:, 0:6])[:, 6:]   # (cdof, cfree)+bt
            V2T = el.qr_thin(el.mTm(J_C[:, 6:], Ny))     # (mdof, cfree)+bt
            VVt = el.mmT(V2T, V2T)
            W_inv = el.psd_inverse(Wfree + VVt) - VVt
            NwJw = el.mm(V2T, el.qr_pinv(el.mm(Jbar[0:self.cfree, 6:], V2T)))
        else:
            W_inv = el.psd_inverse(Wfree)
            NwJw = None

        torque_grav = el.mv(W_inv, el.mv(A_inv[6:], NCG))

        # ---------------- per-level JKT + Ntorque (dynamics.task_jkt)
        Ntorques = []
        prev_null = None                                  # None == identity
        for lv, slots in enumerate(self.task_slots):
            trows = []
            for kind, payload, mode in slots:
                J6 = out["Jcom_total"] if kind == "tot" else J_pts[payload]
                if mode in _SIX:
                    trows.append(J6)
                elif mode in _POS:
                    trows.append(J6[0:3])
                else:
                    trows.append(J6[3:6])
            J_task = jnp.concatenate(trows, axis=0)       # (t, ndof)+bt
            JtA = el.mm(J_task, A_inv)
            JAN = JtA - el.mm(el.mmT(JtA, J_C), Jbar)
            Mt = el.mmT(JAN, J_task)
            Lam = el.psd_inverse(0.5 * (Mt + el.transpose(Mt)))
            Q = el.mm(Lam, JAN)[:, 6:]                    # (t, mdof)+bt
            WQt = el.mmT(W_inv, Q)                        # (mdof, t)+bt
            QWQ = el.mm(Q, WQt)
            inv_mid = el.psd_inverse(0.5 * (QWQ + el.transpose(QWQ)))
            J_kt = el.mm(WQt, inv_mid)
            JktLam = el.mm(J_kt, Lam)
            Ntorques.append(JktLam if prev_null is None
                            else el.mm(prev_null, JktLam))
            if lv < len(self.task_slots) - 1:
                term = el.mm(J_kt, Q)                     # (mdof, mdof)+bt
                nn = el.eye(self.mdof, zero) - term
                prev_null = nn if prev_null is None else el.mm(prev_null, nn)

        # ---------------- constraint prep: CM blocks, Atemp, bA0
        CM_blocks = []
        for c, blk in zip(self.cfg.contacts, self.const_blocks):
            RT = el.transpose(R[c.link])
            if c.contact_type == T.CONTACT_6D:
                # A_rot = RT ⊕ RT; CM_i = blk @ A_rot: split columns
                CMi = jnp.concatenate(
                    [el.mm_sd(blk[:, 0:3], RT), el.mm_sd(blk[:, 3:6], RT)],
                    axis=1,
                )
            elif c.contact_type == T.CONTACT_POINT:
                CMi = el.mm_sd(blk, RT)
            else:  # LINE: A_rot = RT ⊕ I₂ — moment columns pass through
                CMi = jnp.concatenate(
                    [el.mm_sd(blk[:, 0:3], RT), el.smat(blk[:, 3:5], zero)],
                    axis=1,
                )
            CM_blocks.append(CMi)
        Atemp_rows, bA0_rows = [], []
        r = 0
        for c, CMi in zip(self.cfg.contacts, CM_blocks):
            dd = c.contact_dof
            Atemp_rows.append(el.mm(CMi, Jbar[r:r + dd, 6:]))
            bA0_rows.append(el.mv(CMi, P_C[r:r + dd]))
            r += dd
        Atemp = jnp.concatenate(Atemp_rows, axis=0)       # (k_rows, mdof)+bt
        bA0 = jnp.concatenate(bA0_rows, axis=0)           # (k_rows,)+bt

        out.update(
            torque_grav=torque_grav,
            P_C=P_C,
            Jbar_act=Jbar[:, 6:],
            NwJw=NwJw,
            Ntorques=Ntorques,
            Atemp=Atemp,
            bA0=bA0,
            health=health,
        )
        return out

    # ------------------------------------------------------------ the IPM
    def _ipm(self, Hdiag, C, d, iters, warm, mirror):
        """One-sided QP min ½xᵀdiag(Hdiag)x s.t. Cx ≤ d (g = 0 — every tick
        QP has a zero linear term).  C is the STORED rows [B; D] with the
        mirrored −B block folded (ops/pallas_qp.py semantics).  Returns
        (x, s, lam, gap, pres)."""
        dtype = C.dtype
        f32 = dtype == jnp.float32
        n = C.shape[1]
        me = C.shape[0]
        mr = mirror
        m = me + mr
        ridge = 1e-6 if f32 else 1e-9
        s_floor = 1e-10 if f32 else 1e-14
        w_cap = 1e8 if f32 else 1e12
        mu_tol = 5e-8 if f32 else 1e-13

        def matvec_C(x):
            acc = jnp.sum(C * x[None], axis=1)            # (me,)+bt
            if mr == 0:
                return acc
            return jnp.concatenate([acc[:mr], -acc[:mr], acc[mr:]], axis=0)

        def _fold(v, sign):
            if mr == 0:
                return v
            head = v[:mr] + sign * v[mr:2 * mr]
            return jnp.concatenate([head, v[2 * mr:]], axis=0)

        def matvec_CT(v):
            veff = _fold(v, -1.0)
            return jnp.sum(C * veff[:, None], axis=0)

        def matvec_H(x):
            return jnp.stack(
                [(Hdiag[i] + ridge) * x[i] for i in range(n)], axis=0
            )

        def gram(w):
            Cw = C * _fold(w, 1.0)[:, None]
            K = {}
            for i in range(n):
                for j in range(i + 1):
                    K[(i, j)] = jnp.sum(Cw[:, i] * C[:, j], axis=0)
                K[(i, i)] = K[(i, i)] + (Hdiag[i] + ridge)
            return K

        def chol_d(K):
            S = dict(K)
            cols, inv_diag = [], []
            for j in range(n):
                dj = jnp.sqrt(jnp.maximum(S[(j, j)], 1e-30))
                inv_d = 1.0 / dj
                col = [None] * n
                col[j] = dj
                for i in range(j + 1, n):
                    col[i] = S[(i, j)] * inv_d
                cols.append(col)
                inv_diag.append(inv_d)
                for i in range(j + 1, n):
                    for k in range(j + 1, i + 1):
                        S[(i, k)] = S[(i, k)] - col[i] * col[k]
            return cols, inv_diag

        def cho_solve_vec(Lc, inv_diag, b):
            y = [None] * n
            for i in range(n):
                acc = b[i]
                for k in range(i):
                    acc = acc - Lc[k][i] * y[k]
                y[i] = acc * inv_diag[i]
            x = [None] * n
            for i in reversed(range(n)):
                acc = y[i]
                for k in range(i + 1, n):
                    acc = acc - Lc[i][k] * x[k]
                x[i] = acc * inv_diag[i]
            return jnp.stack(x, axis=0)

        def factor(x, s_, lam):
            s_safe = jnp.maximum(s_, s_floor)
            inv_s = 1.0 / s_safe
            r_d = matvec_H(x) + matvec_CT(lam)
            r_p = matvec_C(x) + s_ - d
            w = jnp.clip(lam * inv_s, 0.0, w_cap)
            Lc, inv_diag = chol_d(gram(w))
            return inv_s, r_d, r_p, w, Lc, inv_diag

        def newton(fac, s_, lam, sigma_mu):
            inv_s, r_d, r_p, w, Lc, inv_diag = fac
            r_c = s_ * lam - sigma_mu
            rhs = -r_d - matvec_CT(w * r_p - r_c * inv_s)
            dx = cho_solve_vec(Lc, inv_diag, rhs)
            ds = -(r_p + matvec_C(dx))
            dlam = -(r_c + lam * ds) * inv_s
            return dx, ds, dlam

        def alpha_max(v, dv):
            ratio = jnp.where(dv < 0, -v / jnp.where(dv < 0, dv, -1.0), 1e20)
            return jnp.minimum(1.0, 0.995 * jnp.min(ratio, axis=0))

        if warm is not None:
            x0, lam0_in = warm
            s0 = jnp.maximum(d - matvec_C(x0), 1e-4)
            lam0 = jnp.maximum(lam0_in, 1e-4)
        else:
            x0 = jnp.zeros((n,) + d.shape[1:], dtype)
            s0 = jnp.maximum(d, 1.0)
            lam0 = jnp.ones_like(d)

        def body(_, carry):
            x, s_, lam = carry
            mu = jnp.sum(s_ * lam, axis=0) / m
            live = (mu > mu_tol).astype(dtype)
            fac = factor(x, s_, lam)
            dx_a, ds_a, dlam_a = newton(fac, s_, lam, jnp.zeros_like(s_))
            a_p = alpha_max(s_, ds_a)
            a_d = alpha_max(lam, dlam_a)
            mu_aff = jnp.sum(
                (s_ + a_p[None] * ds_a) * (lam + a_d[None] * dlam_a), axis=0
            ) / m
            sigma = (mu_aff / jnp.maximum(mu, 1e-30)) ** 3
            target = sigma[None] * mu[None] - ds_a * dlam_a
            dx, ds, dlam = newton(fac, s_, lam, target)
            if warm is not None:
                a_pc = live * alpha_max(s_, ds)
                a_dc = live * alpha_max(lam, dlam)
            else:
                a_pc = live * jnp.minimum(alpha_max(s_, ds), alpha_max(lam, dlam))
                a_dc = a_pc
            ok = jnp.sum(dx * 0.0, axis=0) == 0.0
            return (
                jnp.where(ok, x + a_pc[None] * dx, x),
                jnp.where(ok, s_ + a_pc[None] * ds, s_),
                jnp.where(ok, lam + a_dc[None] * dlam, lam),
            )

        x, s_, lam = jax.lax.fori_loop(0, iters, body, (x0, s0, lam0))
        slack = d - matvec_C(x)
        pres = jnp.max(jnp.maximum(-slack, 0.0), axis=0)
        gap = jnp.abs(jnp.sum(slack * lam, axis=0)) / m
        return x, s_, lam, gap, pres

    # ----------------------------------------------------------- QP chain
    def qpchain(self, pre, fstars, warm=None, iters=25):
        """The interleaved per-level QPs + torque accumulation
        (CalcTaskControlTorque + CalcContactRedistribute,
        src/dwbc.cpp:818-873/1372-1620).  warm: list of (x, lam) per QP in
        elem-leading layout, or None (cold)."""
        dtype = pre["torque_grav"].dtype
        tg = pre["torque_grav"]
        NwJw = pre["NwJw"]
        Atemp = pre["Atemp"]
        bA0 = pre["bA0"]
        mdof = self.mdof
        use_lim = self.tlim is not None
        mirror = mdof if use_lim else 0
        tlim = el.svec(self.tlim, tg[0] * 0.0) if use_lim else None

        tau_task = jnp.zeros_like(tg)
        tau_contact = jnp.zeros_like(tg)
        gap = jnp.zeros_like(tg[0])
        pres = jnp.zeros_like(tg[0])
        warm_out = []

        nlev = len(self.task_slots)
        for h in range(nlev):
            Nt = pre["Ntorques"][h]                       # (mdof, t)+bt
            t = Nt.shape[1]
            if NwJw is not None:
                blk = jnp.concatenate([Nt, NwJw], axis=1)  # (mdof, nv)+bt
            else:
                blk = Nt
            nv = blk.shape[1]
            D = -el.mm(Atemp, blk)                         # (k, nv)+bt
            tau_base = tg + tau_task + el.mv(Nt, fstars[h])
            ub_c = el.mv(Atemp, tau_base) - bA0
            if use_lim:
                Cs = jnp.concatenate([blk, D], axis=0)
                d = jnp.concatenate(
                    [tlim - tau_base, tlim + tau_base, ub_c], axis=0
                )
            else:
                Cs = D
                d = ub_c
            Hdiag = tuple([1.0] * t + [0.0] * (nv - t))
            x, s_, lam, g_, p_ = self._ipm(
                Hdiag, Cs, d, iters,
                None if warm is None else warm[h], mirror,
            )
            warm_out.append((x, lam))
            tau_task = tau_task + el.mv(Nt, fstars[h] + x[:t])
            if NwJw is not None:
                tau_contact = el.mv(NwJw, x[t:])
            gap = jnp.maximum(gap, g_)
            pres = jnp.maximum(pres, p_)

        if NwJw is not None:
            tau_input = tg + tau_task + tau_contact
            D = -el.mm(Atemp, NwJw)
            ub_c = el.mv(Atemp, tau_input) - bA0
            if use_lim:
                Cs = jnp.concatenate([NwJw, D], axis=0)
                d = jnp.concatenate(
                    [tlim - tau_input, tlim + tau_input, ub_c], axis=0
                )
            else:
                Cs = D
                d = ub_c
            Hdiag = tuple([1.0] * self.cfree)
            x, s_, lam, g_, p_ = self._ipm(
                Hdiag, Cs, d, iters,
                None if warm is None else warm[nlev], mirror,
            )
            warm_out.append((x, lam))
            tau_contact = tau_contact + el.mv(NwJw, x)
            gap = jnp.maximum(gap, g_)
            pres = jnp.maximum(pres, p_)

        tau_cmd = tg + tau_task + tau_contact
        cforce = el.mv(pre["Jbar_act"], tau_cmd) - pre["P_C"]
        return dict(
            torque_grav=tg,
            torque_task=tau_task,
            torque_contact=tau_contact,
            torque_cmd=tau_cmd,
            contact_force=cforce,
            qp_gap=gap,
            qp_primal_res=pres,
            health=pre["health"],
            warm_out=tuple(warm_out),
        )

    def tick(self, q, fstars, warm=None, iters=25):
        """Full fused tick, element-leading: q (nq,)+bt → result dict."""
        pre = self.prestage(q)
        return self.qpchain(pre, fstars, warm=warm, iters=iters)
