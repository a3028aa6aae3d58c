"""FusedTick: the whole WBC tick as Pallas megakernel launches.

Drop-in for pipeline.CompiledTick on the serving path (same _tick_impl /
init_warm interface, same warm-state pytree shapes), with the entire tick —
FK, jacobians, world-frame CRBA, A⁻¹, contact space, JKT, constraint
assembly, and all QPs — executed inside ONE Pallas kernel per 1024-scenario
tile (ops/tick_kernel.py holds the math; this module holds the plumbing).

Why: the XLA tick is glue-bound — at batch 1024 its pre-QP stages cost
~4.7 ms of HBM-round-tripping small ops while the QPs themselves cost
~0.25 ms (PERF.md r02 prestage profile).  Inside the kernel every
intermediate lives in VMEM/registers and every op is a full-width VPU op
over 1024 lanes.

Backend selection: 'pallas' on TPU f32 (the serving shape); 'xla' runs the
IDENTICAL element-leading program as a plain XLA graph — the CPU/f64 path
used by the parity tests, and the fallback wherever Mosaic is unavailable.

Reference: the per-tick call sequence at /root/reference/src/dwbc.cpp
(SURVEY.md §3.1); golden/cross-formulation parity in
tests/test_fused_tick.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..model.compile import RobotModel
from ..ops.tick_kernel import SERVO_ELEM_SHAPES, TickProgram
from .pipeline import PipelineConfig, TickResult, qp_error_flag

TILE = 8 * 128


def _to_tiles(a, Bp):
    """batch-major (B, el...) → element-leading tiles (el..., R, 128).
    Pads B→Bp with edge replication (padded lanes must stay numerically
    valid: FK of an all-zero q would produce NaNs)."""
    B = a.shape[0]
    lead = a.shape[1:]
    if Bp != B:
        a = jnp.concatenate(
            [a, jnp.broadcast_to(a[-1:], (Bp - B,) + lead)], axis=0
        )
    R = Bp // 128
    return jnp.moveaxis(a.reshape((R, 128) + lead), (0, 1), (-2, -1))


def _from_tiles(a, B):
    """(el..., R, 128) → (B, el...)."""
    lead = a.shape[:-2]
    nd = len(lead)
    a = jnp.moveaxis(a, (-2, -1), (0, 1))
    return a.reshape((-1,) + lead)[:B]


def _spec(lead):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L = len(lead)
    return pl.BlockSpec(
        tuple(lead) + (8, 128),
        (lambda i, L=L: (0,) * L + (i, 0)),
        memory_space=pltpu.VMEM,
    )


class FusedTick:
    """One fused-kernel WBC tick for a fixed configuration.

    API mirrors CompiledTick: __call__(q, qdot, fstars, servos=),
    _tick_impl(..., warm=, qp_iters=, servos=), init_warm(batch).

    servos: the on-device trajectory-PD servo runs INSIDE the fused kernel
    (tick_kernel.py::_servo_fstar_el; 1e-10 parity vs CompiledTick in
    tests/test_fused_servo.py).  qdot feeds the servo'd task links' point
    velocities; without servos it is accepted for interface parity and
    unused — the tick compensates gravity, not Coriolis, exactly like the
    reference's grav+task+contact sum (src/pybind/rl_wbc_bridge.cpp:131-139).
    """

    def __init__(self, model: RobotModel, cfg: PipelineConfig,
                 dtype=jnp.float32, backend: str = "auto",
                 vmem_limit_mb: int = 100, masked: bool = False):
        self.model = model
        self.cfg = cfg
        self.dtype = dtype
        self.masked = masked
        self.prog = TickProgram(model, cfg, dtype, masked=masked)
        self.vmem_limit_mb = vmem_limit_mb
        if backend == "auto":
            try:
                backend = "pallas" if (
                    jax.default_backend() == "tpu" and dtype == jnp.float32
                ) else "xla"
            except Exception:
                backend = "xla"
        self.backend = backend
        self._tick = jax.jit(self._tick_impl, static_argnames=("qp_iters",))

    # ------------------------------------------------------------- warm
    def _level_dims(self):
        return self.prog.qp_dims

    def init_warm(self, batch=()):
        """Same pytree/shape contract as CompiledTick.init_warm."""
        return tuple(
            (jnp.zeros(batch + (nv,), self.dtype),
             jnp.ones(batch + (rows,), self.dtype))
            for nv, rows in self.prog.qp_dims
        )

    # ------------------------------------------------------------- tick
    def _tick_impl(self, q, qdot, fstars, contact_mask=None, warm=None,
                   qp_iters=None, servos=None):
        """Masked mode takes contact_mask as the 4th positional argument —
        the MaskedTick._tick_impl signature, so make_control_loop and the
        hypothesis sweeps drive either class.  servos: CompiledTick's
        nested per-level/per-spec ServoParams pytree — the on-device
        trajectory-PD servo runs INSIDE the fused kernel."""
        assert (contact_mask is not None) == self.masked
        iters = self.cfg.qp_iters if qp_iters is None else qp_iters
        q = jnp.asarray(q, self.dtype)
        qdot = jnp.asarray(qdot, self.dtype)
        fstars = tuple(jnp.asarray(f, self.dtype) for f in fstars)
        batched = q.ndim == 2
        cmask = None
        if self.masked:
            cmask = jnp.asarray(contact_mask, self.dtype)
            if batched and cmask.ndim == 1:
                cmask = jnp.broadcast_to(cmask, (q.shape[0],) + cmask.shape)
        if not batched:
            q = q[None]
            qdot = qdot[None]
            fstars = tuple(f[None] for f in fstars)
            if cmask is not None:
                cmask = cmask[None]
            if warm is not None:
                warm = tuple((x[None], l[None]) for x, l in warm)
        B = q.shape[0]

        if self.backend == "pallas":
            out = self._run_pallas(q, fstars, warm, iters, B, cmask,
                                   qdot=qdot, servos=servos)
        else:
            out = self._run_xla(q, fstars, warm, iters, cmask,
                                qdot=qdot, servos=servos)

        result = TickResult(
            torque_grav=out["torque_grav"],
            torque_task=out["torque_task"],
            torque_contact=out["torque_contact"],
            torque_cmd=out["torque_cmd"],
            contact_force=out["contact_force"],
            qp_gap=out["qp_gap"],
            qp_primal_res=out["qp_primal_res"],
            contact_rank_health=out["health"],
            qp_error=qp_error_flag(
                out["qp_gap"], out["qp_primal_res"], out["torque_cmd"],
                self.cfg,
            ),
        )
        if not batched:
            result = TickResult(*(r[0] for r in result))
            if warm is not None:
                wout = tuple((x[0], l[0]) for x, l in out["warm_out"])
                return result, wout
            return result
        if warm is not None:
            return result, out["warm_out"]
        return result

    # ------------------------------------------------------------ servos
    def _servo_fields(self, sp, B):
        """ServoParams → dict of batched (B, elem...) arrays."""
        d = {}
        for f in sp._fields:
            leaf = jnp.asarray(getattr(sp, f), self.dtype)
            es = SERVO_ELEM_SHAPES[f]
            if leaf.ndim == len(es):
                leaf = jnp.broadcast_to(leaf, (B,) + es)
            d[f] = leaf
        return d

    def _servos_batched(self, servos, B):
        """Nested pytree → per-level tuple of per-spec dict-or-None."""
        if servos is None:
            return None
        out = []
        for h, slots in enumerate(self.prog.task_slots):
            lvl = servos[h] if h < len(servos) else None
            if lvl is None:
                out.append(None)
                continue
            out.append(tuple(
                None if sp is None else self._servo_fields(sp, B)
                for sp in lvl
            ))
        return tuple(out)

    # -------------------------------------------------- XLA (CPU / f64)
    def _run_xla(self, q, fstars, warm, iters, cmask=None, qdot=None,
                 servos=None):
        q_el = jnp.moveaxis(q, 0, -1)
        fs_el = tuple(jnp.moveaxis(f, 0, -1) for f in fstars)
        cm_el = None if cmask is None else jnp.moveaxis(cmask, 0, -1)
        qd_el = None if qdot is None else jnp.moveaxis(qdot, 0, -1)
        sv_el = None
        if servos is not None:
            sv_b = self._servos_batched(servos, q.shape[0])
            sv_el = tuple(
                None if lvl is None else tuple(
                    None if d is None
                    else {k: jnp.moveaxis(v, 0, -1) for k, v in d.items()}
                    for d in lvl
                )
                for lvl in sv_b
            )
        w_el = None
        if warm is not None:
            w_el = tuple(
                (jnp.moveaxis(x, 0, -1), jnp.moveaxis(l, 0, -1))
                for x, l in warm
            )
        out = self.prog.tick(q_el, fs_el, warm=w_el, iters=iters, cmask=cm_el,
                             qdot=qd_el, servos=sv_el)
        res = {
            k: jnp.moveaxis(out[k], -1, 0)
            for k in ("torque_grav", "torque_task", "torque_contact",
                      "torque_cmd", "contact_force")
        }
        res["qp_gap"] = out["qp_gap"]
        res["qp_primal_res"] = out["qp_primal_res"]
        res["health"] = out["health"]
        res["warm_out"] = tuple(
            (jnp.moveaxis(x, -1, 0), jnp.moveaxis(l, -1, 0))
            for x, l in out["warm_out"]
        )
        return res

    # ------------------------------------------------------ Pallas (TPU)
    def _run_pallas(self, q, fstars, warm, iters, B, cmask=None, qdot=None,
                    servos=None):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        prog = self.prog
        Bp = ((B + TILE - 1) // TILE) * TILE
        R = Bp // 128
        G = Bp // TILE
        mdof = prog.mdof
        cdof = prog.cdof

        ins = [_to_tiles(q, Bp)]
        in_specs = [_spec((q.shape[1],))]
        for f in fstars:
            ins.append(_to_tiles(f, Bp))
            in_specs.append(_spec((f.shape[1],)))
        use_mask = cmask is not None
        if use_mask:
            ins.append(_to_tiles(cmask, Bp))
            in_specs.append(_spec((cmask.shape[1],)))
        use_servo = servos is not None
        servo_layout = []
        if use_servo:
            ins.append(_to_tiles(qdot, Bp))
            in_specs.append(_spec((qdot.shape[1],)))
            sv_b = self._servos_batched(servos, B)
            for h, lvl in enumerate(sv_b):
                if lvl is None:
                    continue
                for j, d in enumerate(lvl):
                    if d is None:
                        continue
                    for fname in sorted(d):
                        es = SERVO_ELEM_SHAPES[fname]
                        ins.append(_to_tiles(d[fname], Bp))
                        in_specs.append(_spec(es))
                        servo_layout.append((h, j, fname))
        use_warm = warm is not None
        if use_warm:
            for (x, l), (nv, rows) in zip(warm, prog.qp_dims):
                ins.append(_to_tiles(x, Bp))
                in_specs.append(_spec((nv,)))
                ins.append(_to_tiles(l, Bp))
                in_specs.append(_spec((rows,)))

        nlev = len(prog.task_slots)
        out_defs = [
            ("torque_grav", (mdof,)), ("torque_task", (mdof,)),
            ("torque_contact", (mdof,)), ("torque_cmd", (mdof,)),
            ("contact_force", (cdof,)), ("qp_gap", ()),
            ("qp_primal_res", ()), ("health", ()),
        ]
        warm_out_defs = [dims for dims in prog.qp_dims]

        def kernel(*refs):
            nin = len(ins)
            in_refs = refs[:nin]
            out_refs = refs[nin:]
            q_el = in_refs[0][:]
            fs_el = tuple(in_refs[1 + i][:] for i in range(len(fstars)))
            base = 1 + len(fstars)
            cm_el = None
            if use_mask:
                cm_el = in_refs[base][:]
                base += 1
            qd_el = None
            sv_el = None
            if use_servo:
                qd_el = in_refs[base][:]
                base += 1
                sv_dicts = {}
                for (h, j, fname) in servo_layout:
                    sv_dicts.setdefault((h, j), {})[fname] = in_refs[base][:]
                    base += 1
                sv_el = tuple(
                    tuple(
                        sv_dicts.get((h, j))
                        for j in range(len(prog.task_slots[h]))
                    ) if any((h, j) in sv_dicts
                             for j in range(len(prog.task_slots[h])))
                    else None
                    for h in range(len(prog.task_slots))
                )
            w_el = None
            if use_warm:
                w_el = []
                for i in range(len(prog.qp_dims)):
                    w_el.append(
                        (in_refs[base + 2 * i][:], in_refs[base + 2 * i + 1][:])
                    )
            out = prog.tick(q_el, fs_el, warm=w_el, iters=iters, cmask=cm_el,
                            qdot=qd_el, servos=sv_el)
            k = 0
            for name, lead in out_defs:
                out_refs[k][:] = out[name]
                k += 1
            for i, (nv, rows) in enumerate(warm_out_defs):
                out_refs[k][:] = out["warm_out"][i][0]
                out_refs[k + 1][:] = out["warm_out"][i][1]
                k += 2

        out_shape = [
            jax.ShapeDtypeStruct(tuple(lead) + (R, 128), self.dtype)
            for _, lead in out_defs
        ] + [
            s
            for nv, rows in warm_out_defs
            for s in (jax.ShapeDtypeStruct((nv, R, 128), self.dtype),
                      jax.ShapeDtypeStruct((rows, R, 128), self.dtype))
        ]
        out_specs = [_spec(lead) for _, lead in out_defs] + [
            s
            for nv, rows in warm_out_defs
            for s in (_spec((nv,)), _spec((rows,)))
        ]

        outs = pl.pallas_call(
            kernel,
            grid=(G,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=self.vmem_limit_mb * 1024 * 1024,
            ),
        )(*ins)

        res = {}
        for (name, lead), o in zip(out_defs, outs):
            res[name] = _from_tiles(o, B)
        wouts = outs[len(out_defs):]
        res["warm_out"] = tuple(
            (_from_tiles(wouts[2 * i], B), _from_tiles(wouts[2 * i + 1], B))
            for i in range(len(warm_out_defs))
        )
        return res

    # ---------------------------------------------------------- calling
    def __call__(self, q, qdot, fstars, contact_mask=None, servos=None) -> TickResult:
        return self._tick(q, qdot, fstars, contact_mask=contact_mask,
                          servos=servos)

    def batched(self):
        return jax.jit(self._tick_impl, static_argnames=("qp_iters",))
