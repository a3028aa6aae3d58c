"""Sub-stage TPU profiling of the fused tick (chained-scan method).

Times nested prefixes of the tick at batch B so each stage's cost is the
delta to the previous line:
  kin     — full kinematics update (FK+vel+jacobians+CRBA+A⁻¹+bias+CMM)
  contact — + contact jacobian + contact-space factorization
  pre_qp  — + gravity comp + both task JKTs
  full    — the real warm tick (pre_qp + 2 task QPs + redistribution QP,
            qp_iters=DWBC_BENCH_WARM_ITERS)

Methodology is bench.py's: K ticks chained on device inside one lax.scan
with a data-dependent carry; tunnel RTT measured and subtracted; per-tick
cost = (wall − RTT)/K.  Prints one JSON line per stage as it completes.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
        )
    except Exception:
        pass

    import __graft_entry__ as ge
    from libdwbc_tpu.wbc import dynamics as dyn

    model, tick = ge._model_and_tick(qp_iters=12)
    q, qd, fstars = ge._example_inputs(model)

    import bench as _b

    rtt = _b._rtt(jax, jnp)
    WARM_ITERS = int(os.environ.get("DWBC_BENCH_WARM_ITERS", "7"))

    B = 1024
    K = 16
    rng = np.random.default_rng(0)
    qs = np.tile(q, (B, 1)).astype(np.float32)
    qs[:, 6:39] += 0.02 * rng.standard_normal((B, 33)).astype(np.float32)
    qds = np.zeros((B, model.ndof), dtype=np.float32)
    fs = tuple(
        jax.device_put(np.tile(f, (B, 1)).astype(np.float32)) for f in fstars
    )

    def kin(qq, qqd):
        st = tick.kin.update(qq, qqd)
        return st.A_inv[..., 0, :3] + st.B[..., :3] + st.G[..., :3]

    def contact(qq, qqd):
        st = tick.kin.update(qq, qqd)
        J_C = tick._contact_jacobian_from_state(st)
        cs = dyn.contact_space(J_C, st.A_inv)
        return cs.W_inv[..., 0, :3] + cs.NwJw[..., 0, :3] + cs.N_C[..., 0, :3]

    def pre_qp(qq, qqd):
        st = tick.kin.update(qq, qqd)
        J_C = tick._contact_jacobian_from_state(st)
        cs = dyn.contact_space(J_C, st.A_inv)
        tg, P_C = dyn.gravity_compensation(
            st.A_inv, cs.W_inv, cs.N_C, cs.J_C_INV_T, st.G
        )
        out = tg[..., :3]
        fk = tick._fk_from_state(st)
        for h in range(len(tick.cfg.task_specs)):
            J_task = tick._task_jacobian(st, fk, h)
            tf = dyn.task_jkt(J_task, st.A_inv, cs.N_C, cs.W_inv)
            out = out + (tf.J_kt @ tf.Lambda_task)[..., :3, 0]
        return out

    def chain(f):
        @jax.jit
        def run(qq, qqd):
            def body(c, _):
                out = f(c, qqd)
                c2 = c.at[..., 6:9].add(1e-6 * jnp.tanh(out[..., :3]))
                return c2, ()
            c, _ = jax.lax.scan(body, qq, None, length=K)
            return c
        return run

    @jax.jit
    def full(qq, qqd):
        warm0 = tick.init_warm((qq.shape[0],))
        res0, warm = tick._tick_impl(qq, qqd, fs, warm=warm0, qp_iters=12)
        q1 = qq.at[:, 6:9].add(1e-6 * jnp.tanh(res0.torque_cmd[..., :3]))

        def body(c, _):
            cq, w = c
            res, w = tick._tick_impl(cq, qqd, fs, warm=w, qp_iters=WARM_ITERS)
            cq = cq.at[:, 6:9].add(1e-6 * jnp.tanh(res.torque_cmd[..., :3]))
            return (cq, w), ()

        (cq, _), _ = jax.lax.scan(body, (q1, warm), None, length=K)
        return cq

    q_d = jax.device_put(qs)
    qd_d = jax.device_put(qds)
    out = {}
    prev = 0.0
    for name, g in [
        ("kin", chain(kin)), ("contact", chain(contact)),
        ("pre_qp", chain(pre_qp)), ("full", full),
    ]:
        r = g(q_d, qd_d)
        float(jnp.sum(r))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = g(q_d, qd_d)
            float(jnp.sum(r))
            ts.append(time.perf_counter() - t0)
        dt = float(np.median(ts))
        ms = max(dt - rtt, 0.0) / K * 1e3
        out[name] = round(ms, 3)
        print(json.dumps({name: out[name], "delta_ms": round(ms - prev, 3)}),
              flush=True)
        prev = ms
    out["rtt_ms"] = round(rtt * 1e3, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
