"""Stage-level TPU profiling of the fused tick (chained-scan methodology).

Times three graphs at batch B with K-chained on-device repetitions each:
  pre_qp   — kinematics + contact space + gravity + both task JKTs (no QP)
  qp_only  — the three in-tick QP solves on frozen matrices
  full     — the complete tick

Each is measured as (wall − RTT)/K like bench.py, so tunnel latency drops
out.  Prints one JSON line per stage.
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
    from libdwbc_tpu.kin.engine import FK
    from libdwbc_tpu.wbc import dynamics as dyn

    model, tick = ge._model_and_tick(qp_iters=12)
    q, qd, fstars = ge._example_inputs(model)

    import bench as _b

    rtt = _b._rtt(jax, jnp)

    B = 1024
    K = 4
    rng = np.random.default_rng(0)
    qs = np.tile(q, (B, 1)).astype(np.float32)
    qs[:, 6:39] += 0.02 * rng.standard_normal((B, 33)).astype(np.float32)
    qds = np.zeros((B, model.ndof), dtype=np.float32)
    fs = tuple(
        np.tile(f, (B, 1)).astype(np.float32)
        + 0.05 * rng.standard_normal((B, f.shape[0])).astype(np.float32)
        for f in fstars
    )

    def pre_qp(qq, qqd):
        st = tick.kin.update(qq, qqd)
        fk = tick._fk_from_state(st)
        J_C = tick._contact_jacobian(fk)
        cs = dyn.contact_space(J_C, st.A_inv)
        tg, P_C = dyn.gravity_compensation(
            st.A_inv, cs.W_inv, cs.N_C, cs.J_C_INV_T, st.G
        )
        out = tg
        for h in range(len(tick.cfg.task_specs)):
            J_task = tick._task_jacobian(st, fk, h)
            tf = dyn.task_jkt(J_task, st.A_inv, cs.N_C, cs.W_inv)
            out = out + (tf.J_kt @ tf.Lambda_task)[..., :, 0]
        return out

    def full(qq, qqd, ff):
        return tick._tick_impl(qq, qqd, ff).torque_cmd

    def chain(f, *args, carry_idx=0):
        @jax.jit
        def run(*a):
            def body(c, _):
                aa = list(a)
                aa[carry_idx] = c
                out = f(*aa)
                c2 = c.at[..., 6:10].add(1e-6 * jnp.tanh(out[..., :4]))
                return c2, ()
            c, _ = jax.lax.scan(body, a[carry_idx], None, length=K)
            return c
        return run

    stages = {}
    q_d = jax.device_put(qs)
    qd_d = jax.device_put(qds)
    fs_d = tuple(jax.device_put(f) for f in fs)

    for name, fn, args in [
        ("pre_qp", pre_qp, (q_d, qd_d)),
        ("full", full, (q_d, qd_d, fs_d)),
    ]:
        g = chain(fn, *args)
        r = g(*args)
        float(jnp.sum(r))
        t0 = time.perf_counter()
        r = g(*args)
        float(jnp.sum(r))
        dt = time.perf_counter() - t0
        stages[name] = max(dt - rtt, 0.0) / K * 1e3
        print(json.dumps({name: round(stages[name], 3)}), flush=True)

    # one QP of the in-tick shape on frozen random data
    from libdwbc_tpu.ops.pallas_qp import pallas_qp_solve

    # in-tick shape: n=12 vars, 96 rows of which 33 are the folded ± torque
    # pair (mirror) — the unmirrored 96-row kernel exceeds the 16M VMEM scope
    n, mir, extra = 12, 33, 30
    m = 2 * mir + extra
    Bm = rng.standard_normal((B, mir, n)).astype(np.float32) * 0.3
    D = rng.standard_normal((B, extra, n)).astype(np.float32) * 0.3
    C = np.concatenate([Bm, -Bm, D], axis=1)
    H = np.tile(np.eye(n, dtype=np.float32), (B, 1, 1))
    g_ = rng.standard_normal((B, n)).astype(np.float32)
    d = np.abs(rng.standard_normal((B, m)).astype(np.float32)) + 0.5

    Hd, gd, Cd, dd = map(jax.device_put, (H, g_, C, d))

    @jax.jit
    def qp_chain(gg):
        def body(c, _):
            x, s, lam = pallas_qp_solve(Hd, c, Cd, dd, iters=12, mirror=mir)
            return c + 1e-6 * jnp.tanh(x), ()
        c, _ = jax.lax.scan(body, gg, None, length=K)
        return c

    r = qp_chain(gd)
    float(jnp.sum(r))
    t0 = time.perf_counter()
    r = qp_chain(gd)
    float(jnp.sum(r))
    dt = time.perf_counter() - t0
    stages["one_pallas_qp_12x96m33"] = max(dt - rtt, 0.0) / K * 1e3

    stages["qp_inferred"] = stages["full"] - stages["pre_qp"]
    print(json.dumps({k: round(v, 3) for k, v in stages.items()}))


if __name__ == "__main__":
    main()
