"""Sub-stage TPU profiling of the pre-QP pipeline (chained-scan method).

Times nested prefixes of the pre-QP tick at batch B so each stage's cost is
the delta to the previous line:
  fk          — forward kinematics only
  kin         — full kinematics update (FK+vel+jacobians+CRBA+A⁻¹+bias+CMM)
  kin_contact — + contact jacobian + contact-space factorization
  pre_qp      — + gravity comp + both task JKTs (matches profile_tick)

Prints one JSON line per stage as it completes.
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

    B = 1024
    K = 4
    rng = np.random.default_rng(0)
    qs = np.tile(q, (B, 1)).astype(np.float32)
    qs[:, 6:39] += 0.02 * rng.standard_normal((B, 33)).astype(np.float32)
    qds = np.zeros((B, model.ndof), dtype=np.float32)

    def fk_only(qq, qqd):
        f = tick.kin.fk(qq)
        return f.p[..., -1, :] + f.com_w[..., 0, :]

    def kin(qq, qqd):
        st = tick.kin.update(qq, qqd)
        return st.A_inv[..., 0, :] + st.B[..., :1] + st.G[..., :1]

    def kin_contact(qq, qqd):
        st = tick.kin.update(qq, qqd)
        J_C = tick._contact_jacobian_from_state(st)
        cs = dyn.contact_space(J_C, st.A_inv)
        return cs.W_inv[..., 0, :33] + cs.NwJw[..., 0, :1] + cs.N_C[..., 0, :1]

    def pre_qp(qq, qqd):
        st = tick.kin.update(qq, qqd)
        J_C = tick._contact_jacobian_from_state(st)
        cs = dyn.contact_space(J_C, st.A_inv)
        tg, P_C = dyn.gravity_compensation(
            st.A_inv, cs.W_inv, cs.N_C, cs.J_C_INV_T, st.G
        )
        out = tg
        fk = tick._fk_from_state(st)
        for h in range(len(tick.cfg.task_specs)):
            J_task = tick._task_jacobian(st, fk, h)
            tf = dyn.task_jkt(J_task, st.A_inv, cs.N_C, cs.W_inv)
            out = out + (tf.J_kt @ tf.Lambda_task)[..., :, 0]
        return out

    def chain(f):
        @jax.jit
        def run(qq, qqd):
            def body(c, _):
                out = f(c, qqd)
                c2 = c.at[..., 6:10].add(1e-6 * jnp.tanh(out[..., :4]))
                return c2, ()
            c, _ = jax.lax.scan(body, qq, None, length=K)
            return c
        return run

    q_d = jax.device_put(qs)
    qd_d = jax.device_put(qds)
    out = {}
    for name, fn in [
        ("fk", fk_only), ("kin", kin),
        ("kin_contact", kin_contact), ("pre_qp", pre_qp),
    ]:
        g = chain(fn)
        r = g(q_d, qd_d)
        float(jnp.sum(r))
        t0 = time.perf_counter()
        r = g(q_d, qd_d)
        float(jnp.sum(r))
        dt = time.perf_counter() - t0
        out[name] = round(max(dt - rtt, 0.0) / K * 1e3, 3)
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
