"""Sub-stage TPU profiling of the kinematics update (chained-scan method).

The r02 prestage profile showed `Kinematics.update` is now the largest
single stage of the batched tick (~2.5 ms/1024).  This drills one level
deeper: nested prefixes of the update, each line's cost = delta to the
previous one.  Methodology is bench.py's (on-device lax.scan chain with a
data-dependent carry; tunnel RTT subtracted).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)


def main():
    import jax
    import jax.numpy as jnp
    import time

    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
        )
    except Exception:
        pass

    import __graft_entry__ as ge
    import bench as _b
    from libdwbc_tpu.ops import smallmat as sm
    from libdwbc_tpu.ops.pallas_linalg import pallas_inv_eligible, pallas_psd_inverse

    model, tick = ge._model_and_tick(qp_iters=12)
    q, qd, fstars = ge._example_inputs(model)
    kin = tick.kin

    rtt = _b._rtt(jax, jnp)
    B, K = 1024, 16
    rng = np.random.default_rng(0)
    qs = np.tile(q, (B, 1)).astype(np.float32)
    qs[:, 6:39] += 0.02 * rng.standard_normal((B, 33)).astype(np.float32)
    qds = np.zeros((B, model.ndof), dtype=np.float32)

    def s_fk(qq, qqd):
        fk = kin.fk(qq)
        return fk.p[..., -1, :3] + fk.com_w[..., -1, :3]

    def s_vel(qq, qqd):
        fk = kin.fk(qq)
        w, v = kin.velocities(fk, qqd)
        return w[..., -1, :3] + v[..., -1, :3]

    def s_jac(qq, qqd):
        fk = kin.fk(qq)
        J, Jcom = kin.body_jacobians(fk)
        return J[..., -1, 0, :3] + Jcom[..., -1, 0, :3]

    def s_mass(qq, qqd):
        fk = kin.fk(qq)
        _, Jcom = kin.body_jacobians(fk)
        A = kin.mass_matrix(fk, Jcom)
        return A[..., 0, :3]

    def s_ainv(qq, qqd):
        fk = kin.fk(qq)
        _, Jcom = kin.body_jacobians(fk)
        A = kin.mass_matrix(fk, Jcom)
        A_inv = pallas_psd_inverse(A) if pallas_inv_eligible(A) else sm.psd_inverse(A)
        return A_inv[..., 0, :3]

    def s_bias(qq, qqd):
        fk = kin.fk(qq)
        w, v = kin.velocities(fk, qqd)
        _, Jcom = kin.body_jacobians(fk)
        Bv = kin.bias_forces(fk, w, v, Jcom)
        return Bv[..., :3]

    def s_full(qq, qqd):
        st = kin.update(qq, qqd)
        return st.A_inv[..., 0, :3] + st.B[..., :3] + st.G[..., :3] + st.CMM[..., 0, :3]

    def chain(f):
        @jax.jit
        def run(qq, qqd):
            def body(c, _):
                out = f(c, qqd)
                return c.at[..., 6:9].add(1e-6 * jnp.tanh(out[..., :3])), ()
            c, _ = jax.lax.scan(body, qq, None, length=K)
            return c
        return run

    q_d = jax.device_put(qs)
    qd_d = jax.device_put(qds)
    out = {}
    for name, f in [("fk", s_fk), ("vel", s_vel), ("jac", s_jac),
                    ("mass", s_mass), ("ainv", s_ainv), ("bias", s_bias),
                    ("full_update", s_full)]:
        g = chain(f)
        r = g(q_d, qd_d)
        float(jnp.sum(r))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = g(q_d, qd_d)
            float(jnp.sum(r))
            ts.append(time.perf_counter() - t0)
        ms = (float(np.median(ts)) - rtt) * 1e3 / K
        out[name] = round(ms, 3)
        print(json.dumps({name: out[name]}), flush=True)
    out["rtt_ms"] = round(rtt * 1e3, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
