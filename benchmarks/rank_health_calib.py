"""Calibrate the contact-space rank_health indicator against downstream
torque error (round-3 item: one documented façade threshold instead of
assorted magic numbers).

rank_health = min(diag L)/max(diag L) of the contact Gram / base-block
Cholesky ≈ sqrt(λ_min/λ_max) (wbc/dynamics.py::_chol_health) — the numeric
replacement for the reference's COD rank check + "Contact Space
Factorization Error" abort (/root/reference/src/wbd.cpp:126-136).

Sweep: interpolate the second foot's contact jacobian block toward the
first's, J2(α) = (1-α)·J2 + α·J1 — at α→1 the contact Gram is exactly
singular (duplicate contact), passing through every intermediate
conditioning.  Also sweeps near-parallel variants on the real Tocabi
double-support geometry.  At each point:

* health(f32) of the contact space;
* downstream error: ‖τ_grav(f32) − τ_grav(f64)‖ / ‖τ_grav(f64)‖ and the
  same for the NwJw-projected redistribution directions (the quantities
  the closed-form kernel basis feeds).

Artifact: benchmarks/rank_health_calib_r03.json with the (health, error)
curve and the chosen thresholds.

Conclusion encoded in the façade (wbc/robot.py) and asserted by
tests/test_rank_health.py::test_threshold_separates_good_from_garbage.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402


def tocabi_contact_state():
    from libdwbc_tpu.kin.engine import Kinematics
    from libdwbc_tpu.model.compile import compile_urdf

    urdf = "/root/reference/tests/dyros_tocabi.urdf"
    model = compile_urdf(urdf, floating=True)
    kin = Kinematics(model)
    q = np.zeros(model.nq)
    q[2] = 0.92983
    q[model.ndof] = 1.0
    q[6:18] = [0.0, 0.0, -0.24, 0.6, -0.36, 0.0] * 2
    st = kin.update(jnp.asarray(q), jnp.zeros(model.ndof))
    fk_p = np.asarray(st.p)
    # foot contact jacobians (6D each) at the standard contact point
    from libdwbc_tpu.kin.engine import FK

    fk = FK(R=st.R, p=st.p,
            axis_w=jnp.einsum("bij,bj->bi", st.R, jnp.asarray(model.axis)),
            com_w=st.com_w)
    pt = jnp.asarray([0.03, 0.0, -0.1585])
    J1 = np.asarray(kin.frame_point_jacobian(fk, 6, pt))
    J2 = np.asarray(kin.frame_point_jacobian(fk, 12, pt))
    return np.asarray(st.A_inv), np.asarray(st.G), J1, J2


def sweep():
    from libdwbc_tpu.wbc.dynamics import contact_space, gravity_compensation

    A_inv64, G64, J1, J2 = tocabi_contact_state()

    rows = []
    # α continuum: second contact block slides onto the first → Gram
    # singular in the limit.  Log-spaced approach to 1.
    alphas = np.concatenate([
        np.linspace(0.0, 0.9, 10),
        1.0 - np.logspace(-1, -6, 12),
        [1.0],
    ])
    for a in alphas:
        J_C64 = np.concatenate([J1, (1 - a) * J2 + a * J1], axis=0)

        def run(dtype):
            Jc = jnp.asarray(J_C64, dtype)
            Ai = jnp.asarray(A_inv64, dtype)
            G = jnp.asarray(G64, dtype)
            cs = contact_space(Jc, Ai)
            tg, P_C = gravity_compensation(Ai, cs.W_inv, cs.N_C, cs.J_C_INV_T, G)
            return cs, np.asarray(tg, np.float64), np.asarray(cs.NwJw, np.float64)

        cs64, tg64, nw64 = run(jnp.float64)
        cs32, tg32, nw32 = run(jnp.float32)

        scale = max(np.linalg.norm(tg64), 1e-9)
        err32 = float(np.linalg.norm(tg32 - tg64) / scale)
        # NwJw column-space error (basis is orthogonal-invariant: compare
        # projectors onto span)
        def proj(N):
            Q, _ = np.linalg.qr(N)
            return Q @ Q.T
        nw_err = float(np.abs(proj(nw32) - proj(nw64)).max()) if nw64.size else 0.0
        rows.append(dict(
            alpha=float(a),
            health_f32=float(np.asarray(cs32.rank_health)),
            health_f64=float(np.asarray(cs64.rank_health)),
            tau_grav_relerr_f32=err32,
            nwjw_span_err_f32=nw_err,
        ))
        print(json.dumps(rows[-1]), flush=True)
    return rows


def main():
    rows = sweep()
    # threshold selection: smallest health_f32 whose f32 τ_grav error stays
    # below 1% across the sweep (with one decade of safety margin)
    ok = [r for r in rows if r["tau_grav_relerr_f32"] < 1e-2]
    bad = [r for r in rows if r["tau_grav_relerr_f32"] >= 1e-2]
    h_ok_min = min(r["health_f32"] for r in ok)
    h_bad_max = max((r["health_f32"] for r in bad), default=0.0)
    out = dict(
        rows=rows,
        h_ok_min=h_ok_min,
        h_bad_max=h_bad_max,
        note="façade threshold must sit in (h_bad_max, h_ok_min)",
    )
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "rank_health_calib_r03.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(dict(h_ok_min=h_ok_min, h_bad_max=h_bad_max, out=path)))


if __name__ == "__main__":
    main()
