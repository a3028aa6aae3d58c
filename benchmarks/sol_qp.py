"""Measured speed-of-light accounting for the Pallas IPM QP megakernel.

Replaces the hand-estimated "within ~an order of magnitude of VPU light
speed" paragraph in PERF.md with numbers: an exact analytic FLOP count of
the kernel body (derived op-by-op from ops/pallas_qp.py::_make_kernel) and
a measured isolated-kernel throughput at the tick's exact QP shapes
(n=12 bucketed vars, m=86 rows = 2x33 torque-limit pairs + 20 cone/ZMP rows,
mirror=33 — the double-support Tocabi level QP).

Two light-speed bounds are reported:

* FLOP bound — analytic flops/solve vs the VPU f32 FMA peak
  (8x128 lanes x 4 ALUs x ~0.94 GHz ~= 3.85 TFLOP/s on v5e; the MXU is
  irrelevant here: with the batch on the VPU lanes there is no contraction
  >= 128 deep to feed the systolic array — every scenario owns its own
  12x12 system, and transposing to matrix-major would pad 12->128 on both
  MXU dims, a ~100x FLOP inflation.  This is the measured "why not MXU".)
* issue bound — every (8,128)-tile vector instruction retires >= 1024
  lanes/cycle-ish; the kernel's sequential tile-op count per iteration
  (~= its FMA count, each FMA over the batch tile is one instruction)
  divided by the VPU issue rate.  The gap between the measured number and
  this bound is dependency-chain stalls (the unrolled Cholesky/triangular
  solves are serial chains) + Mosaic loop overhead.

Methodology is the bench.py one: K solves chained on device inside one
lax.scan with a data-dependent carry (warm-start serving shape: each solve
hot-starts from the previous primal/dual point), tunnel RTT measured with a
trivial kernel and subtracted.

Usage: python benchmarks/sol_qp.py [--iters 7] [--batch 1024] [--chain 16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)

VPU_PEAK_F32 = 8 * 128 * 4 * 0.94e9 * 2  # lanes x ALUs x clock x (FMA=2) ~= 7.7e12 flop/s
VPU_ISSUE = 4 * 0.94e9                   # independent (8,128)-tile ops/s


def kernel_flops(n: int, m: int, mr: int, iters: int) -> dict:
    """Exact flop/tile-op count of one _make_kernel body iteration, per
    scenario (FMA = 2 flops; sqrt/div/max/clip = 1).  Mirrors the op
    sequence in ops/pallas_qp.py::_make_kernel (body -> factor -> 2x newton
    -> 4x alpha_max -> update)."""
    me = m - mr

    fma = 0      # FMA count (2 flops each) == dependency-relevant tile ops
    other = 0    # single-flop vector ops

    # factor(): matvec_H + matvec_C + matvec_CT + gram + chol
    fma += n * (n + 1)                 # matvec_H incl. ridge
    fma += 2 * me * n                  # matvec_C + matvec_CT
    other += 2 * mr                    # mirror fold/neg
    other += 2 * n + 2 * m             # r_d, r_p adds
    other += 4 * m                     # inv_s (max+recip), w (mult+clip)
    fma += me * n * (n + 1) // 2       # gram entries (lower triangle)
    other += me * n + mr + n           # Cw scaling, fold, ridge diag
    fma += n ** 3 // 6                 # cholesky updates
    other += n * (n - 1) // 2 + 2 * n  # chol col scaling, sqrt+recip

    # newton() x2
    for _ in range(2):
        other += 2 * m                 # r_c
        other += 3 * m                 # w*r_p - r_c*inv_s
        fma += me * n                  # matvec_CT
        other += mr + n
        fma += n * (n - 1)             # cho_solve fwd+bwd FMAs
        other += 2 * n                 # inv_diag scalings
        fma += me * n                  # matvec_C
        other += mr
        other += 2 * m + 3 * m         # ds, dlam

    # step lengths x4 + mu/mu_aff/sigma/target + guarded update
    other += 4 * 4 * m
    fma += 3 * m                       # mu, mu_aff products
    other += 4 * m                     # sigma/target
    other += 2 * (n + 2 * m)           # update selects
    fma += n + 2 * m                   # a*dx + x etc.

    flops = (2 * fma + other) * iters
    tile_ops = (fma + other) * iters
    return {"flops_per_solve": flops, "tile_ops_per_solve": tile_ops,
            "fma_per_iter": fma, "other_per_iter": other}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=7,
                    help="IPM iterations (7 = the warm serving shape)")
    ap.add_argument("-B", "--batch", type=int, default=1024)
    ap.add_argument("-K", "--chain", type=int, default=16)
    ap.add_argument("-n", type=int, default=12)
    ap.add_argument("-m", type=int, default=86)
    ap.add_argument("--mirror", type=int, default=33)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from libdwbc_tpu.ops.pallas_qp import pallas_qp_solve

    n, m, mr, B, K = args.n, args.m, args.mirror, args.batch, args.chain
    rng = np.random.default_rng(0)

    # Random PD QPs with the tick's mirror structure: C = [Bm; -Bm; D],
    # d > 0 so x = 0 is strictly feasible (the torque-limit rows of the real
    # QP have exactly this +/- finite-bound shape, src/dwbc.cpp:1001-1016).
    M = rng.standard_normal((B, n, n)).astype(np.float32)
    H = (M @ M.transpose(0, 2, 1) / n + np.eye(n, dtype=np.float32)[None])
    g = rng.standard_normal((B, n)).astype(np.float32)
    Bm = rng.standard_normal((B, mr, n)).astype(np.float32) / np.sqrt(n)
    D = rng.standard_normal((B, m - 2 * mr, n)).astype(np.float32) / np.sqrt(n)
    C = np.concatenate([Bm, -Bm, D], axis=1)
    d = rng.uniform(0.5, 1.5, (B, m)).astype(np.float32)

    Hd, gd, Cd, dd = (jax.device_put(a) for a in (H, g, C, d))

    @jax.jit
    def chained(H_, g_, C_, d_):
        x0, _, lam0 = pallas_qp_solve(H_, g_, C_, d_, iters=12, mirror=mr)

        def body(carry, _):
            x, lam = carry
            gg = g_ + 1e-4 * jnp.tanh(x)          # data-dependent: serial
            x, _, lam = pallas_qp_solve(H_, gg, C_, d_, iters=args.iters,
                                        mirror=mr, x0=x, lam0=lam)
            return (x, lam), None

        (x, lam), _ = jax.lax.scan(body, (x0, lam0), None, length=K)
        return x

    # RTT floor (same as bench.py — tunnel RTT swamps per-call numbers)
    f = jax.jit(lambda x: x * 2.0)
    z = jax.device_put(np.ones(8, np.float32))
    float(jnp.sum(f(z)))
    rtts = []
    for _ in range(10):
        t0 = time.perf_counter()
        float(jnp.sum(f(z)))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))

    x = chained(Hd, gd, Cd, dd)
    assert np.isfinite(np.asarray(x)).all()
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        x = chained(Hd, gd, Cd, dd)
        float(jnp.sum(x))
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    per_solve = max(dt - rtt, 1e-9) / (K * B)  # cold solve excluded from K
    sps = 1.0 / per_solve

    fl = kernel_flops(n, m, mr, args.iters)
    gflops = sps * fl["flops_per_solve"] / 1e9
    flop_bound_sps = VPU_PEAK_F32 / fl["flops_per_solve"]
    issue_bound_sps = VPU_ISSUE / fl["tile_ops_per_solve"] * 1024

    print(json.dumps({
        "metric": "pallas_qp_isolated",
        "shapes": {"n": n, "m": m, "mirror": mr, "batch": B,
                   "iters": args.iters},
        "solves_per_sec": round(sps, 1),
        "us_per_solve": round(1e6 * per_solve, 3),
        "flops_per_solve": fl["flops_per_solve"],
        "achieved_gflops": round(gflops, 1),
        "vpu_fma_peak_gflops": round(VPU_PEAK_F32 / 1e9, 1),
        "pct_of_flop_peak": round(100 * gflops * 1e9 / VPU_PEAK_F32, 2),
        "flop_bound_solves_per_sec": round(flop_bound_sps, 1),
        "issue_bound_solves_per_sec": round(issue_bound_sps, 1),
        "host_device_rtt_ms": round(rtt * 1e3, 2),
    }))


if __name__ == "__main__":
    main()
