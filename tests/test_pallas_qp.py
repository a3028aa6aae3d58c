"""Pallas QP megakernel: correctness in interpreter mode (CPU-runnable).

The compiled-on-TPU path is exercised by bench.py; here the same kernel code
runs under the Pallas interpreter and must match the f64 XLA solver.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from libdwbc_tpu.ops.pallas_qp import pallas_qp_solve
from libdwbc_tpu.ops.qp import solve_qp


def _random_one_sided(rng, B, n, m):
    H = np.zeros((B, n, n), np.float32)
    g = np.zeros((B, n), np.float32)
    C = np.zeros((B, m, n), np.float32)
    d = np.zeros((B, m), np.float32)
    for b in range(B):
        Q = rng.standard_normal((n, n))
        H[b] = Q @ Q.T * 0.1 + np.eye(n)
        g[b] = rng.standard_normal(n)
        C[b] = rng.standard_normal((m, n))
        x0 = rng.standard_normal(n)
        d[b] = C[b] @ x0 + rng.uniform(0.05, 2.0, m)
    return H, g, C, d


def test_interpret_matches_f64_reference():
    rng = np.random.default_rng(0)
    B, n, m = 8, 12, 40
    H, g, C, d = _random_one_sided(rng, B, n, m)
    x, s, lam = pallas_qp_solve(
        jnp.array(H), jnp.array(g), jnp.array(C), jnp.array(d),
        iters=15, interpret=True,
    )
    ref = solve_qp(
        jnp.array(H, jnp.float64), jnp.array(g, jnp.float64),
        jnp.array(C, jnp.float64), None, jnp.array(d, jnp.float64), iters=30,
    )
    assert np.abs(np.asarray(x) - np.asarray(ref.x)).max() < 5e-3
    viol = np.einsum("bmn,bn->bm", C, np.asarray(x)) - d
    assert viol.max() < 1e-5


def test_interpret_warm_start():
    """Warm-starting from the solution converges in few iterations."""
    rng = np.random.default_rng(2)
    B, n, m = 4, 8, 16
    H, g, C, d = _random_one_sided(rng, B, n, m)
    x_cold, s, lam_cold = pallas_qp_solve(
        jnp.array(H), jnp.array(g), jnp.array(C), jnp.array(d),
        iters=15, interpret=True,
    )
    # re-solve a slightly perturbed problem warm from the previous solution
    g2 = g + 0.01 * rng.standard_normal(g.shape).astype(np.float32)
    x_w, _, _ = pallas_qp_solve(
        jnp.array(H), jnp.array(g2), jnp.array(C), jnp.array(d),
        iters=6, interpret=True, x0=x_cold, lam0=lam_cold,
    )
    ref = solve_qp(
        jnp.array(H, jnp.float64), jnp.array(g2, jnp.float64),
        jnp.array(C, jnp.float64), None, jnp.array(d, jnp.float64), iters=30,
    )
    assert np.abs(np.asarray(x_w) - np.asarray(ref.x)).max() < 5e-3
    # 6 cold iterations would NOT be enough on these problems
    x_cold6, _, _ = pallas_qp_solve(
        jnp.array(H), jnp.array(g2), jnp.array(C), jnp.array(d),
        iters=6, interpret=True,
    )
    err_w = np.abs(np.asarray(x_w) - np.asarray(ref.x)).max()
    err_c = np.abs(np.asarray(x_cold6) - np.asarray(ref.x)).max()
    assert err_w <= err_c + 1e-6


def test_interpret_mirror_rows():
    """mirror=k (C = [B; -B; D] torque-limit structure) must match the
    unmirrored kernel exactly — same math, folded reductions."""
    rng = np.random.default_rng(3)
    B, n, k, extra = 8, 10, 7, 9
    m = 2 * k + extra
    H, g, _, _ = _random_one_sided(rng, B, n, m)
    Bm = rng.standard_normal((B, k, n)).astype(np.float32)
    D = rng.standard_normal((B, extra, n)).astype(np.float32)
    C = np.concatenate([Bm, -Bm, D], axis=1)
    x0 = rng.standard_normal((B, n))
    d = (np.einsum("bmn,bn->bm", C, x0)
         + rng.uniform(0.05, 2.0, (B, m))).astype(np.float32)
    # exactness of the fold: in f64 the mirrored and unmirrored kernels
    # follow the same central path to ~1e-12 (f32 trajectories diverge by
    # rounding order, so the strict comparison must be f64)
    args64 = (jnp.array(H, jnp.float64), jnp.array(g, jnp.float64),
              jnp.array(C, jnp.float64), jnp.array(d, jnp.float64))
    x_m64, _, _ = pallas_qp_solve(*args64, iters=15, interpret=True, mirror=k)
    x_u64, _, _ = pallas_qp_solve(*args64, iters=15, interpret=True)
    assert np.abs(np.asarray(x_m64) - np.asarray(x_u64)).max() < 1e-9
    # f32 mirrored path still lands on the f64 reference solution
    args = (jnp.array(H), jnp.array(g), jnp.array(C), jnp.array(d))
    x_m, _, _ = pallas_qp_solve(*args, iters=15, interpret=True, mirror=k)
    ref = solve_qp(
        jnp.array(H, jnp.float64), jnp.array(g, jnp.float64),
        jnp.array(C, jnp.float64), None, jnp.array(d, jnp.float64), iters=30,
    )
    assert np.abs(np.asarray(x_m) - np.asarray(ref.x)).max() < 5e-3


def test_interpret_batch_padding():
    """Batch sizes that are not a multiple of the 1024-scenario tile."""
    rng = np.random.default_rng(1)
    B, n, m = 3, 6, 10
    H, g, C, d = _random_one_sided(rng, B, n, m)
    x, s, lam = pallas_qp_solve(
        jnp.array(H), jnp.array(g), jnp.array(C), jnp.array(d),
        iters=12, interpret=True,
    )
    assert x.shape == (B, n)
    ref = solve_qp(
        jnp.array(H, jnp.float64), jnp.array(g, jnp.float64),
        jnp.array(C, jnp.float64), None, jnp.array(d, jnp.float64), iters=30,
    )
    assert np.abs(np.asarray(x) - np.asarray(ref.x)).max() < 5e-3
