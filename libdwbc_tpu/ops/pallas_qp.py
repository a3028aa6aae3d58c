"""Pallas TPU megakernel for the batched fixed-iteration IPM QP solver.

Layout strategy ("batch in lanes"): every per-scenario scalar becomes an
(8, 128) VPU tile of 1024 scenarios, and matrices are laid out with their
*element indices leading* and the batch tile trailing:

    H: (n, n, R, 128)   C: (m, n, R, 128)   g/d: (n|m, R, 128)

with R = batch/128 sublane rows; each grid step grabs 8 rows (= 1024
scenarios).  Every arithmetic op in the solver (Gram-matrix FMAs, the
unrolled Cholesky, triangular solves, step-length reductions) is then a
full-width vector op over 1024 scenarios, and the whole IPM loop runs inside
ONE kernel launch per grid step — no per-op dispatch overhead, no HBM
round-trips between iterations.

Only the one-sided form (min ½xᵀHx+gᵀx s.t. Cx ≤ d) is implemented — all
WBC QPs are one-sided after constraint assembly (hqp.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 8 * 128  # scenarios per grid step


def _make_kernel(n: int, m: int, iters: int, ridge: float, warm: bool = False,
                 mirror: int = 0):
    """mirror > 0: the constraint matrix has the form [B; -B; D] with B the
    first `mirror` rows (the ± torque-limit pairs every WBC QP carries,
    src/dwbc.cpp:1001-1016).  The kernel then receives only [B; D]
    (m - mirror rows) and folds the ± pair inside every m-reduction —
    slacks/multipliers/d stay full-length m."""
    mr = mirror
    me = m - mr  # stored constraint rows: [B (mr); D (me - mr)]

    def kernel(H_ref, g_ref, C_ref, d_ref, *rest):
        if warm:
            x0_ref, lam0_ref, x_ref, s_ref, lam_ref = rest
        else:
            x_ref, s_ref, lam_ref = rest
        H = H_ref[:]          # (n, n, 8, 128)
        g = g_ref[:]          # (n, 8, 128)
        C = C_ref[:]          # (me, n, 8, 128)
        d = d_ref[:]          # (m, 8, 128)
        f32 = H.dtype == jnp.float32

        s_floor = 1e-10 if f32 else 1e-14
        w_cap = 1e8 if f32 else 1e12
        mu_tol = 5e-8 if f32 else 1e-13

        # (ridge folded into matvec_H / gram below — Mosaic cannot reshape a
        #  2D eye into the 4D tile layout)

        def chol(K):
            """Unrolled right-looking Cholesky on the lower triangle only
            (n³/6 lane-batched FMAs).  K: dict {(i, j): (8, 128) tile, i ≥ j}.
            Returns (cols, inv_diag) with cols[j][i] = L[i, j] for i ≥ j;
            entries above the diagonal are None (never read by
            cho_solve_vec).  inv_diag[j] = 1/L[j,j] is kept so the two
            back-solves per Newton step multiply instead of divide (VPU
            divides are multi-cycle; the reciprocal is already paid here)."""
            S = dict(K)
            cols = []
            inv_diag = []
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

        def cho_solve_vec(Lcols, inv_diag, b):
            """Solve L Lᵀ x = b with b (n, 8, 128); Lcols[j][i] = L[i,j]."""
            y = [None] * n
            for i in range(n):
                acc = b[i]
                for k in range(i):
                    acc = acc - Lcols[k][i] * y[k]
                y[i] = acc * inv_diag[i]
            x = [None] * n
            for i in reversed(range(n)):
                acc = y[i]
                for k in range(i + 1, n):
                    acc = acc - Lcols[i][k] * x[k]
                x[i] = acc * inv_diag[i]
            return jnp.stack(x, axis=0)

        def matvec_C(x):      # (m, 8, 128) = [B; -B; D] @ x
            acc = C[:, 0] * x[0]
            for j in range(1, n):
                acc = acc + C[:, j] * x[j]
            if mr == 0:
                return acc
            return jnp.concatenate([acc[:mr], -acc[:mr], acc[mr:]], axis=0)

        def _fold(v, combine):
            """Fold a full-m vector onto the stored rows: the ±B pair's
            entries combine (v₁ − v₂ for transpose-matvecs, v₁ + v₂ for
            diag weights); D rows pass through."""
            if mr == 0:
                return v
            return jnp.concatenate(
                [combine(v[:mr], v[mr : 2 * mr]), v[2 * mr :]], axis=0
            )

        def matvec_CT(v):     # (n, 8, 128) = [B; -B; D]ᵀ @ v
            veff = _fold(v, lambda a, b: a - b)
            return jnp.sum(C * veff[:, None], axis=0)

        def matvec_H(x):
            # explicit row loop: Mosaic cannot lower multi-batch-dim einsums
            rows = []
            for i in range(n):
                acc = H[i, 0] * x[0] + ridge * x[i]
                for j in range(1, n):
                    acc = acc + H[i, j] * x[j]
                rows.append(acc)
            return jnp.stack(rows, axis=0)

        def gram(w):
            """Lower triangle of K = Hr + Cᵀ diag(w) C as {(i, j): tile}
            — per-element reductions over the stored rows, batch tile on the
            VPU lanes; feeds chol() directly (no dense n×n stack)."""
            Cw = C * _fold(w, lambda a, b: a + b)[:, None]
            cache = {}
            for i in range(n):
                for j in range(i + 1):
                    cache[(i, j)] = H[i, j] + jnp.sum(Cw[:, i] * C[:, j], axis=0)
                cache[(i, i)] = cache[(i, i)] + ridge
            return cache

        def factor(x, s, lam):
            """Predictor and corrector share (r_d, r_p, w, K, chol(K)) —
            factor once per iteration, back-solve twice.  1/s is computed
            once here and multiplied everywhere downstream (5 division
            sites per iteration collapse to this one)."""
            s_safe = jnp.maximum(s, s_floor)
            inv_s = 1.0 / s_safe
            r_d = matvec_H(x) + g + matvec_CT(lam)
            r_p = matvec_C(x) + s - d
            w = jnp.clip(lam * inv_s, 0.0, w_cap)
            L, inv_diag = chol(gram(w))
            return inv_s, r_d, r_p, w, L, inv_diag

        def newton(fac, s, lam, sigma_mu):
            inv_s, r_d, r_p, w, L, inv_diag = fac
            r_c = s * lam - sigma_mu
            rhs = -r_d - matvec_CT(w * r_p - r_c * inv_s)
            dx = cho_solve_vec(L, inv_diag, rhs)
            ds = -(r_p + matvec_C(dx))
            dlam = -(r_c + lam * ds) * inv_s
            return dx, ds, dlam

        def alpha_max(v, dv):
            ratio = jnp.where(dv < 0, -v / jnp.where(dv < 0, dv, -1.0), 1e20)
            return jnp.minimum(1.0, 0.995 * jnp.min(ratio, axis=0))

        if warm:
            # hot-start from a previous tick's primal/dual point: pull the
            # slacks/multipliers back to the interior so the IPM can move
            x0 = x0_ref[:]
            s0 = jnp.maximum(d - matvec_C(x0), 1e-4)
            # upper clip: a prior ε-infeasible solve's diverged dual must
            # not poison the restart (see ops/tick_kernel.py::_ipm)
            lam0 = jnp.clip(lam0_ref[:], 1e-4, w_cap)
        else:
            x0 = jnp.zeros_like(g)
            s0 = jnp.maximum(d - matvec_C(x0), 1.0)
            lam0 = jnp.ones_like(s0)

        def body(_, carry):
            x, s, lam = carry
            mu = jnp.sum(s * lam, axis=0) / m
            # freeze converged lanes on mu alone (see ops/qp.py body: a warm
            # restart never arrives frozen — its init floors keep mu₀ well
            # above mu_tol — and residual-based un-freeze gates degrade
            # converged lanes)
            live = (mu > mu_tol).astype(H.dtype)
            fac = factor(x, s, lam)
            dx_a, ds_a, dlam_a = newton(fac, s, lam, jnp.zeros_like(s))
            a_p = alpha_max(s, ds_a)
            a_d = alpha_max(lam, dlam_a)
            mu_aff = jnp.sum((s + a_p * ds_a) * (lam + a_d * dlam_a), axis=0) / m
            sigma = (mu_aff / jnp.maximum(mu, 1e-30)) ** 3
            target = sigma * mu - ds_a * dlam_a
            dx, ds, dlam = newton(fac, s, lam, target)
            if warm:
                # separate primal/dual step lengths (standard Mehrotra; see
                # ops/qp.py) on warm solves only: fast feasibility
                # restoration after a state change; cold solves keep the
                # joint step (golden-validated trajectory)
                a_pc = live * alpha_max(s, ds)
                a_dc = live * alpha_max(lam, dlam)
            else:
                a_pc = live * jnp.minimum(alpha_max(s, ds), alpha_max(lam, dlam))
                a_dc = a_pc
            # Non-finite guard: a NaN/Inf step leaves the iterate unchanged.
            # Any overflow/NaN in the iteration surfaces in dx (the affine
            # step feeds the corrector target, the Gram feeds cho_solve, and
            # ds/dlam are affine images of dx) — one (8,128) detection tile
            # replaces three full-vector nan_to_num passes.  MUST use a
            # where-select (0·NaN = NaN, so a zero step length would still
            # poison the iterate).
            ok = jnp.sum(dx * 0.0, axis=0) == 0.0
            # λ capped at w_cap: dual safeguard for ε-infeasible rows
            # (see ops/tick_kernel.py::_ipm)
            return (
                jnp.where(ok, x + a_pc * dx, x),
                jnp.where(ok, s + a_pc * ds, s),
                jnp.where(ok, jnp.minimum(lam + a_dc * dlam, w_cap), lam),
            )

        x, s, lam = jax.lax.fori_loop(0, iters, body, (x0, s0, lam0))
        x_ref[:] = x
        s_ref[:] = s
        lam_ref[:] = lam

    return kernel


@functools.partial(jax.jit, static_argnames=("iters", "ridge", "interpret",
                                              "mirror"))
def pallas_qp_solve(H, g, C, d, iters: int = 12, ridge: float = 1e-6,
                    interpret: bool = False, x0=None, lam0=None,
                    mirror: int = 0):
    """Solve B one-sided QPs (min ½xᵀHx+gᵀx s.t. Cx ≤ d).

    H (B,n,n), g (B,n), C (B,m,n), d (B,m); H/g/C/d may also be unbatched
    (broadcast).  B is padded to a multiple of 1024 internally.
    Optional x0/lam0 (B,n)/(B,m) warm-start the IPM from a previous
    solution (the qpOASES hot-start analog, include/dwbc.h:222-228).
    mirror > 0 asserts C[mirror:2*mirror] == -C[:mirror] (the ± torque-limit
    row pairs); the kernel then stores/reduces only m - mirror rows.
    Returns (x, s, lam) with the original batch size.
    """
    B = C.shape[0] if C.ndim == 3 else g.shape[0]
    n = g.shape[-1]
    m = C.shape[-2]
    dtype = C.dtype

    H = jnp.broadcast_to(H, (B, n, n))
    g = jnp.broadcast_to(g, (B, n))
    C = jnp.broadcast_to(C, (B, m, n))
    d = jnp.broadcast_to(d, (B, m))
    if mirror:
        # drop the redundant -B block; the kernel reconstructs it on the fly
        C = jnp.concatenate([C[:, :mirror], C[:, 2 * mirror :]], axis=1)
    me = m - mirror

    Bp = ((B + TILE - 1) // TILE) * TILE
    R = Bp // 128
    G = Bp // TILE

    def to_tiles(a, lead, pad_value=0.0):
        pad = [(0, Bp - B)] + [(0, 0)] * (a.ndim - 1)
        a = jnp.pad(a, pad, constant_values=pad_value)
        # (Bp, *lead) -> (*lead, R, 128)
        a = jnp.moveaxis(a.reshape((R, 128) + lead), (0, 1), (-2, -1))
        return a

    Ht = to_tiles(H, (n, n))
    gt = to_tiles(g, (n,))
    Ct = to_tiles(C, (me, n))
    dt = to_tiles(d, (m,), pad_value=1.0)  # padded scenarios: 0·x ≤ 1

    warm = x0 is not None
    kernel = _make_kernel(n, m, iters, ridge, warm=warm, mirror=mirror)

    def spec(*lead):
        L = len(lead)
        return pl.BlockSpec(
            lead + (8, 128),
            (lambda i, L=L: (0,) * L + (i, 0)),
            memory_space=pltpu.VMEM,
        )

    ins = [Ht, gt, Ct, dt]
    in_specs = [spec(n, n), spec(n), spec(me, n), spec(m)]
    if warm:
        ins.append(to_tiles(jnp.broadcast_to(x0, (B, n)), (n,)))
        ins.append(to_tiles(jnp.broadcast_to(lam0, (B, m)), (m,), pad_value=1.0))
        in_specs += [spec(n), spec(m)]

    out_shape = [
        jax.ShapeDtypeStruct((n, R, 128), dtype),
        jax.ShapeDtypeStruct((m, R, 128), dtype),
        jax.ShapeDtypeStruct((m, R, 128), dtype),
    ]
    x, s, lam = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=in_specs,
        out_specs=[spec(n), spec(m), spec(m)],
        out_shape=out_shape,
        interpret=interpret,
        # see ops/pallas_linalg.py: multi-tile grids double-buffer blocks
        # past Mosaic's 16 MB default scoped limit; v5e has 128 MB VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
    )(*ins)

    def from_tiles(a, lead):
        a = jnp.moveaxis(a, (-2, -1), (0, 1)).reshape((Bp,) + lead)
        return a[:B]

    return from_tiles(x, (n,)), from_tiles(s, (m,)), from_tiles(lam, (m,))
