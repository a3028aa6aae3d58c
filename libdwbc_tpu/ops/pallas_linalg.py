"""Pallas TPU lane-batched dense linalg: the batched PSD inverse megakernel.

Why this exists: the two big per-tick factorizations — A⁻¹ (model_dof×
model_dof, the mass-matrix inverse of ``Kinematics.update``) and W⁻¹
((n-6)×(n-6), ``contact_space``) — were the tick's wall-clock hotspot.  The
unrolled ``ops.smallmat`` versions are algebraically right for TPU (batch →
VPU lanes, no LAPACK-shaped calls) but as *XLA graphs* they emit thousands
of tiny HLOs whose intermediates round-trip HBM between fusions.  Measured
on v5e: the isolated QP Pallas kernel runs 1024 solves in ~60 µs while the
full tick took ~9.9 ms — ~98 % of the tick was this kind of glue.

Here the whole factorization (Cholesky → L⁻¹ → L⁻ᵀL⁻¹) runs inside ONE
kernel launch with the same layout strategy as ops/pallas_qp.py: the batch
becomes (8, 128) VPU tiles and matrix element indices lead —

    A packed lower triangle: (n(n+1)/2, R, 128);  out: (n, n, R, 128)

so every Cholesky update / substitution step is a full-width vector op over
1024 scenarios.  The input is passed as a packed lower triangle to halve
its VMEM footprint (at model_dof = 39 a full (n,n,8,128) f32 block is
6.2 MB; in+out+live intermediates must fit in ~16 MB VMEM).

Reference parity: this replaces RBDL's per-robot ``A_.inverse()`` /
``W_inv`` COD (src/dwbc.cpp:305-312, src/wbd.cpp:108-143) on the batched
TPU path; numerics match ops/smallmat.psd_inverse (same algorithm, same
pivot clamp).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 8 * 128  # scenarios per grid step (mirrors ops/pallas_qp.py)

# Route batched f32 TPU inverses ≥ this size to the kernel; below it the
# XLA unrolled path is fine and the pallas_call pack/transpose glue isn't
# worth it.
_MIN_N = 16
_MAX_N = 64  # VMEM ceiling: packed in + full out + L/Linv live columns


def _make_kernel(n: int):
    def kernel(Ap_ref, out_ref):
        # unpack the lower triangle: S[(i,j)] = A[i,j], i ≥ j
        S = {}
        pos = 0
        for i in range(n):
            for j in range(i + 1):
                S[(i, j)] = Ap_ref[pos]
                pos += 1

        # Cholesky, right-looking on the lower triangle (n³/6 FMAs) —
        # identical recurrence to ops/pallas_qp.py::chol.
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

        # L⁻¹ columns by forward substitution on e_j (n³/6 FMAs):
        # linv[j][i] = (L⁻¹)[i, j] for i ≥ j.
        linv = []
        for j in range(n):
            x = [None] * n
            x[j] = inv_diag[j]
            for i in range(j + 1, n):
                acc = cols[j][i] * x[j]
                for k in range(j + 1, i):
                    acc = acc + cols[k][i] * x[k]
                x[i] = -acc * inv_diag[i]
            linv.append(x)

        # A⁻¹ = L⁻ᵀ L⁻¹:  (A⁻¹)[i,j] = Σ_{k ≥ max(i,j)} linv[i][k]·linv[j][k]
        # — lower triangle computed once, mirrored into the output (n³/6).
        for i in range(n):
            for j in range(i + 1):
                acc = linv[i][i] * linv[j][i]
                for k in range(i + 1, n):
                    acc = acc + linv[i][k] * linv[j][k]
                out_ref[i, j] = acc
                if i != j:
                    out_ref[j, i] = acc

    return kernel


def _tri_indices(n: int):
    ii, jj = np.tril_indices(n)
    return ii, jj


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_psd_inverse(A, interpret: bool = False):
    """Inverse of a batch of symmetric positive-definite matrices.

    A: (B, n, n) f32 (extra leading dims are flattened).  Returns (B, n, n).
    B is padded to a multiple of 1024 internally (padded scenarios compute
    on the identity).  Numerics match ops/smallmat.psd_inverse.
    """
    batch = A.shape[:-2]
    n = A.shape[-1]
    dtype = A.dtype
    A = A.reshape((-1, n, n))
    B = A.shape[0]

    ii, jj = _tri_indices(n)
    P = ii.shape[0]
    Ap = A[:, ii, jj]                                  # (B, P)

    Bp = ((B + TILE - 1) // TILE) * TILE
    R = Bp // 128
    G = Bp // TILE

    # pad with the identity's lower triangle so padded lanes stay PD
    eye_tri = jnp.asarray(np.eye(n)[ii, jj], dtype)
    Ap = jnp.concatenate(
        [Ap, jnp.broadcast_to(eye_tri, (Bp - B, P))], axis=0
    )
    # (Bp, P) -> (P, R, 128)
    Apt = jnp.moveaxis(Ap.reshape(R, 128, P), (0, 1), (-2, -1))

    def spec(*lead):
        L = len(lead)
        return pl.BlockSpec(
            lead + (8, 128),
            (lambda i, L=L: (0,) * L + (i, 0)),
            memory_space=pltpu.VMEM,
        )

    out = pl.pallas_call(
        _make_kernel(n),
        grid=(G,),
        in_specs=[spec(P)],
        out_specs=spec(n, n),
        out_shape=jax.ShapeDtypeStruct((n, n, R, 128), dtype),
        interpret=interpret,
        # multi-tile grids double-buffer the (packed-in + full-out) blocks;
        # at n=39 that exceeds Mosaic's conservative 16 MB default scoped
        # limit (measured: 17.98M at G=4).  v5e has 128 MB VMEM.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
    )(Apt)

    out = jnp.moveaxis(out, (-2, -1), (0, 1)).reshape((Bp, n, n))[:B]
    return out.reshape(batch + (n, n))


def pallas_inv_eligible(M, min_batch: int = 256) -> bool:
    """True when a batched PSD inverse should route to the Pallas kernel:
    TPU backend, f32, n in [_MIN_N, _MAX_N], and a real leading batch (the
    kernel pads to 1024-lane tiles; tiny batches would waste the tile)."""
    import os

    if os.environ.get("DWBC_PALLAS_LINALG", "1") == "0":
        return False
    if M.dtype != jnp.float32:
        return False
    n = M.shape[-1]
    if not (_MIN_N <= n <= _MAX_N):
        return False
    bs = 1
    for s in M.shape[:-2]:
        bs *= s
    if bs < min_batch:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
