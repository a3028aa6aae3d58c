"""Pallas PSD-inverse megakernel parity (interpret mode, CPU).

The kernel replaces ops/smallmat.psd_inverse for large TPU batches in
``Kinematics.update`` (A⁻¹) and ``contact_space`` (W⁻¹) — the reference's
per-robot ``A_.inverse()`` (src/dwbc.cpp:305-312).  Same algorithm, same
pivot clamp; parity here is against f64 numpy ground truth AND the
unrolled f32 path it substitutes."""

import numpy as np
import pytest


def _random_spd(rng, B, n, cond=1e3):
    M = rng.standard_normal((B, n, n))
    U, _ = np.linalg.qr(M)
    # eigenvalues log-spaced over the requested condition number
    ev = np.logspace(0, np.log10(cond), n)[None, :]
    return (U * ev[:, None, :]) @ np.swapaxes(U, -1, -2)


@pytest.mark.parametrize("n", [6, 20])
def test_psd_inverse_parity(n):
    # n capped at 20 here: interpret mode compiles the unrolled kernel as a
    # plain XLA graph and n=39 takes minutes on CPU.  The kernel body is
    # size-generic (same generated loops); the tick-size instances (33/39)
    # are exercised on real TPU by bench.py / profile_prestages.py.
    import jax.numpy as jnp

    from libdwbc_tpu.ops import smallmat as sm
    from libdwbc_tpu.ops.pallas_linalg import pallas_psd_inverse

    rng = np.random.default_rng(0)
    B = 32
    A64 = _random_spd(rng, B, n)
    A32 = jnp.asarray(A64, jnp.float32)

    out = np.asarray(pallas_psd_inverse(A32, interpret=True), np.float64)
    ref = np.linalg.inv(A64)

    # f64 ground truth: error budget is the f32 conditioning limit
    scale = np.abs(ref).max()
    assert np.abs(out - ref).max() / scale < 5e-4

    # and bit-level-comparable to the unrolled f32 path it replaces
    unrolled = np.asarray(sm.psd_inverse(A32), np.float64)
    assert np.abs(out - unrolled).max() / scale < 2e-5

    # symmetry is exact by construction (mirrored writes)
    assert np.abs(out - np.swapaxes(out, -1, -2)).max() == 0.0


def test_eligibility_gate():
    import jax.numpy as jnp

    from libdwbc_tpu.ops.pallas_linalg import pallas_inv_eligible

    A = jnp.zeros((1024, 33, 33), jnp.float32)
    # CPU test env: must NOT route to the kernel (backend gate)
    assert not pallas_inv_eligible(A) or False  # no exception path
    # f64 and tiny-n always refuse regardless of backend
    assert not pallas_inv_eligible(jnp.zeros((1024, 33, 33), jnp.float64))
    assert not pallas_inv_eligible(jnp.zeros((1024, 6, 6), jnp.float32))
    assert not pallas_inv_eligible(jnp.zeros((4, 33, 33), jnp.float32))
