"""Batched small-matrix kernels vs lax.linalg reference."""

import numpy as np
import pytest

import jax.numpy as jnp

from libdwbc_tpu.ops import smallmat as sm


@pytest.mark.parametrize("n", [3, 12, 39])
def test_chol_matches_numpy(n):
    rng = np.random.default_rng(n)
    B = 5
    A = rng.standard_normal((B, n, n))
    A = A @ np.swapaxes(A, -1, -2) + n * np.eye(n)
    L = np.asarray(sm.chol(jnp.array(A)))
    ref = np.linalg.cholesky(A)
    assert np.abs(L - ref).max() < 1e-9


def test_solves():
    rng = np.random.default_rng(0)
    n, m, B = 10, 4, 3
    A = rng.standard_normal((B, n, n))
    A = A @ np.swapaxes(A, -1, -2) + n * np.eye(n)
    rhs = rng.standard_normal((B, n, m))
    X = np.asarray(sm.psd_solve(jnp.array(A), jnp.array(rhs)))
    assert np.abs(A @ X - rhs).max() < 1e-8
    Ainv = np.asarray(sm.psd_inverse(jnp.array(A)))
    assert np.abs(A @ Ainv - np.eye(n)).max() < 1e-8
    # vector rhs
    x = np.asarray(sm.psd_solve(jnp.array(A), jnp.array(rhs[..., 0])))
    assert np.abs(A @ x[..., None] - rhs[..., :1]).max() < 1e-8


def test_qr_thin():
    rng = np.random.default_rng(1)
    A = rng.standard_normal((4, 33, 6))
    Q = np.asarray(sm.qr_thin(jnp.array(A)))
    QtQ = np.swapaxes(Q, -1, -2) @ Q
    assert np.abs(QtQ - np.eye(6)).max() < 1e-10
    # col space preserved: projection of A onto Q equals A
    proj = Q @ (np.swapaxes(Q, -1, -2) @ A)
    assert np.abs(proj - A).max() < 1e-9


def test_complete_basis():
    rng = np.random.default_rng(2)
    A = rng.standard_normal((3, 12, 6))
    Qf = np.asarray(sm.complete_basis(jnp.array(A)))
    assert np.abs(np.swapaxes(Qf, -1, -2) @ Qf - np.eye(12)).max() < 1e-8
    # last 6 columns orthogonal to col(A)
    N = Qf[..., :, 6:]
    assert np.abs(np.swapaxes(N, -1, -2) @ A).max() < 1e-8


def test_qr_inv():
    import jax.numpy as jnp
    rng = np.random.default_rng(5)
    M = rng.standard_normal((4, 9, 9))
    # make one batch member ill-conditioned (cond ~1e6)
    U, s, Vt = np.linalg.svd(M[0])
    s = np.geomspace(1.0, 1e-6, 9)
    M[0] = (U * s) @ Vt
    Minv = np.asarray(sm.qr_inv(jnp.array(M)))
    err = np.abs(Minv @ M - np.eye(9)).max()
    assert err < 1e-7  # inv_via_normal would lose ~12 digits on cond 1e6


def test_qr_pinv_rank_deficient():
    import jax.numpy as jnp
    rng = np.random.default_rng(6)
    M = rng.standard_normal((8, 8))
    M[:, -1] = M[:, 0] + M[:, 1]  # exactly singular, rank 7
    P = np.asarray(sm.qr_pinv(jnp.array(M)))
    assert np.isfinite(P).all()
    # P acts as the inverse on the live subspace: M P M ≈ M
    np.testing.assert_allclose(M @ P @ M, M, atol=1e-8)


def test_inv_via_normal():
    rng = np.random.default_rng(3)
    M = rng.standard_normal((4, 6, 6)) + 3 * np.eye(6)
    Minv = np.asarray(sm.inv_via_normal(jnp.array(M)))
    assert np.abs(M @ Minv - np.eye(6)).max() < 1e-6
