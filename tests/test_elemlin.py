"""elemlin (element-leading math core of the fused Pallas tick) vs the
golden-validated batch-leading kernels in ops/smallmat + numpy truth."""

import numpy as np


def _to_el(a):
    """batch-leading (B, ...) -> element-leading (..., B)."""
    import jax.numpy as jnp

    return jnp.moveaxis(jnp.asarray(a), 0, -1)


def _from_el(a):
    return np.moveaxis(np.asarray(a), -1, 0)


def test_products():
    from libdwbc_tpu.ops import elemlin as el

    rng = np.random.default_rng(0)
    B = 7
    A = rng.standard_normal((B, 5, 4))
    Bm = rng.standard_normal((B, 4, 6))
    x = rng.standard_normal((B, 4))
    y = rng.standard_normal((B, 5))

    np.testing.assert_allclose(_from_el(el.mm(_to_el(A), _to_el(Bm))), A @ Bm, atol=1e-12)
    np.testing.assert_allclose(
        _from_el(el.mmT(_to_el(A), _to_el(np.swapaxes(Bm, 1, 2)))), A @ Bm, atol=1e-12
    )
    np.testing.assert_allclose(
        _from_el(el.mTm(_to_el(np.swapaxes(A, 1, 2)), _to_el(Bm))), A @ Bm, atol=1e-12
    )
    np.testing.assert_allclose(
        _from_el(el.mv(_to_el(A), _to_el(x))), (A @ x[..., None])[..., 0], atol=1e-12
    )
    np.testing.assert_allclose(
        _from_el(el.mTv(_to_el(A), _to_el(y))),
        (np.swapaxes(A, 1, 2) @ y[..., None])[..., 0], atol=1e-12,
    )
    a3 = rng.standard_normal((B, 3))
    b3 = rng.standard_normal((B, 3))
    np.testing.assert_allclose(
        _from_el(el.cross(_to_el(a3), _to_el(b3))), np.cross(a3, b3), atol=1e-12
    )


def test_chol_inverse_health():
    from libdwbc_tpu.ops import elemlin as el
    from libdwbc_tpu.ops import smallmat as sm
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    B, n = 5, 13
    M = rng.standard_normal((B, n, n))
    A = M @ np.swapaxes(M, 1, 2) + n * np.eye(n)

    L_el = _from_el(el.chol(_to_el(A)))
    L_sm = np.asarray(sm.chol(jnp.asarray(A)))
    np.testing.assert_allclose(L_el, L_sm, atol=1e-10)

    Ainv = _from_el(el.psd_inverse(_to_el(A)))
    np.testing.assert_allclose(Ainv, np.linalg.inv(A), atol=1e-8)

    h = _from_el(el.chol_health(_to_el(A)))
    d = np.abs(np.diagonal(L_sm, axis1=-2, axis2=-1))
    np.testing.assert_allclose(h, d.min(-1) / d.max(-1), atol=1e-10)

    b = rng.standard_normal((B, n))
    x = _from_el(el.cho_solve_vec(el.chol(_to_el(A)), _to_el(b)))
    np.testing.assert_allclose(x, np.linalg.solve(A, b[..., None])[..., 0], atol=1e-8)


def test_qr_and_completion():
    from libdwbc_tpu.ops import elemlin as el
    from libdwbc_tpu.ops import smallmat as sm
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    B, m, k = 4, 12, 6
    A = rng.standard_normal((B, m, k))

    Q_el = _from_el(el.qr_thin(_to_el(A)))
    Q_sm = np.asarray(sm.qr_thin(jnp.asarray(A)))
    np.testing.assert_allclose(Q_el, Q_sm, atol=1e-10)

    F_el = _from_el(el.complete_basis(_to_el(A)))
    F_sm = np.asarray(sm.complete_basis(jnp.asarray(A)))
    np.testing.assert_allclose(F_el, F_sm, atol=1e-9)

    Ms = rng.standard_normal((B, 6, 6))
    P_el = _from_el(el.qr_pinv(_to_el(Ms)))
    P_sm = np.asarray(sm.qr_pinv(jnp.asarray(Ms)))
    np.testing.assert_allclose(P_el, P_sm, atol=1e-9)
    # and it really inverts
    np.testing.assert_allclose(P_el @ Ms, np.broadcast_to(np.eye(6), (B, 6, 6)), atol=1e-7)
