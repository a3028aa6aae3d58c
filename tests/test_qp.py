"""Unit tests for the batched fixed-iteration QP solver."""

import numpy as np
import pytest

import jax.numpy as jnp

from libdwbc_tpu.ops.qp import solve_qp


def _random_qp(rng, n, m, definite=True):
    Q = rng.standard_normal((n, n))
    H = Q @ Q.T + (1.0 if definite else 0.0) * np.eye(n)
    g = rng.standard_normal(n)
    A = rng.standard_normal((m, n))
    x0 = rng.standard_normal(n)
    ub = A @ x0 + rng.uniform(0.1, 2.0, m)
    lb = A @ x0 - rng.uniform(0.1, 2.0, m)
    return H, g, A, lb, ub


def _scipy_solve(H, g, A, lb, ub):
    from scipy.optimize import minimize

    cons = [
        {"type": "ineq", "fun": lambda x: ub - A @ x, "jac": lambda x: -A},
        {"type": "ineq", "fun": lambda x: A @ x - lb, "jac": lambda x: A},
    ]
    r = minimize(
        lambda x: 0.5 * x @ H @ x + g @ x,
        np.zeros(len(g)),
        jac=lambda x: H @ x + g,
        constraints=cons,
        method="SLSQP",
        options={"maxiter": 500, "ftol": 1e-12},
    )
    # SLSQP sometimes reports failure at its precision floor; the returned
    # point is still a usable comparison baseline.
    return r.x


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_matches_scipy(seed):
    rng = np.random.default_rng(seed)
    H, g, A, lb, ub = _random_qp(rng, 8, 14)
    sol = solve_qp(jnp.array(H), jnp.array(g), jnp.array(A), jnp.array(lb), jnp.array(ub))
    x_ref = _scipy_solve(H, g, A, lb, ub)
    obj = lambda x: 0.5 * x @ H @ x + g @ x
    assert obj(np.asarray(sol.x)) <= obj(x_ref) + 1e-7
    assert float(sol.primal_res) < 1e-8


def test_unconstrained_interior():
    """If the unconstrained optimum is interior, solver returns it exactly."""
    rng = np.random.default_rng(42)
    n = 6
    Q = rng.standard_normal((n, n))
    H = Q @ Q.T + np.eye(n)
    g = rng.standard_normal(n) * 0.01
    x_star = np.linalg.solve(H, -g)
    A = np.eye(n)
    lb = x_star - 10.0
    ub = x_star + 10.0
    sol = solve_qp(jnp.array(H), jnp.array(g), jnp.array(A), jnp.array(lb), jnp.array(ub))
    np.testing.assert_allclose(np.asarray(sol.x), x_star, atol=1e-8)


def test_infinite_bounds_masked():
    H = jnp.eye(2)
    g = jnp.array([1.0, -2.0])
    A = jnp.eye(2)
    lb = jnp.array([-1e30, 0.5])
    ub = jnp.array([1e30, 1e30])
    sol = solve_qp(H, g, A, lb, ub)
    np.testing.assert_allclose(np.asarray(sol.x), [-1.0, 2.0], atol=1e-8)


def test_batched():
    rng = np.random.default_rng(7)
    Hs, gs, As, lbs, ubs = [], [], [], [], []
    refs = []
    for s in range(4):
        H, g, A, lb, ub = _random_qp(np.random.default_rng(s + 100), 5, 8)
        Hs.append(H); gs.append(g); As.append(A); lbs.append(lb); ubs.append(ub)
        refs.append(_scipy_solve(H, g, A, lb, ub))
    sol = solve_qp(
        jnp.array(Hs), jnp.array(gs), jnp.array(As), jnp.array(lbs), jnp.array(ubs)
    )
    for i in range(4):
        H, g = Hs[i], gs[i]
        obj = lambda x: 0.5 * x @ H @ x + g @ x
        assert obj(np.asarray(sol.x[i])) <= obj(refs[i]) + 1e-6


def test_semidefinite_hessian():
    """H = diag(I, 0) like the reference task QPs (src/dwbc.cpp:990-991)."""
    rng = np.random.default_rng(11)
    n1, n2, m = 4, 3, 10
    H = np.zeros((n1 + n2, n1 + n2))
    H[:n1, :n1] = np.eye(n1)
    g = np.zeros(n1 + n2)
    A = rng.standard_normal((m, n1 + n2))
    x0 = rng.standard_normal(n1 + n2)
    ub = A @ x0 + rng.uniform(0.1, 1.0, m)
    lb = A @ x0 - rng.uniform(0.1, 1.0, m)
    sol = solve_qp(jnp.array(H), jnp.array(g), jnp.array(A), jnp.array(lb), jnp.array(ub))
    assert float(sol.primal_res) < 1e-8
    assert np.isfinite(np.asarray(sol.x)).all()


def test_warm_start():
    """Hot-start from a previous solution (the reference keeps persistent
    qpOASES objects for this, include/dwbc.h:222-228): a warm low-iteration
    solve on a perturbed problem converges where a cold one cannot."""
    rng = np.random.default_rng(21)
    H, g, A, lb, ub = _random_qp(rng, 10, 18)
    ref = solve_qp(jnp.array(H), jnp.array(g), jnp.array(A), jnp.array(lb), jnp.array(ub), iters=40)

    g2 = g + 0.01 * rng.standard_normal(10)
    ref2 = solve_qp(jnp.array(H), jnp.array(g2), jnp.array(A), jnp.array(lb), jnp.array(ub), iters=40)

    warm = solve_qp(
        jnp.array(H), jnp.array(g2), jnp.array(A), jnp.array(lb), jnp.array(ub),
        iters=4, warm=(ref.x, ref.lam),
    )
    err_warm = np.linalg.norm(np.asarray(warm.x) - np.asarray(ref2.x))
    assert err_warm < 1e-4
    assert float(warm.primal_res) < 1e-8
