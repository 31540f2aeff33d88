import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sunode_tpu.ops.linalg import (
    lu_factor,
    lu_solve,
    solve_dense,
    factor_newton,
    solve_factored,
)


@pytest.mark.parametrize("n", [1, 2, 3, 4, 7, 16, 33])
def test_solve_dense_random(n):
    rng = np.random.default_rng(n)
    A = rng.standard_normal((n, n)) + n * np.eye(n)
    b = rng.standard_normal(n)
    x = solve_dense(jnp.array(A), jnp.array(b))
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(A, b), rtol=1e-10)


@pytest.mark.parametrize("n", [4, 9, 20])
def test_lu_factor_needs_pivoting(n):
    # zero diagonal forces pivoting
    rng = np.random.default_rng(n + 100)
    A = rng.standard_normal((n, n))
    np.fill_diagonal(A, 0.0)
    A += np.diag(np.ones(n - 1), 1)  # keep it nonsingular-ish
    if abs(np.linalg.det(A)) < 1e-8:
        A += 0.5 * np.eye(n, k=-1)
    b = rng.standard_normal(n)
    LU, piv = lu_factor(jnp.array(A))
    x = lu_solve(LU, piv, jnp.array(b))
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(A, b), rtol=1e-8, atol=1e-10)


def test_solve_vmap():
    rng = np.random.default_rng(0)
    A = rng.standard_normal((64, 5, 5)) + 5 * np.eye(5)
    b = rng.standard_normal((64, 5))
    x = jax.vmap(solve_dense)(jnp.array(A), jnp.array(b))
    expected = np.linalg.solve(A, b[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(x), expected, rtol=1e-9)


def test_solve_tiny_vmap_closed_form():
    rng = np.random.default_rng(1)
    A = rng.standard_normal((128, 2, 2)) + 3 * np.eye(2)
    b = rng.standard_normal((128, 2))
    x = jax.vmap(solve_dense)(jnp.array(A), jnp.array(b))
    expected = np.linalg.solve(A, b[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(x), expected, rtol=1e-10)


def test_factor_then_solve_many():
    rng = np.random.default_rng(2)
    for n in [2, 8]:
        A = rng.standard_normal((n, n)) + n * np.eye(n)
        factors = factor_newton(jnp.array(A))
        for _ in range(3):
            b = rng.standard_normal(n)
            x = solve_factored(factors, jnp.array(b))
            np.testing.assert_allclose(np.asarray(x), np.linalg.solve(A, b), rtol=1e-9)


def test_singular_yields_nonfinite_not_crash():
    A = jnp.zeros((4, 4))
    b = jnp.ones(4)
    x = solve_dense(A, b)
    assert not np.isfinite(np.asarray(x)).all()


def test_f64_precision():
    # needs genuine f64: condition number ~1e7 would lose everything in f32
    n = 6
    U = np.triu(np.ones((n, n)))
    D = np.diag(np.logspace(0, -7, n))
    A = U @ D @ U.T
    x_true = np.ones(n)
    b = A @ x_true
    x = solve_dense(jnp.array(A), jnp.array(b))
    np.testing.assert_allclose(np.asarray(x), x_true, rtol=1e-6)
    assert np.asarray(x).dtype == np.float64


def test_jit_under_while_loop():
    # factors must be carry-compatible (fixed pytree structure)
    A = jnp.eye(5) * 2.0
    factors = factor_newton(A)

    def body(i, val):
        x = solve_factored(factors, val)
        return x

    out = jax.lax.fori_loop(0, 3, body, jnp.ones(5))
    np.testing.assert_allclose(np.asarray(out), np.ones(5) / 8.0)
