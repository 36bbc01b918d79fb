"""GMRES tests: nonsymmetric solves + shift-invert Arnoldi for interior
eigenvalues of a general operator."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eigenex_tpu.core.operators import aslinearoperator
from eigenex_tpu.solvers.arnoldi import ArnoldiEigenSolver, ArnoldiOptions
from eigenex_tpu.solvers.gmres import (
    gmres_solve,
    gmres_solve_jit,
    shift_invert_operator_general,
)
from eigenex_tpu.utils.prng import random_matrix, random_vector


@pytest.fixture
def system(key):
    n = 50
    A = random_matrix(key, n, n, jnp.float64) + 8 * jnp.eye(n)  # well-conditioned
    b = random_vector(jax.random.fold_in(key, 1), n, jnp.float64)
    return A, b


def test_gmres_host(system):
    A, b = system
    x, rel, cycles = gmres_solve(A, b, tol=1e-12, restart=25)
    np.testing.assert_allclose(np.asarray(A) @ np.asarray(x), b, atol=1e-9)
    assert rel <= 1e-12


def test_gmres_jit(system):
    A, b = system
    x = gmres_solve_jit(A, b, restart=25, cycles=4)
    np.testing.assert_allclose(np.asarray(A) @ np.asarray(x), b, atol=1e-9)


def test_gmres_jit_under_jit(system):
    A, b = system
    op = aslinearoperator(A)
    f = jax.jit(lambda o, rhs: gmres_solve_jit(o, rhs, restart=25, cycles=4))
    x = f(op, b)
    np.testing.assert_allclose(np.asarray(A) @ np.asarray(x), b, atol=1e-9)


def test_gmres_nonsymmetric(key):
    """Convection-diffusion-like strongly nonsymmetric system."""
    n = 64
    A = (
        2 * np.eye(n)
        - 1.4 * np.eye(n, k=1)
        - 0.6 * np.eye(n, k=-1)
    )
    b = np.ones(n)
    x, rel, _ = gmres_solve(jnp.asarray(A), jnp.asarray(b), tol=1e-12, restart=32)
    np.testing.assert_allclose(A @ np.asarray(x), b, atol=1e-8)


def test_shift_invert_arnoldi_interior(key):
    """Interior eigenvalue of a nonsymmetric matrix via shift-invert
    Arnoldi: the eigenvalue nearest σ dominates (A−σI)⁻¹."""
    n = 40
    rng = np.random.default_rng(3)
    evals = np.sort(rng.uniform(-5, 5, n))
    X = rng.standard_normal((n, n))
    A = jnp.asarray(X @ np.diag(evals) @ np.linalg.inv(X))
    target = evals[n // 2]
    sigma = target + 0.05 * (evals[n // 2 + 1] - target)
    si = shift_invert_operator_general(A, sigma, restart=40, cycles=6)
    res = ArnoldiEigenSolver(
        si, ArnoldiOptions(max_eigenvalues=1, tolerance=1e-10, max_subspace=25, seed=0)
    ).compute()
    theta = res.eigenvalues[0]
    lam = sigma + 1.0 / theta
    np.testing.assert_allclose(np.real(lam), target, atol=1e-6)
