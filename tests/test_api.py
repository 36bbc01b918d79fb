"""One-call front-end tests (eigsh/eigs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from eigenex_tpu.solvers.api import eigs, eigsh
from eigenex_tpu.utils.prng import random_hermitian, random_matrix
from eigenex_tpu.utils.exceptions import EigenexError


def test_eigsh_smallest(key):
    n = 80
    A = random_hermitian(key, n, jnp.float64)
    ref = np.linalg.eigvalsh(np.asarray(A))
    res = eigsh(A, k=3, which="SA", tol=1e-12)
    np.testing.assert_allclose(res.eigenvalues, ref[:3], atol=1e-8)


def test_eigsh_largest(key):
    n = 80
    A = random_hermitian(key, n, jnp.float64)
    ref = np.linalg.eigvalsh(np.asarray(A))
    res = eigsh(A, k=2, which="LA", tol=1e-12)
    np.testing.assert_allclose(res.eigenvalues, ref[-2:], atol=1e-8)


def test_eigsh_restarted_small_subspace():
    n = 300
    A = jnp.asarray(2 * np.eye(n) - np.eye(n, k=1) - np.eye(n, k=-1))
    res = eigsh(A, k=2, which="SA", tol=1e-12, max_subspace=30, max_restarts=300)
    exact = [2 - 2 * np.cos((j + 1) * np.pi / (n + 1)) for j in range(2)]
    np.testing.assert_allclose(res.eigenvalues, exact, atol=1e-9)


def test_eigsh_sigma_targets_interior(key):
    n = 60
    A = random_hermitian(key, n, jnp.float64)
    ref = np.linalg.eigvalsh(np.asarray(A))
    target = float(ref[n // 2])
    sigma = target - 1e-3
    res = eigsh(A, k=1, sigma=sigma, tol=1e-10, max_subspace=30)
    np.testing.assert_allclose(res.eigenvalues[0], target, atol=1e-7)


def test_eigs_dominant(key):
    n = 70
    A = random_matrix(key, n, n, jnp.float64)
    ref = np.linalg.eigvals(np.asarray(A))
    ref = ref[np.argsort(-np.abs(ref))]
    res = eigs(A, k=2, tol=1e-9, max_subspace=40)
    np.testing.assert_allclose(
        np.sort(np.abs(res.eigenvalues)), np.sort(np.abs(ref[:2])), atol=1e-6
    )


def test_which_validation(key):
    with pytest.raises(EigenexError):
        eigsh(random_hermitian(key, 4, jnp.float64), k=1, which="SM")


def test_eigsh_sigma_nearest_below(key):
    """Review regression: the nearest eigenvalue lying BELOW sigma has a
    large NEGATIVE theta — tracking only the algebraic top of the
    shift-inverted spectrum missed it."""
    import jax

    A = random_hermitian(jax.random.PRNGKey(5), 60, jnp.float64)
    ref = np.linalg.eigvalsh(np.asarray(A))
    gap = ref[31] - ref[30]
    sigma = float(ref[30] + 0.1 * gap)  # nearest eigenvalue is below sigma
    res = eigsh(A, k=3, sigma=sigma, tol=1e-10, max_subspace=40)
    near = np.sort(ref[np.argsort(np.abs(ref - sigma))[:3]])
    np.testing.assert_allclose(np.sort(res.eigenvalues), near, atol=1e-8)
