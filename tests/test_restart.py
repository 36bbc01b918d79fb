"""Thick-restart Lanczos tests — the clustered-spectrum cases where the
plain solver needs the full subspace."""

import jax.numpy as jnp
import numpy as np
import pytest

from eigenex_tpu.solvers.restart import (
    ThickRestartLanczosEigenSolver,
    ThickRestartOptions,
)
from eigenex_tpu.utils.prng import random_hermitian


def laplacian_1d(n):
    return jnp.asarray(2 * np.eye(n) - np.eye(n, k=1) - np.eye(n, k=-1))


class TestThickRestart:
    def test_laplacian_small_subspace(self):
        """n=400 Laplacian lowest pairs to 1e-9 with only a 40-dim basis —
        plain Lanczos needs ~n iterations held in memory for this."""
        n = 400
        A = laplacian_1d(n)
        res = ThickRestartLanczosEigenSolver(
            A,
            ThickRestartOptions(
                max_eigenvalues=4, tolerance=1e-12, max_subspace=40, seed=0,
                max_restarts=400,
            ),
        ).compute()
        exact = np.array([2 - 2 * np.cos((k + 1) * np.pi / (n + 1)) for k in range(4)])
        assert res.converged, res.termination
        np.testing.assert_allclose(res.eigenvalues, exact, atol=1e-9)

    def test_matches_dense_oracle(self, key):
        n = 120
        A = random_hermitian(key, n, jnp.float64)
        ref = np.linalg.eigvalsh(np.asarray(A))
        res = ThickRestartLanczosEigenSolver(
            A, ThickRestartOptions(max_eigenvalues=3, tolerance=1e-12, max_subspace=30, seed=1)
        ).compute()
        assert res.converged
        np.testing.assert_allclose(res.eigenvalues, ref[:3], atol=1e-8)
        X = np.asarray(res.eigenvectors)
        np.testing.assert_allclose(X.T @ X, np.eye(3), atol=1e-8)
        r = np.asarray(A) @ X - X * res.eigenvalues[None, :]
        assert np.linalg.norm(r, axis=0).max() < 1e-7

    def test_largest_pairs(self, key):
        n = 100
        A = random_hermitian(key, n, jnp.float64)
        ref = np.linalg.eigvalsh(np.asarray(A))
        res = ThickRestartLanczosEigenSolver(
            A,
            ThickRestartOptions(
                max_eigenvalues=2, eigenvalue_indices=(-2, -1), tolerance=1e-12,
                max_subspace=24, seed=2,
            ),
        ).compute()
        assert res.converged
        np.testing.assert_allclose(res.eigenvalues, ref[-2:], atol=1e-8)

    def test_memory_bounded_beats_plain(self):
        """With the same small subspace, plain Lanczos stalls at
        max_iterations while TRLM converges."""
        from eigenex_tpu.solvers.lanczos import LanczosEigenSolver, LanczosOptions

        n = 300
        A = laplacian_1d(n)
        plain = LanczosEigenSolver(
            A, LanczosOptions(max_eigenvalues=2, tolerance=1e-12, max_subspace=30, seed=0)
        ).compute()
        trlm = ThickRestartLanczosEigenSolver(
            A,
            ThickRestartOptions(
                max_eigenvalues=2, tolerance=1e-12, max_subspace=30, seed=0, max_restarts=300
            ),
        ).compute()
        exact = np.array([2 - 2 * np.cos((k + 1) * np.pi / (n + 1)) for k in range(2)])
        assert trlm.converged
        np.testing.assert_allclose(trlm.eigenvalues, exact, atol=1e-9)
        plain_err = np.abs(plain.eigenvalues - exact).max()
        trlm_err = np.abs(trlm.eigenvalues - exact).max()
        assert trlm_err < plain_err * 1e-2  # orders of magnitude better
