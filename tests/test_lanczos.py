"""Lanczos solver tests.

Oracles per SURVEY.md §4: dense ``numpy.linalg.eigh``, the closed-form
1D Laplacian spectrum λ_k = 2 − 2cos(kπ/(n+1)), and the residual
invariants ‖A x − λ x‖ ≤ tol, ‖V†V − I‖ ≤ tol."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eigenex_tpu import (
    LanczosEigenSolver,
    LanczosOptions,
    aslinearoperator,
    init_lanczos_state,
    lanczos_steps,
)
from eigenex_tpu.utils.prng import random_hermitian


def laplacian_1d(n, dtype=jnp.float64):
    """Dense 1D Laplacian (tridiagonal 2,-1); closed-form eigenvalues
    2 - 2cos(kπ/(n+1)), k=1..n."""
    A = 2 * np.eye(n) - np.eye(n, k=1) - np.eye(n, k=-1)
    return jnp.asarray(A, dtype)


def laplacian_eigs(n, k):
    return np.array([2 - 2 * np.cos((i + 1) * np.pi / (n + 1)) for i in range(k)])


class TestLanczosBasis:
    def test_basis_orthonormal_and_tridiagonal(self, key):
        n, m = 40, 20
        A = random_hermitian(key, n, jnp.float64)
        op = aslinearoperator(A)
        state = init_lanczos_state(op, m, seed=1)
        state = lanczos_steps(op, state, m)
        k = int(state.k)
        assert k == m
        V = np.asarray(state.V[: k + 1])
        np.testing.assert_allclose(V @ V.T, np.eye(k + 1), atol=1e-12)
        # V A V^T must equal tridiag(alpha, beta) on the first k rows
        T = V[:k] @ np.asarray(A) @ V[:k].T
        alpha = np.asarray(state.alpha[:k])
        beta = np.asarray(state.beta[:k])
        Texp = np.diag(alpha) + np.diag(beta[: k - 1], 1) + np.diag(beta[: k - 1], -1)
        np.testing.assert_allclose(T, Texp, atol=1e-11)

    def test_breakdown_on_invariant_subspace(self):
        # start in an exact 2-dim invariant subspace of a diagonal matrix
        A = jnp.diag(jnp.array([1.0, 2.0, 3.0, 4.0]))
        op = aslinearoperator(A)
        v0 = jnp.array([1.0, 1.0, 0.0, 0.0]) / np.sqrt(2)
        state = init_lanczos_state(op, 4, v0=v0)
        state = lanczos_steps(op, state, 4)
        assert bool(state.breakdown)
        assert int(state.k) == 2  # subspace exhausted after 2 steps


class TestLanczosEigenSolver:
    def test_dense_oracle(self, key):
        n = 60
        A = random_hermitian(key, n, jnp.float64)
        ref = np.linalg.eigvalsh(np.asarray(A))
        res = LanczosEigenSolver(
            A, LanczosOptions(max_eigenvalues=3, tolerance=1e-12, seed=3)
        ).compute()
        np.testing.assert_allclose(res.eigenvalues, ref[:3], atol=1e-9)
        assert res.converged

    def test_laplacian_closed_form(self):
        # the low Laplacian eigenvalues are clustered (λ_k ~ k²π²/n²), so
        # 1e-10 accuracy needs the full Krylov subspace — use n = m = 100
        n = 100
        A = laplacian_1d(n)
        res = LanczosEigenSolver(
            A, LanczosOptions(max_eigenvalues=5, tolerance=1e-14, max_subspace=n, seed=0)
        ).compute()
        np.testing.assert_allclose(res.eigenvalues, laplacian_eigs(n, 5), atol=1e-10)

    def test_residual_invariant(self, key):
        n = 50
        A = random_hermitian(key, n, jnp.float64)
        op = aslinearoperator(A)
        res = LanczosEigenSolver(op, LanczosOptions(max_eigenvalues=4, seed=5)).compute()
        assert np.all(res.residual_norms(op) < 1e-8)
        # eigenvector orthonormality
        X = np.asarray(res.eigenvectors)
        np.testing.assert_allclose(X.T @ X, np.eye(4), atol=1e-10)

    def test_largest_eigenvalues_negative_indices(self, key):
        n = 50
        A = random_hermitian(key, n, jnp.float64)
        ref = np.linalg.eigvalsh(np.asarray(A))
        res = LanczosEigenSolver(
            A,
            LanczosOptions(eigenvalue_indices=(-2, -1), max_eigenvalues=2, seed=2),
        ).compute()
        np.testing.assert_allclose(res.eigenvalues, ref[-2:], atol=1e-9)

    def test_eigenvalue_shift_is_transparent(self, key):
        n = 40
        A = random_hermitian(key, n, jnp.float64)
        ref = np.linalg.eigvalsh(np.asarray(A))[:2]
        res = (
            LanczosEigenSolver(A)
            .set_max_eigenvalues(2)
            .set_eigenvalue_shift(7.5)
            .set_seed(4)
            .compute()
        )
        np.testing.assert_allclose(res.eigenvalues, ref, atol=1e-9)

    def test_complex_hermitian(self, key):
        n = 40
        A = random_hermitian(key, n, jnp.complex128)
        ref = np.linalg.eigvalsh(np.asarray(A))
        op = aslinearoperator(A)
        res = LanczosEigenSolver(op, LanczosOptions(max_eigenvalues=3, seed=1)).compute()
        np.testing.assert_allclose(res.eigenvalues, ref[:3], atol=1e-9)
        assert np.all(res.residual_norms(op) < 1e-8)

    def test_deflation_orthogonalizing_vectors(self, key):
        """Deflating the ground state must converge to the next eigenpair
        (cf. orthogonalizingVectors lanczos.hpp:153,312-314,421-425)."""
        n = 40
        A = random_hermitian(key, n, jnp.float64)
        evals, evecs = np.linalg.eigh(np.asarray(A))
        res = (
            LanczosEigenSolver(A, LanczosOptions(max_eigenvalues=1, seed=7))
            .set_orthogonalizing_vectors(jnp.asarray(evecs[:, :1].T))
            .compute()
        )
        np.testing.assert_allclose(res.eigenvalues[0], evals[1], atol=1e-9)

    def test_continue_to_compute(self, key):
        n = 80
        A = random_hermitian(key, n, jnp.float64)
        ref = np.linalg.eigvalsh(np.asarray(A))
        solver = LanczosEigenSolver(
            A, LanczosOptions(max_eigenvalues=2, max_subspace=6, tolerance=1e-13, seed=6)
        )
        r1 = solver.compute()
        assert r1.termination == "max_iterations"
        # resume with a larger subspace — basis/α/β retained (lanczos.hpp:696-712)
        solver.set_max_subspace(60)
        r2 = solver.continue_to_compute()
        assert r2.iterations > r1.iterations
        np.testing.assert_allclose(r2.eigenvalues, ref[:2], atol=1e-9)

    def test_termination_full_subspace(self):
        A = laplacian_1d(8)
        res = LanczosEigenSolver(
            A, LanczosOptions(max_eigenvalues=1, tolerance=0.0, max_subspace=8, seed=0)
        ).compute()
        assert res.termination in ("full_subspace", "breakdown")
        np.testing.assert_allclose(res.eigenvalues[0], laplacian_eigs(8, 1)[0], atol=1e-10)

    def test_initial_vector_breakdown_raises(self):
        from eigenex_tpu.utils.exceptions import LanczosError

        A = laplacian_1d(6)
        with pytest.raises(LanczosError):
            LanczosEigenSolver(A).set_initial_vector(jnp.zeros(6)).compute()

    def test_trace_recorded(self, key):
        A = random_hermitian(key, 30, jnp.float64)
        solver = LanczosEigenSolver(A, LanczosOptions(max_eigenvalues=1, seed=0))
        res = solver.compute()
        assert len(res.trace.iterations) >= 2
        assert not res.trace.has_error()
        hist = res.trace.ritz_history(0)
        assert hist.shape[0] >= 1

    def test_float32_tolerance_default(self, key):
        n = 30
        A = random_hermitian(key, n, jnp.float32)
        ref = np.linalg.eigvalsh(np.asarray(A, np.float64))
        res = LanczosEigenSolver(A, LanczosOptions(max_eigenvalues=1, seed=0)).compute()
        np.testing.assert_allclose(res.eigenvalues[0], ref[0], atol=1e-3)
