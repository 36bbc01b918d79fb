"""LOBPCG solver tests — dense oracles (eigh / generalized eigh).

Net-new driver (the reference has no block/preconditioned/generalized
solver); oracles follow the suite convention: jnp/np.linalg on small
dense operators, Laplacian closed form where available."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

from eigenex_tpu.core.operators import LinearOperator, aslinearoperator
from eigenex_tpu.solvers.api import eigsh
from eigenex_tpu.solvers.lobpcg import LOBPCGOptions, LOBPCGSolver, lobpcg
from eigenex_tpu.utils.exceptions import LanczosError


def laplacian_dense(n, dtype=np.float64):
    A = 2.0 * np.eye(n) - np.eye(n, k=1) - np.eye(n, k=-1)
    return A.astype(dtype)


def laplacian_eigs(n, k):
    j = np.arange(1, k + 1)
    return 2.0 - 2.0 * np.cos(j * np.pi / (n + 1))


class TestLOBPCG:
    def test_lowest_laplacian_closed_form(self):
        n, k = 60, 4
        res = lobpcg(jnp.asarray(laplacian_dense(n)), k, tol=1e-12)
        assert res.converged and res.termination == "converged"
        np.testing.assert_allclose(res.eigenvalues, laplacian_eigs(n, k), atol=1e-10)
        # residual certificate ‖A x − λ x‖
        A = laplacian_dense(n)
        X = np.asarray(res.eigenvectors)
        r = A @ X - X * res.eigenvalues[None, :]
        assert np.linalg.norm(r, axis=0).max() < 1e-9

    def test_largest(self):
        n, k = 40, 3
        rng = np.random.default_rng(0)
        A = rng.standard_normal((n, n))
        A = (A + A.T) / 2
        res = lobpcg(jnp.asarray(A), k, largest=True, tol=1e-11)
        ref = np.linalg.eigvalsh(A)[::-1][:k]  # descending
        np.testing.assert_allclose(res.eigenvalues, ref, atol=1e-8)

    def test_generalized_vs_scipy(self):
        n, k = 36, 3
        rng = np.random.default_rng(1)
        A = rng.standard_normal((n, n))
        A = (A + A.T) / 2
        Bh = rng.standard_normal((n, n))
        B = Bh @ Bh.T + n * np.eye(n)
        res = lobpcg(jnp.asarray(A), k, B=jnp.asarray(B), tol=1e-12)
        ref = scipy.linalg.eigh(A, B, eigvals_only=True)[:k]
        np.testing.assert_allclose(res.eigenvalues, ref, atol=1e-9)
        # eigenvectors are B-orthonormal and satisfy A x = λ B x
        X = np.asarray(res.eigenvectors)
        np.testing.assert_allclose(X.T @ B @ X, np.eye(k), atol=1e-8)
        r = A @ X - (B @ X) * res.eigenvalues[None, :]
        assert np.linalg.norm(r, axis=0).max() < 1e-8

    def test_preconditioner_accelerates(self):
        # strongly graded diagonal + weak coupling: diagonal preconditioning
        # should converge in far fewer iterations
        n, k = 300, 2
        rng = np.random.default_rng(2)
        d = np.logspace(0, 5, n)
        A = np.diag(d) + 1e-3 * (lambda m: (m + m.T) / 2)(rng.standard_normal((n, n)))
        Aj = jnp.asarray(A)
        dinv = jnp.asarray(1.0 / d)

        plain = lobpcg(Aj, k, tol=1e-10, max_iterations=400, seed=3)
        prec = lobpcg(
            Aj, k, preconditioner=lambda R: dinv[:, None] * R,
            tol=1e-10, max_iterations=400, seed=3,
        )
        assert prec.converged
        ref = np.linalg.eigvalsh(A)[:k]
        np.testing.assert_allclose(prec.eigenvalues, ref, atol=1e-7 * d.max())
        assert prec.iterations < plain.iterations or not plain.converged

    def test_complex_hermitian(self):
        n, k = 32, 3
        rng = np.random.default_rng(4)
        A = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
        A = (A + A.conj().T) / 2
        res = lobpcg(jnp.asarray(A), k, tol=1e-12)
        np.testing.assert_allclose(res.eigenvalues, np.linalg.eigvalsh(A)[:k], atol=1e-9)

    def test_matrix_free_operator(self):
        n, k = 50, 3
        A = laplacian_dense(n)
        Aj = jnp.asarray(A)
        op = aslinearoperator(Aj)
        res = lobpcg(op, k, tol=1e-12)
        np.testing.assert_allclose(res.eigenvalues, laplacian_eigs(n, k), atol=1e-10)

    def test_initial_block_and_options_class(self):
        n, k = 40, 2
        A = jnp.asarray(laplacian_dense(n))
        rng = np.random.default_rng(5)
        X0 = jnp.asarray(rng.standard_normal((n, k)))
        solver = LOBPCGSolver(
            A, LOBPCGOptions(tolerance=1e-12), block_size=k
        ).set_initial_block(X0)
        res = solver.compute()
        assert res.converged
        np.testing.assert_allclose(res.eigenvalues, laplacian_eigs(n, k), atol=1e-10)

    def test_block_too_large_raises(self):
        A = jnp.asarray(laplacian_dense(8))
        with pytest.raises(LanczosError):
            lobpcg(A, 3)  # 3*3 > 8

    def test_numerical_failure_detected(self):
        n, k = 24, 2

        def bad_mv(_, x):
            return x * jnp.inf

        op = LinearOperator(bad_mv, None, (n, n), jnp.float64)
        res = lobpcg(op, k, max_iterations=10)
        assert not res.converged
        assert res.termination == "numerical_failure"
        assert res.trace.has_error()


class TestEigshGeneralizedRoute:
    def test_eigsh_with_M(self):
        n, k = 30, 3
        rng = np.random.default_rng(6)
        A = rng.standard_normal((n, n))
        A = (A + A.T) / 2
        Bh = rng.standard_normal((n, n))
        B = Bh @ Bh.T + n * np.eye(n)
        res = eigsh(jnp.asarray(A), k, M=jnp.asarray(B), tol=1e-12)
        ref = scipy.linalg.eigh(A, B, eigvals_only=True)[:k]
        np.testing.assert_allclose(res.eigenvalues, ref, atol=1e-9)

    def test_eigsh_M_la_ascending(self):
        n, k = 30, 3
        A = jnp.asarray(laplacian_dense(n))
        res = eigsh(A, k, which="LA", M=jnp.eye(n), tol=1e-11)
        ref = np.linalg.eigvalsh(np.asarray(A))[-k:]  # ascending tail
        np.testing.assert_allclose(res.eigenvalues, ref, atol=1e-8)

    def test_eigsh_M_sigma_rejected(self):
        from eigenex_tpu.utils.exceptions import EigenexError

        A = jnp.asarray(laplacian_dense(12))
        with pytest.raises(EigenexError):
            eigsh(A, 2, M=jnp.eye(12), sigma=0.5)


class TestJacobiPreconditioner:
    def test_diagonal_extraction_paths_agree(self):
        from eigenex_tpu.solvers.precond import _extract_diagonal
        from eigenex_tpu.sparse.bsr import bsr_from_dense
        from eigenex_tpu.sparse.coo import coo_from_dense
        from eigenex_tpu.sparse.sym_bsr import sym_bsr_from_bsr

        rng = np.random.default_rng(7)
        A = rng.standard_normal((16, 16))
        A = (A + A.T) / 2
        want = np.diagonal(A)
        np.testing.assert_allclose(_extract_diagonal(jnp.asarray(A)), want)
        np.testing.assert_allclose(_extract_diagonal(coo_from_dense(A)), want)
        bsr = bsr_from_dense(A, (4, 4))
        np.testing.assert_allclose(_extract_diagonal(bsr), want)
        np.testing.assert_allclose(
            _extract_diagonal(sym_bsr_from_bsr(bsr)), want, atol=1e-12
        )

    def test_coo_diagonal_sums_duplicates(self):
        from eigenex_tpu.sparse.coo import COOBuilder

        b = COOBuilder(3, 3)
        b.append(0, 0, 1.0).append(0, 0, 2.0).append(1, 2, 5.0).append(2, 2, 4.0)
        coo = b.build()
        np.testing.assert_allclose(coo.diagonal(), [3.0, 0.0, 4.0])

    def test_jacobi_in_lobpcg_via_eigsh(self):
        from eigenex_tpu.solvers.precond import jacobi_preconditioner
        from eigenex_tpu.sparse.coo import coo_from_dense

        n, k = 200, 2
        rng = np.random.default_rng(8)
        d = np.logspace(0, 4, n)
        A = np.diag(d) + 1e-3 * (lambda m: (m + m.T) / 2)(rng.standard_normal((n, n)))
        coo = coo_from_dense(A)
        T = jacobi_preconditioner(coo)
        res = eigsh(jnp.asarray(A), k, M=jnp.eye(n), preconditioner=T, tol=1e-10)
        np.testing.assert_allclose(
            res.eigenvalues, np.linalg.eigvalsh(A)[:k], atol=1e-6
        )

    def test_sigma_shift_and_zero_floor(self):
        from eigenex_tpu.solvers.precond import jacobi_preconditioner

        d = jnp.asarray([2.0, 0.0, -3.0])
        T = jacobi_preconditioner(d, sigma=0.0)
        np.testing.assert_allclose(T(jnp.ones(3)), [0.5, 1.0, -1 / 3])
        Ts = jacobi_preconditioner(d, sigma=2.0)
        got = np.asarray(Ts(jnp.ones(3)))
        np.testing.assert_allclose(got, [1.0, -0.5, -0.2])
