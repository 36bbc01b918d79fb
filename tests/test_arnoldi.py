"""Arnoldi solver tests — oracled against dense numpy.linalg.eig and the
reference's acceptance identity ‖A·P − P·D‖ ≈ 0 (sample_arnoldi.cpp:42-52,
arnoldi_test.cpp:85-89)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eigenex_tpu.core.operators import aslinearoperator
from eigenex_tpu.solvers.arnoldi import (
    ArnoldiEigenSolver,
    ArnoldiOptions,
    arnoldi_steps,
    init_arnoldi_state,
)
from eigenex_tpu.utils.prng import random_matrix


def sort_desc(v):
    return v[np.argsort(-np.abs(v), kind="stable")]


class TestArnoldiBasis:
    def test_arnoldi_relation(self, key):
        """A V_k = V_{k+1} H_k (the Arnoldi decomposition) and V†V = I."""
        n, m = 30, 15
        A = random_matrix(key, n, n, jnp.float64)
        op = aslinearoperator(A)
        state = init_arnoldi_state(op, m, seed=1)
        state = arnoldi_steps(op, state, m)
        k = int(state.k)
        assert k == m
        V = np.asarray(state.V)  # (m+1, n)
        H = np.asarray(state.H)  # (m+1, m)
        np.testing.assert_allclose(V @ V.T, np.eye(m + 1), atol=1e-12)
        np.testing.assert_allclose(np.asarray(A) @ V[:k].T, V.T @ H[:, :k], atol=1e-11)

    def test_hessenberg_structure(self, key):
        n, m = 20, 10
        A = random_matrix(key, n, n, jnp.float64)
        op = aslinearoperator(A)
        state = arnoldi_steps(op, init_arnoldi_state(op, m, seed=0), m)
        H = np.asarray(state.H[:m, :m])
        # strictly-lower part below the first subdiagonal must vanish
        assert np.allclose(np.tril(H, -2), 0, atol=1e-13)


class TestArnoldiEigenSolver:
    def test_dense_oracle_real(self, key):
        n = 50
        A = random_matrix(key, n, n, jnp.float64)
        ref = sort_desc(np.linalg.eigvals(np.asarray(A)))
        res = ArnoldiEigenSolver(
            A, ArnoldiOptions(max_eigenvalues=4, tolerance=1e-12, max_subspace=n, seed=3)
        ).compute()
        np.testing.assert_allclose(
            np.sort_complex(res.eigenvalues), np.sort_complex(ref[:4]), atol=1e-8
        )

    def test_residual_identity(self, key):
        """‖A·P − P·D‖ ≈ 0 — the reference's own acceptance check."""
        n = 50
        A = random_matrix(key, n, n, jnp.float64)
        op = aslinearoperator(A)
        res = ArnoldiEigenSolver(
            op, ArnoldiOptions(max_eigenvalues=4, tolerance=1e-12, max_subspace=n, seed=5)
        ).compute()
        assert np.all(res.residual_norms(op) < 1e-7)

    def test_complex_operator(self, key):
        n = 40
        A = random_matrix(key, n, n, jnp.complex128)
        ref = sort_desc(np.linalg.eigvals(np.asarray(A)))
        op = aslinearoperator(A)
        res = ArnoldiEigenSolver(
            op, ArnoldiOptions(max_eigenvalues=3, tolerance=1e-12, max_subspace=n, seed=1)
        ).compute()
        np.testing.assert_allclose(
            np.sort_complex(res.eigenvalues), np.sort_complex(ref[:3]), atol=1e-8
        )
        assert np.all(res.residual_norms(op) < 1e-7)

    def test_dominant_subset_early_stop(self, key):
        """Dominant eigenpairs converge long before the full subspace."""
        n = 200
        # diagonal-dominant spectrum with a clear leader
        d = np.linspace(1.0, 2.0, n)
        d[-1] = 10.0
        d[-2] = 8.0
        rng = np.random.default_rng(0)
        Q = np.linalg.qr(rng.standard_normal((n, n)))[0]
        A = jnp.asarray(Q @ np.diag(d) @ Q.T)
        res = ArnoldiEigenSolver(
            A, ArnoldiOptions(max_eigenvalues=2, tolerance=1e-12, max_subspace=80, seed=0)
        ).compute()
        assert res.converged and res.iterations < 80
        np.testing.assert_allclose(np.sort(res.eigenvalues.real), [8.0, 10.0], atol=1e-7)

    def test_breakdown_invariant_subspace(self):
        A = jnp.diag(jnp.array([3.0, 2.0, 1.0, 0.5]))
        op = aslinearoperator(A)
        v0 = jnp.array([1.0, 1.0, 0.0, 0.0])
        res = (
            ArnoldiEigenSolver(op, ArnoldiOptions(max_eigenvalues=2, max_subspace=4))
            .set_initial_vector(v0)
            .compute()
        )
        assert res.termination == "breakdown"
        np.testing.assert_allclose(np.sort(res.eigenvalues.real), [2.0, 3.0], atol=1e-10)

    def test_convection_diffusion_mini(self):
        """BASELINE config 2 in miniature: nonsymmetric 2D
        convection-diffusion (5-point stencil + upwind convection)."""
        from eigenex_tpu.sparse import COOBuilder

        nx = 8
        n = nx * nx
        b = COOBuilder(n, n, np.float64)
        conv = 0.5
        for i in range(nx):
            for j in range(nx):
                u = i * nx + j
                b.append(u, u, 4.0)
                if i > 0:
                    b.append(u, u - nx, -1.0 - conv)
                if i < nx - 1:
                    b.append(u, u + nx, -1.0 + conv)
                if j > 0:
                    b.append(u, u - 1, -1.0 - conv)
                if j < nx - 1:
                    b.append(u, u + 1, -1.0 + conv)
        coo = b.build()
        op = coo.as_linear_operator()
        ref = sort_desc(np.linalg.eigvals(np.asarray(coo.to_dense())))
        res = ArnoldiEigenSolver(
            op, ArnoldiOptions(max_eigenvalues=3, tolerance=1e-12, max_subspace=n, seed=2)
        ).compute()
        np.testing.assert_allclose(
            np.sort_complex(res.eigenvalues), np.sort_complex(ref[:3]), atol=1e-8
        )

    def test_shift_transparent(self, key):
        n = 30
        A = random_matrix(key, n, n, jnp.float64)
        ref = sort_desc(np.linalg.eigvals(np.asarray(A)))[:2]
        res = ArnoldiEigenSolver(
            A, ArnoldiOptions(max_eigenvalues=2, max_subspace=n, tolerance=1e-12, seed=0)
        ).compute()
        res_shift = (
            ArnoldiEigenSolver(
                A, ArnoldiOptions(max_eigenvalues=2, max_subspace=n, tolerance=1e-12, seed=0)
            )
            .set_eigenvalue_shift(100.0)
            .compute()
        )
        # shifting by 100 reorders nothing here since shift >> spread pushes
        # dominance to the same smallest-|λ−(−100)|... simply compare values
        np.testing.assert_allclose(
            np.sort_complex(res_shift.eigenvalues + 0),  # shifted-back values
            np.sort_complex(
                sort_desc(np.linalg.eigvals(np.asarray(A) + 100 * np.eye(n)))[:2] - 100.0
            ),
            atol=1e-7,
        )
        np.testing.assert_allclose(
            np.sort_complex(res.eigenvalues), np.sort_complex(ref), atol=1e-7
        )
