"""Krylov–Schur restarted Arnoldi tests — the bounded-memory dominant-
eigenpair solver for clustered nonsymmetric spectra."""

import jax.numpy as jnp
import numpy as np
import pytest

from eigenex_tpu.solvers.krylov_schur import (
    KrylovSchurArnoldiSolver,
    KrylovSchurOptions,
)
from eigenex_tpu.utils.prng import random_matrix


def sort_desc(v):
    return v[np.argsort(-np.abs(v), kind="stable")]


class TestKrylovSchur:
    def test_real_clustered_dominant(self):
        """Dominant pairs of a clustered spectrum with a small basis —
        plain Arnoldi at the same subspace stalls."""
        rng = np.random.default_rng(0)
        n = 300
        d = np.linspace(1.0, 4.0, n)
        d[-1], d[-2] = 4.3, 4.2  # modest gaps at the top
        Q = np.linalg.qr(rng.standard_normal((n, n)))[0]
        A = jnp.asarray(Q @ np.diag(d) @ Q.T)
        res = KrylovSchurArnoldiSolver(
            A,
            KrylovSchurOptions(
                max_eigenvalues=2, tolerance=1e-10, max_subspace=30, seed=0,
                max_restarts=100,
            ),
        ).compute()
        assert res.converged, res.termination
        np.testing.assert_allclose(np.sort(res.eigenvalues.real), [4.2, 4.3], atol=1e-7)

    def test_complex_eigenvalue_pairs_real_operator(self, key):
        """Real nonsymmetric operator with complex dominant pairs — the
        re-realified restart path."""
        n = 120
        A = random_matrix(key, n, n, jnp.float64)
        ref = sort_desc(np.linalg.eigvals(np.asarray(A)))
        res = KrylovSchurArnoldiSolver(
            A,
            KrylovSchurOptions(
                max_eigenvalues=4, tolerance=1e-9, max_subspace=40, seed=1,
                max_restarts=150,
            ),
        ).compute()
        assert res.converged
        # conjugate-pair members tie in |λ|; compare conj-insensitively
        def canon(v):
            v = np.asarray(v)
            return np.sort_complex(np.where(v.imag < 0, np.conj(v), v))

        np.testing.assert_allclose(canon(res.eigenvalues), canon(ref[:4]), atol=1e-6)

    def test_complex_operator(self, key):
        n = 80
        A = random_matrix(key, n, n, jnp.complex128)
        ref = sort_desc(np.linalg.eigvals(np.asarray(A)))
        res = KrylovSchurArnoldiSolver(
            A,
            KrylovSchurOptions(
                max_eigenvalues=3, tolerance=1e-9, max_subspace=30, seed=2,
                max_restarts=150,
            ),
        ).compute()
        assert res.converged
        np.testing.assert_allclose(
            np.sort_complex(res.eigenvalues), np.sort_complex(ref[:3]), atol=1e-6
        )

    def test_residual_certificate(self, key):
        n = 100
        A = random_matrix(key, n, n, jnp.float64)
        op = None
        res = KrylovSchurArnoldiSolver(
            A,
            KrylovSchurOptions(max_eigenvalues=3, tolerance=1e-10, max_subspace=36, seed=3),
        ).compute()
        X = np.asarray(res.eigenvectors)
        lam = res.eigenvalues
        r = np.asarray(A).astype(complex) @ X - X * lam[None, :]
        assert np.linalg.norm(r, axis=0).max() < 1e-6
