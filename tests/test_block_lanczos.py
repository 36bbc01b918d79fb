"""Block Lanczos tests — including the degenerate-eigenvalue case that
single-vector Lanczos cannot resolve."""

import jax.numpy as jnp
import numpy as np
import pytest

from eigenex_tpu.solvers.block_lanczos import (
    BlockLanczosEigenSolver,
    BlockLanczosOptions,
    block_lanczos_steps,
    init_block_lanczos_state,
)
from eigenex_tpu.core.operators import aslinearoperator
from eigenex_tpu.utils.prng import random_hermitian


class TestBlockBasis:
    def test_basis_orthonormal_band_structure(self, key):
        n, m, b = 40, 24, 4
        A = random_hermitian(key, n, jnp.float64)
        op = aslinearoperator(A)
        s = init_block_lanczos_state(op, m, b, seed=1)
        s = block_lanczos_steps(op, s, m // b, block_size=b)
        k = int(s.k)
        assert k == m + b  # projected matrix complete, one residual block extra
        V = np.asarray(s.V)
        np.testing.assert_allclose(V @ V.T, np.eye(m + b), atol=1e-12)
        # projected matrix equals V A V^T (band, Hermitian after symmetrize)
        H = np.asarray(s.H[:m, :m])
        Hs = (H + H.T) / 2
        np.testing.assert_allclose(Hs, V[:m] @ np.asarray(A) @ V[:m].T, atol=1e-10)


class TestBlockSolver:
    def test_matches_dense(self, key):
        n = 60
        A = random_hermitian(key, n, jnp.float64)
        ref = np.linalg.eigvalsh(np.asarray(A))
        res = BlockLanczosEigenSolver(
            A,
            BlockLanczosOptions(
                max_eigenvalues=4, block_size=4, tolerance=1e-13, max_subspace=n, seed=0
            ),
        ).compute()
        np.testing.assert_allclose(res.eigenvalues, ref[:4], atol=1e-8)

    def test_degenerate_eigenvalues_resolved(self):
        """A triple eigenvalue: block size 4 captures the full multiplicity
        in one pass (single-vector Lanczos finds only one copy)."""
        rng = np.random.default_rng(0)
        n = 50
        d = np.concatenate([[1.0, 1.0, 1.0], np.linspace(2, 5, n - 3)])
        Q = np.linalg.qr(rng.standard_normal((n, n)))[0]
        A = jnp.asarray(Q @ np.diag(d) @ Q.T)
        res = BlockLanczosEigenSolver(
            A,
            BlockLanczosOptions(
                max_eigenvalues=3, block_size=4, tolerance=1e-13, max_subspace=48, seed=1
            ),
        ).compute()
        np.testing.assert_allclose(res.eigenvalues, [1.0, 1.0, 1.0], atol=1e-7)
        # the three eigenvectors span the degenerate eigenspace
        X = np.asarray(res.eigenvectors)
        np.testing.assert_allclose(X.T @ X, np.eye(3), atol=1e-8)
        r = np.asarray(A) @ X - X * res.eigenvalues[None, :]
        assert np.linalg.norm(r, axis=0).max() < 1e-4

    def test_breakdown_invariant_subspace(self):
        A = jnp.diag(jnp.arange(1.0, 9.0))
        v0 = jnp.zeros((2, 8)).at[0, 0].set(1.0).at[1, 1].set(1.0)
        res = (
            BlockLanczosEigenSolver(
                A, BlockLanczosOptions(max_eigenvalues=2, block_size=2, max_subspace=8)
            )
            .set_initial_block(v0)
            .compute()
        )
        # starting block spans an invariant 2-space {e1, e2}
        assert res.termination == "breakdown"
        np.testing.assert_allclose(np.sort(res.eigenvalues), [1.0, 2.0], atol=1e-10)


def test_complex_hermitian_block(key):
    """Complex operator: the QR phase fix must keep Q'R' == W.T (review
    finding: the old conj-on-both-factors broke complex phases)."""
    from eigenex_tpu.utils.prng import random_hermitian

    n = 40
    A = random_hermitian(key, n, jnp.complex128)
    ref = np.linalg.eigvalsh(np.asarray(A))
    res = BlockLanczosEigenSolver(
        A,
        BlockLanczosOptions(
            max_eigenvalues=3, block_size=3, tolerance=1e-13, max_subspace=n, seed=0
        ),
    ).compute()
    np.testing.assert_allclose(res.eigenvalues, ref[:3], atol=1e-8)
