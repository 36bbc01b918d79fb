"""Tests for CG, shift-invert Lanczos, and Lanczos-based truncated SVD
(BASELINE configs 4 and 5 building blocks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eigenex_tpu.core.operators import aslinearoperator
from eigenex_tpu.ops.sparse_svd import gram_operator, truncated_svd_via_lanczos
from eigenex_tpu.solvers.cg import cg_solve, shift_invert_operator
from eigenex_tpu.solvers.lanczos import LanczosEigenSolver, LanczosOptions
from eigenex_tpu.utils.prng import random_hermitian, random_tensor, random_vector


class TestCG:
    def test_cg_spd(self, key):
        n = 40
        A = random_hermitian(key, n, jnp.float64) + 10 * jnp.eye(n)
        b = random_vector(jax.random.fold_in(key, 1), n, jnp.float64)
        x, res, iters = cg_solve(A, b, tol=1e-12)
        np.testing.assert_allclose(np.asarray(A) @ np.asarray(x), b, atol=1e-9)
        assert int(iters) <= n + 5

    def test_cg_matrix_free(self, key):
        n = 30
        d = jnp.linspace(1.0, 5.0, n)
        op = aslinearoperator(lambda x: d * x, shape=(n, n), dtype=jnp.float64)
        b = random_vector(key, n, jnp.float64)
        x, _, _ = cg_solve(op, b, tol=1e-13)
        np.testing.assert_allclose(x, b / d, atol=1e-10)

    def test_cg_sharded_matches(self, key):
        """psum-aware CG under shard_map == single device."""
        from jax import shard_map
        from jax.sharding import Mesh, PartitionSpec as P

        n = 64
        A = random_hermitian(key, n, jnp.float64) + 12 * jnp.eye(n)
        b = random_vector(jax.random.fold_in(key, 2), n, jnp.float64)
        x_ref, _, _ = cg_solve(A, b, tol=1e-12)

        mesh = Mesh(np.array(jax.devices("cpu")), ("rows",))
        from eigenex_tpu.core.operators import LinearOperator
        from eigenex_tpu.solvers.cg import _cg_loop

        def body(A_rows, b_loc):
            # row shard of A; gather x, compute local rows
            op_loc = LinearOperator(
                lambda p, v: p @ jax.lax.all_gather(v, "rows", tiled=True),
                A_rows,
                (A_rows.shape[0], n),
                A_rows.dtype,
            )
            x, r, i = _cg_loop(
                op_loc, b_loc, jnp.zeros_like(b_loc), jnp.asarray(1e-12),
                max_iters=1000, axis_name="rows",
            )
            return x

        f = shard_map(body, mesh=mesh, in_specs=(P("rows"), P("rows")), out_specs=P("rows"))
        np.testing.assert_allclose(f(A, b), x_ref, atol=1e-9)


class TestShiftInvert:
    def test_ground_state_via_shift_invert(self, key):
        """σ below the spectrum ⇒ dominant eigenpair of (A−σI)⁻¹ is the
        ground state; few outer iterations needed."""
        n = 60
        A = random_hermitian(key, n, jnp.float64)
        ev = np.linalg.eigvalsh(np.asarray(A))
        sigma = ev[0] - 1.0
        si = shift_invert_operator(A, sigma, tol=1e-12)
        res = LanczosEigenSolver(
            si,
            LanczosOptions(
                max_eigenvalues=1, eigenvalue_indices=(-1,), tolerance=1e-11,
                max_subspace=30, seed=0,
            ),
        ).compute()
        theta = res.eigenvalues[-1]
        lam = sigma + 1.0 / theta
        np.testing.assert_allclose(lam, ev[0], atol=1e-8)
        assert res.iterations < 30


class TestLanczosSVD:
    def test_gram_operator(self, key):
        m = random_tensor(key, (7, 5), jnp.float64)
        g = gram_operator(m)
        x = random_vector(jax.random.fold_in(key, 1), 5, jnp.float64)
        np.testing.assert_allclose(g(x), np.asarray(m).T @ np.asarray(m) @ np.asarray(x), atol=1e-12)

    @pytest.mark.parametrize("shape,left", [((6, 4, 5, 3), 2), ((40, 12), 1)])
    def test_top_singular_triplets(self, key, shape, left):
        t = random_tensor(key, shape, jnp.float64)
        rank = 3
        res = truncated_svd_via_lanczos(t, left, rank, tolerance=1e-14)
        # oracle: dense SVD
        mr = int(np.prod(shape[:left]))
        m = np.asarray(t).reshape(mr, -1)
        u, s, vh = np.linalg.svd(m, full_matrices=False)
        np.testing.assert_allclose(res.singular_values, s[:rank], atol=1e-9)
        # factor quality via projector comparison (signs are free)
        U = np.asarray(res.tensor_u).reshape(mr, rank)
        np.testing.assert_allclose(U.T @ U, np.eye(rank), atol=1e-8)
        np.testing.assert_allclose(
            np.abs(U.T @ u[:, :rank]), np.eye(rank), atol=1e-6
        )
        # reconstruction error equals the optimal rank-k error
        rec = np.asarray(res.reconstruct()).reshape(mr, -1)
        np.testing.assert_allclose(
            np.linalg.norm(m - rec), np.sqrt((s[rank:] ** 2).sum()), atol=1e-7
        )

    def test_wide_matrix_uses_left_gram(self, key):
        t = random_tensor(key, (5, 30), jnp.float64)
        res = truncated_svd_via_lanczos(t, 1, 2, tolerance=1e-14)
        s = np.linalg.svd(np.asarray(t), compute_uv=False)
        np.testing.assert_allclose(res.singular_values, s[:2], atol=1e-9)
