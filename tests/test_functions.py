"""Tests for f(A)v and exp(xA)v solvers — oracle: dense eigendecomposition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eigenex_tpu.core.operators import aslinearoperator
from eigenex_tpu.solvers.functions import (
    LanczosExponentialSolver,
    dense_expmv,
    expm_multiply,
    lanczos_expmv,
    lanczos_function_apply,
    taylor_expmv,
    taylor_expmv_auto,
)
from eigenex_tpu.utils.prng import random_hermitian, random_vector


def expm_oracle(A, v, x):
    w, U = np.linalg.eigh(np.asarray(A))
    return U @ (np.exp(x * w) * (U.conj().T @ np.asarray(v)))


@pytest.fixture
def problem(key):
    n = 30
    A = random_hermitian(key, n, jnp.float64)
    v = random_vector(jax.random.fold_in(key, 1), n, jnp.float64)
    return A, v


class TestFunctionApply:
    def test_identity_function(self, problem):
        A, v = problem
        out = lanczos_function_apply(A, v, lambda th: th, num_steps=30)
        np.testing.assert_allclose(out, np.asarray(A) @ np.asarray(v), atol=1e-9)

    def test_inverse_function(self, problem):
        A, v = problem
        A = A + 10.0 * jnp.eye(30)  # make well-conditioned positive definite
        out = lanczos_function_apply(A, v, lambda th: 1.0 / th, num_steps=30)
        ref = np.linalg.solve(np.asarray(A), np.asarray(v))
        np.testing.assert_allclose(out, ref, atol=1e-8)

    def test_complex_function(self, problem):
        A, v = problem
        out = lanczos_function_apply(A, v, lambda th: np.exp(1j * th), num_steps=30)
        w, U = np.linalg.eigh(np.asarray(A))
        ref = U @ (np.exp(1j * w) * (U.T @ np.asarray(v)))
        np.testing.assert_allclose(out, ref, atol=1e-8)


class TestExpmv:
    def test_lanczos_expmv(self, problem):
        A, v = problem
        for x in (1.0, -0.5):
            np.testing.assert_allclose(
                lanczos_expmv(A, v, x, num_steps=30), expm_oracle(A, v, x), atol=1e-8
            )

    def test_dense_expmv(self, problem):
        A, v = problem
        np.testing.assert_allclose(dense_expmv(A, v, 0.7), expm_oracle(A, v, 0.7), atol=1e-9)

    def test_taylor_expmv(self, problem):
        A, v = problem
        out = taylor_expmv(A, v, 0.3, tol=1e-14)
        np.testing.assert_allclose(out, expm_oracle(A, v, 0.3), atol=1e-9)

    def test_taylor_auto_division(self, problem):
        A, v = problem
        # large |x|·ρ(A): undivided Taylor would need many terms / lose digits
        out = taylor_expmv_auto(A, v, -2.0, tol=1e-14)
        np.testing.assert_allclose(out, expm_oracle(A, v, -2.0), atol=1e-7)

    def test_imaginary_time_evolution(self, problem):
        """exp(i x A) v — the quantum propagator case (complex x over real A)."""
        A, v = problem
        x = 0.5j
        out = taylor_expmv(A, v, x, tol=1e-14)
        w, U = np.linalg.eigh(np.asarray(A))
        ref = U @ (np.exp(x * w) * (U.T @ np.asarray(v)))
        np.testing.assert_allclose(out, ref, atol=1e-9)
        # norm must be conserved for unitary evolution
        np.testing.assert_allclose(np.linalg.norm(out), np.linalg.norm(np.asarray(v)), atol=1e-10)

    def test_dispatcher_and_class_api(self, problem):
        A, v = problem
        ref = expm_oracle(A, v, 0.25)
        np.testing.assert_allclose(expm_multiply(A, v, 0.25, method="lanczos", num_steps=30), ref, atol=1e-8)
        np.testing.assert_allclose(expm_multiply(A, v, 0.25, method="taylor", tol=1e-14), ref, atol=1e-8)
        sol = LanczosExponentialSolver(A, num_steps=30)
        np.testing.assert_allclose(sol.solve_with_eigens(v, 0.25), ref, atol=1e-9)
        np.testing.assert_allclose(sol.solve_with_lanczos(v, 0.25), ref, atol=1e-8)
        np.testing.assert_allclose(sol.solve_with_taylor_no_division(v, 0.25, tol=1e-14), ref, atol=1e-8)
        np.testing.assert_allclose(sol.solve_with_taylor_auto_division(v, 0.25, tol=1e-14), ref, atol=1e-8)

    def test_sparse_operator_gershgorin_bound_path(self):
        """taylor_expmv_auto picks its division from the COO container's
        Gershgorin range (triplets_matrix.hpp:512 feeding lanczos.hpp:191)."""
        from eigenex_tpu.sparse import COOBuilder

        n = 40
        b = COOBuilder(n, n, np.float64)
        for i in range(n):
            b.append(i, i, 2.0)
            if i + 1 < n:
                b.append(i, i + 1, -1.0)
                b.append(i + 1, i, -1.0)
        coo = b.build()
        op = coo.as_linear_operator()
        v = np.zeros(n)
        v[0] = 1.0
        out = taylor_expmv_auto(op, jnp.asarray(v), -3.0, tol=1e-14)
        ref = expm_oracle(coo.to_dense(), v, -3.0)
        np.testing.assert_allclose(out, ref, atol=1e-8)


def test_expm_multiply_on_mesh_operator():
    """The mesh operator composes with the function solvers unchanged:
    exp(xA)v through a row-partitioned operator matches the dense
    oracle (round-3 mesh_operator coverage)."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    from eigenex_tpu.parallel import mesh_operator, pad_bsr_for_mesh
    from eigenex_tpu.solvers.functions import expm_multiply
    from eigenex_tpu.sparse.bsr import bsr_from_dense

    rng = np.random.default_rng(9)
    n = 64
    A = np.zeros((n, n))
    for r in range(8):
        for c in (r, r + 1):
            if c < 8:
                A[r*8:(r+1)*8, c*8:(c+1)*8] = 0.2 * rng.standard_normal((8, 8))
    A = (A + A.T) / 2
    mesh = Mesh(np.array(jax.devices("cpu")), ("rows",))
    op = mesh_operator(
        pad_bsr_for_mesh(bsr_from_dense(A, (8, 8)), 8), mesh, matvec_mode="halo"
    )
    v = rng.standard_normal(n)
    w = expm_multiply(op, jnp.asarray(v), x=0.7, method="lanczos")
    import scipy.linalg as sla

    ref = sla.expm(0.7 * A) @ v
    np.testing.assert_allclose(np.asarray(w), ref, atol=1e-9)
