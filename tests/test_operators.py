"""Tests for LinearOperator algebra (the VectorMap analog), oracled
against dense matrix arithmetic like vector_map_test.cpp:26-60."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eigenex_tpu import LinearOperator, aslinearoperator, identity_operator
from eigenex_tpu.utils.exceptions import OperatorError
from eigenex_tpu.utils.prng import random_matrix, random_vector


@pytest.fixture
def mats(key):
    k1, k2, k3 = jax.random.split(key, 3)
    A = random_matrix(k1, 6, 6, jnp.float64)
    B = random_matrix(k2, 6, 6, jnp.float64)
    x = random_vector(k3, 6, jnp.float64)
    return A, B, x


def test_dense_matvec(mats):
    A, _, x = mats
    op = aslinearoperator(A)
    np.testing.assert_allclose(op(x), A @ x, rtol=1e-12)
    np.testing.assert_allclose(op.rmatvec(x), A.T @ x, rtol=1e-12)


def test_add_compose_scale(mats):
    A, B, x = mats
    a, b = aslinearoperator(A), aslinearoperator(B)
    np.testing.assert_allclose((a + b)(x), A @ x + B @ x, rtol=1e-12)
    # (f*g)(x) = f(g(x)) — vector_map.hpp:33-34
    np.testing.assert_allclose((a @ b)(x), A @ (B @ x), rtol=1e-12)
    np.testing.assert_allclose((a * b)(x), A @ (B @ x), rtol=1e-12)
    np.testing.assert_allclose((2.5 * a)(x), 2.5 * (A @ x), rtol=1e-12)
    np.testing.assert_allclose((a - b)(x), A @ x - B @ x, rtol=1e-12)
    np.testing.assert_allclose((-a)(x), -(A @ x), rtol=1e-12)


def test_shift(mats):
    A, _, x = mats
    op = aslinearoperator(A).shifted(3.0)
    np.testing.assert_allclose(op(x), A @ x + 3.0 * x, rtol=1e-12)


def test_adjoint_of_composition(mats):
    A, B, x = mats
    c = aslinearoperator(A) @ aslinearoperator(B)
    np.testing.assert_allclose(c.H(x), (A @ B).T @ x, rtol=1e-12)


def test_matmat(mats):
    A, B, _ = mats
    op = aslinearoperator(A)
    np.testing.assert_allclose(op.matmat(B), A @ B, rtol=1e-12)


def test_dim_check():
    A = jnp.zeros((3, 4))
    B = jnp.zeros((3, 4))
    with pytest.raises(OperatorError):
        aslinearoperator(A) @ aslinearoperator(B)  # 4 != 3
    with pytest.raises(OperatorError):
        aslinearoperator(A) + aslinearoperator(jnp.zeros((4, 4)))


def test_identity():
    x = jnp.arange(5.0)
    np.testing.assert_allclose(identity_operator(5, x.dtype)(x), x)


def test_operator_is_pytree(mats):
    A, _, x = mats
    op = aslinearoperator(A).shifted(1.0)

    @jax.jit
    def apply(op, x):
        return op.matvec(x)

    np.testing.assert_allclose(apply(op, x), A @ x + x, rtol=1e-12)


def test_complex_adjoint(key):
    A = random_matrix(key, 5, 5, jnp.complex128)
    x = random_vector(jax.random.fold_in(key, 1), 5, jnp.complex128)
    op = aslinearoperator(A)
    np.testing.assert_allclose(op.H(x), A.conj().T @ x, rtol=1e-12)


def test_callable_wrapping():
    op = aslinearoperator(lambda x: 2 * x, shape=(4, 4), dtype=jnp.float64)
    np.testing.assert_allclose(op(jnp.ones(4)), 2 * jnp.ones(4))


def test_rmatvec_vjp_fallback_real():
    """Operators without an explicit rmatvec derive Aᵀ via jax.vjp."""
    import numpy as np
    from eigenex_tpu.core.operators import LinearOperator

    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((5, 7)))
    op = LinearOperator(lambda p, v: p @ v, A, (5, 7), jnp.float64)
    x = jnp.asarray(rng.standard_normal(5))
    np.testing.assert_allclose(np.asarray(op.rmatvec(x)), np.asarray(A.T @ x), atol=1e-14)
    # .H built from the fallback round-trips
    np.testing.assert_allclose(np.asarray(op.H.matvec(x)), np.asarray(A.T @ x), atol=1e-14)
    np.testing.assert_allclose(
        np.asarray(op.H.rmatvec(jnp.asarray(rng.standard_normal(7)))).shape, (5,)
    )


def test_rmatvec_vjp_fallback_complex():
    import numpy as np
    from eigenex_tpu.core.operators import LinearOperator

    rng = np.random.default_rng(1)
    A = jnp.asarray(rng.standard_normal((6, 6)) + 1j * rng.standard_normal((6, 6)))
    op = LinearOperator(lambda p, v: p @ v, A, (6, 6), jnp.complex128)
    x = jnp.asarray(rng.standard_normal(6) + 1j * rng.standard_normal(6))
    np.testing.assert_allclose(
        np.asarray(op.rmatvec(x)), np.asarray(A.conj().T @ x), atol=1e-14
    )
    # and under jit
    y = jax.jit(lambda o, v: o.rmatvec(v))(op, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(A.conj().T @ x), atol=1e-14)
