"""Tests for blocked orthogonalization (CGS2, Gram-Schmidt, complement)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eigenex_tpu import cgs2, gram_schmidt, orthogonal_complement, project_out
from eigenex_tpu.utils.prng import random_matrix, random_vector


@pytest.mark.parametrize("dtype", [jnp.float64, jnp.complex128])
def test_project_out(key, dtype):
    V = gram_schmidt(random_matrix(key, 3, 10, dtype))
    v = random_vector(jax.random.fold_in(key, 1), 10, dtype)
    w = project_out(V, v)
    np.testing.assert_allclose(np.abs(V.conj() @ w), 0, atol=1e-12)


@pytest.mark.parametrize("dtype", [jnp.float64, jnp.complex128])
def test_cgs2_orthogonal_and_coefficients(key, dtype):
    V = gram_schmidt(random_matrix(key, 4, 12, dtype))
    v = random_vector(jax.random.fold_in(key, 1), 12, dtype)
    w, c = cgs2(V, v)
    np.testing.assert_allclose(np.abs(V.conj() @ w), 0, atol=1e-13)
    # v = w + c @ V  must reconstruct exactly
    np.testing.assert_allclose(w + c @ V, v, atol=1e-13)


def test_cgs2_mask(key):
    V = jnp.zeros((5, 8), jnp.float64).at[0].set(jnp.eye(8)[0]).at[1].set(jnp.eye(8)[1])
    v = jnp.ones(8, jnp.float64)
    mask = jnp.arange(5) < 2
    w, _ = cgs2(V, v, mask=mask)
    # components along rows 0,1 removed; rest untouched
    np.testing.assert_allclose(w[:2], 0, atol=1e-14)
    np.testing.assert_allclose(w[2:], 1.0)


@pytest.mark.parametrize("dtype", [jnp.float64, jnp.complex128])
def test_gram_schmidt(key, dtype):
    A = random_matrix(key, 5, 9, dtype)
    Q = gram_schmidt(A)
    np.testing.assert_allclose(Q @ Q.conj().T, np.eye(5), atol=1e-12)
    # same span: each original row reconstructs from Q
    proj = A - (A @ Q.conj().T) @ Q
    np.testing.assert_allclose(np.abs(proj), 0, atol=1e-11)


@pytest.mark.parametrize("dtype", [jnp.float64, jnp.complex128])
def test_orthogonal_complement(key, dtype):
    V = gram_schmidt(random_matrix(key, 3, 8, dtype))
    C = orthogonal_complement(V)
    assert C.shape == (5, 8)
    np.testing.assert_allclose(C @ C.conj().T, np.eye(5), atol=1e-12)
    np.testing.assert_allclose(np.abs(C @ V.conj().T), 0, atol=1e-12)


def test_cgs2_distributed_matches_single(key):
    """Same seed ⇒ identical results under a row-sharded shard_map
    (SURVEY.md §5: determinism as the data-race guard)."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    V = gram_schmidt(random_matrix(key, 4, 16, jnp.float64))
    v = random_vector(jax.random.fold_in(key, 1), 16, jnp.float64)
    w_ref, c_ref = cgs2(V, v)

    mesh = Mesh(np.array(jax.devices("cpu")[:8]), ("x",))
    f = shard_map(
        lambda V, v: cgs2(V, v, axis_name="x"),
        mesh=mesh,
        in_specs=(P(None, "x"), P("x")),
        out_specs=(P("x"), P(None)),
    )
    w_sh, c_sh = f(V, v)
    np.testing.assert_allclose(w_sh, w_ref, atol=1e-12)
    np.testing.assert_allclose(c_sh, c_ref, atol=1e-12)


def test_orthogonal_complement_debug():
    """Debug twin (OrthogonalSpaceDebug util.hpp:473-514): the returned
    diagnostics certify complement ⊥ span, orthonormality, completeness."""
    import numpy as np
    from eigenex_tpu.ops.orthogonalize import orthogonal_complement_debug

    rng = np.random.default_rng(8)
    V = jnp.asarray(rng.standard_normal((3, 10)))
    R, diag = orthogonal_complement_debug(V)
    assert R.shape == (7, 10)
    assert float(diag["max_overlap"]) < 1e-12
    assert float(diag["orthonormality"]) < 1e-12
    assert float(diag["completeness"]) < 1e-12
