"""Tests for triplet operators, Givens rotations, and shuffles."""

import jax.numpy as jnp
import numpy as np
import pytest

from eigenex_tpu.ops.rotations import (
    colwise_shuffle,
    cwise_shuffle,
    givens_rotation_triplets,
    operate_triplets_left,
    operate_triplets_right,
    rotate_from_left,
    rotate_from_right,
    rowwise_shuffle,
)


@pytest.fixture
def M(rng):
    return jnp.asarray(rng.standard_normal((5, 7)))


def dense_givens(n, i, j, th):
    G = np.eye(n)
    G[i, i] = G[j, j] = np.cos(th)
    G[i, j] = np.sin(th)
    G[j, i] = -np.sin(th)
    return G


def test_operate_triplets_left(M, rng):
    T = rng.standard_normal((5, 5))
    T[rng.random((5, 5)) > 0.4] = 0
    r, c = np.nonzero(T)
    out = operate_triplets_left(r, c, T[r, c], M)
    np.testing.assert_allclose(out, T @ np.asarray(M), atol=1e-12)


def test_operate_triplets_right(M, rng):
    T = rng.standard_normal((7, 7))
    T[rng.random((7, 7)) > 0.4] = 0
    r, c = np.nonzero(T)
    out = operate_triplets_right(r, c, T[r, c], M)
    np.testing.assert_allclose(out, np.asarray(M) @ T, atol=1e-12)


def test_givens_triplets_and_rotations(M):
    n, th = 5, 0.7
    r, c, v = givens_rotation_triplets(n, 1, 3, th)
    G = np.zeros((n, n))
    G[np.asarray(r), np.asarray(c)] = np.asarray(v)
    np.testing.assert_allclose(G, dense_givens(n, 1, 3, th))
    np.testing.assert_allclose(rotate_from_left(M, 1, 3, th), G @ np.asarray(M), atol=1e-12)
    G7 = dense_givens(7, 2, 5, th)
    np.testing.assert_allclose(rotate_from_right(M, 2, 5, th), np.asarray(M) @ G7.T, atol=1e-12)


def test_rotation_preserves_norm(M):
    np.testing.assert_allclose(
        np.linalg.norm(rotate_from_left(M, 0, 4, 1.1)), np.linalg.norm(np.asarray(M)), rtol=1e-12
    )


def test_shuffles(M):
    perm = [4, 0, 3, 1, 2]
    np.testing.assert_allclose(rowwise_shuffle(M, perm), np.asarray(M)[perm])
    perm7 = [6, 5, 4, 3, 2, 1, 0]
    np.testing.assert_allclose(colwise_shuffle(M, perm7), np.asarray(M)[:, perm7])
    v = jnp.arange(5.0)
    np.testing.assert_allclose(cwise_shuffle(v, perm), np.arange(5.0)[perm])
