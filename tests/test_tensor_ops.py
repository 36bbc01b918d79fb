"""Tests for tensor utilities, Kronecker product, einsum DSL, tensor SVD."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eigenex_tpu.ops.einsum import contract, einsum, einsum_labels
from eigenex_tpu.ops.kron import tensor_kronecker_product
from eigenex_tpu.ops.tensor_svd import tensor_svd, truncated_tensor_svd
from eigenex_tpu.ops.tensor_util import (
    contract_vector_as_diagonal,
    transform_tensor_with_matrix,
    zerowisely_resized,
)
from eigenex_tpu.utils.exceptions import EinsumError
from eigenex_tpu.utils.prng import random_tensor


class TestTensorUtil:
    def test_zerowisely_resized_grow_shrink(self):
        t = jnp.arange(12.0).reshape(3, 4)
        r = zerowisely_resized(t, (2, 6))
        assert r.shape == (2, 6)
        np.testing.assert_allclose(r[:, :4], t[:2])
        np.testing.assert_allclose(r[:, 4:], 0)

    def test_contract_vector_as_diagonal(self, key):
        t = random_tensor(key, (3, 4, 5), jnp.float64)
        v = jnp.arange(4.0)
        r = contract_vector_as_diagonal(t, v, axis=1)
        np.testing.assert_allclose(r, np.asarray(t) * np.asarray(v)[None, :, None])

    def test_transform_tensor_with_matrix(self, key):
        t = random_tensor(key, (3, 4, 5), jnp.float64)
        m = random_tensor(jax.random.fold_in(key, 1), (7, 4), jnp.float64)
        r = transform_tensor_with_matrix(t, m, axis=1)
        assert r.shape == (3, 7, 5)
        ref = np.einsum("ij,ajb->aib", np.asarray(m), np.asarray(t))
        np.testing.assert_allclose(r, ref, atol=1e-12)


class TestKron:
    def test_lazy_coeff_and_dense(self, key):
        a = random_tensor(key, (2, 3), jnp.float64)
        b = random_tensor(jax.random.fold_in(key, 1), (4,), jnp.float64)
        kp = tensor_kronecker_product(a, b)
        assert kp.dims == (2, 3, 4)
        np.testing.assert_allclose(kp.coeff((1, 2, 3)), a[1, 2] * b[3])
        dense = np.asarray(kp.to_dense())
        ref = np.einsum("ij,k->ijk", np.asarray(a), np.asarray(b))
        np.testing.assert_allclose(dense, ref)
        # flat addressing agrees with row-major enumeration
        np.testing.assert_allclose(kp.coeff_flat(kp._pi.absolute_index((1, 2, 3))), ref[1, 2, 3])


class TestEinsumDSL:
    def test_pure_contraction(self, key):
        a = random_tensor(key, (3, 4), jnp.float64)
        b = random_tensor(jax.random.fold_in(key, 1), (4, 5), jnp.float64)
        r = contract(a, b).from_(["i", "j"], ["j", "k"]).to(["i", "k"])
        np.testing.assert_allclose(r, np.asarray(a) @ np.asarray(b), atol=1e-12)

    def test_einsum_diagonal(self, key):
        a = random_tensor(key, (5, 5), jnp.float64)
        r = einsum(a).from_(["i", "i"]).to(["i"])
        np.testing.assert_allclose(r, np.diag(np.asarray(a)))

    def test_einsum_trace_sum(self, key):
        a = random_tensor(key, (6, 6), jnp.float64)
        r = einsum(a).from_(["i", "i"]).to([])
        np.testing.assert_allclose(r, np.trace(np.asarray(a)), atol=1e-12)

    def test_einsum_two_tensor_with_diag(self, key):
        # repeated label across tensors kept in output => elementwise/batch
        a = random_tensor(key, (3, 4), jnp.float64)
        b = random_tensor(jax.random.fold_in(key, 1), (3, 5), jnp.float64)
        r = einsum(a, b).from_(["i", "j"], ["i", "k"]).to(["i", "j", "k"])
        ref = np.einsum("ij,ik->ijk", np.asarray(a), np.asarray(b))
        np.testing.assert_allclose(r, ref, atol=1e-12)

    def test_arbitrary_string_labels(self, key):
        a = random_tensor(key, (2, 3), jnp.float64)
        b = random_tensor(jax.random.fold_in(key, 1), (3, 2), jnp.float64)
        r = einsum(a, b).from_(["left", "mid"], ["mid", "right"]).to(["left", "right"])
        np.testing.assert_allclose(r, np.asarray(a) @ np.asarray(b), atol=1e-12)

    def test_invalid_output_label(self, key):
        a = random_tensor(key, (2, 2), jnp.float64)
        with pytest.raises(EinsumError):
            einsum(a).from_(["i", "i"]).to(["j"])

    def test_unequal_diag_dims(self, key):
        a = random_tensor(key, (2, 3), jnp.float64)
        with pytest.raises(EinsumError):
            einsum(a).from_(["i", "i"]).to(["i"])

    def test_three_tensors(self, key):
        ks = jax.random.split(key, 3)
        a = random_tensor(ks[0], (2, 3), jnp.float64)
        b = random_tensor(ks[1], (3, 4), jnp.float64)
        c = random_tensor(ks[2], (4, 2), jnp.float64)
        r = einsum_labels((a, b, c), (("i", "j"), ("j", "k"), ("k", "l")), ("i", "l"))
        np.testing.assert_allclose(
            r, np.asarray(a) @ np.asarray(b) @ np.asarray(c), atol=1e-12
        )


class TestTensorSVD:
    @pytest.mark.parametrize("dtype", [jnp.float64, jnp.complex128])
    def test_reconstruction(self, key, dtype):
        t = random_tensor(key, (3, 4, 5, 2), dtype)
        res = tensor_svd(t, left_axes=2)
        assert res.tensor_u.shape == (3, 4, res.rank)
        assert res.tensor_v.shape == (5, 2, res.rank)
        np.testing.assert_allclose(res.reconstruct(), t, atol=1e-12)

    def test_u_v_isometry(self, key):
        t = random_tensor(key, (4, 3, 6), jnp.float64)
        res = tensor_svd(t, left_axes=1)
        U = np.asarray(res.tensor_u).reshape(-1, res.rank)
        V = np.asarray(res.tensor_v).reshape(-1, res.rank)
        np.testing.assert_allclose(U.T.conj() @ U, np.eye(res.rank), atol=1e-12)
        # V stored conjugated: V^T conj(V) = I  ⇔  V^H V = I on conj data
        np.testing.assert_allclose(V.T @ V.conj(), np.eye(res.rank), atol=1e-12)

    def test_truncation_rank_and_error(self, key):
        # build a tensor with known singular spectrum
        u = np.linalg.qr(np.random.default_rng(0).standard_normal((12, 12)))[0]
        v = np.linalg.qr(np.random.default_rng(1).standard_normal((10, 10)))[0]
        s = np.zeros((12, 10))
        svals = np.array([5.0, 3.0, 1.0, 1e-8, 1e-9] + [0] * 5)
        np.fill_diagonal(s, svals)
        t = jnp.asarray((u @ s @ v.T).reshape(3, 4, 10))
        res = tensor_svd(t, left_axes=2)
        assert res.get_rank(threshold=1e-6) == 3
        np.testing.assert_allclose(
            res.truncation_error(3), np.sqrt(1e-16 + 1e-18), rtol=1e-5
        )
        trunc = res.truncated(rank=3, pad=True)
        # zero-padded: same static shape
        assert trunc.tensor_u.shape == res.tensor_u.shape
        np.testing.assert_allclose(trunc.reconstruct(), t, atol=1e-7)
        sliced = truncated_tensor_svd(t, 2, rank=3)
        assert sliced.rank == 3
        np.testing.assert_allclose(sliced.reconstruct(), t, atol=1e-7)
