"""Tests for the multi-index engine (ProductIndices/AddIndices/Slice).

Oracles mirror the reference's sample_product_indices.cpp demo semantics
(flat<->multi bijection, diagonal merge) checked against NumPy."""

import numpy as np
import pytest

from eigenex_tpu import AddIndices, ProductIndices, Slice
from eigenex_tpu.core.indices import make_reverse_shuffle
from eigenex_tpu.utils.exceptions import EigenexError


class TestProductIndices:
    def test_bijection_dense(self):
        pi = ProductIndices([2, 3, 4])
        assert pi.size == 24
        assert pi.is_dense()
        for flat in range(pi.size):
            multi = pi.indices(flat)
            assert pi.absolute_index(multi) == flat

    def test_matches_numpy_ravel(self):
        pi = ProductIndices([3, 5, 7])
        for multi in [(0, 0, 0), (2, 4, 6), (1, 3, 2)]:
            assert pi.absolute_index(multi) == np.ravel_multi_index(multi, (3, 5, 7))

    def test_absolute_index_list_dense(self):
        pi = ProductIndices([2, 3])
        np.testing.assert_array_equal(pi.absolute_index_list(), np.arange(6))

    def test_shuffle(self):
        pi = ProductIndices([2, 3, 4]).shuffle([2, 0, 1])
        assert pi.dims == (4, 2, 3)
        # shuffled view addresses the same flat positions as the transposed array
        a = np.arange(24).reshape(2, 3, 4)
        at = np.transpose(a, (2, 0, 1))
        for multi in [(0, 0, 0), (3, 1, 2), (1, 0, 1)]:
            assert pi.absolute_index(multi) == at[multi]

    def test_delta_diagonal_merge(self):
        # merging axes 0 and 1 of a (3,3) view yields the diagonal
        pi = ProductIndices([3, 3]).delta(0, 1)
        assert pi.dims == (3,)
        a = np.arange(9).reshape(3, 3)
        for i in range(3):
            assert pi.absolute_index((i,)) == a[i, i]

    def test_delta_dim_mismatch(self):
        with pytest.raises(EigenexError):
            ProductIndices([2, 3]).delta(0, 1)

    def test_from_to_relabel_diag(self):
        # from ["i","j","i"] to ["i","j"]: diagonal over axes 0,2
        pi = ProductIndices([3, 4, 3]).from_(["i", "j", "i"]).to(["i", "j"])
        assert pi.dims == (3, 4)
        a = np.arange(36).reshape(3, 4, 3)
        for i in range(3):
            for j in range(4):
                assert pi.absolute_index((i, j)) == a[i, j, i]

    def test_from_to_reorder(self):
        pi = ProductIndices([2, 5]).from_(["a", "b"]).to(["b", "a"])
        a = np.arange(10).reshape(2, 5)
        for b in range(5):
            for a_i in range(2):
                assert pi.absolute_index((b, a_i)) == a[a_i, b]

    def test_sliced(self):
        pi = ProductIndices([10]).sliced(0, Slice(start=2, length=3, stride=2))
        np.testing.assert_array_equal(pi.absolute_index_list(), [2, 4, 6])

    def test_reverse_shuffle(self):
        s = (2, 0, 1)
        r = make_reverse_shuffle(s)
        assert tuple(s[r[i]] for i in range(3)) == (0, 1, 2)


class TestAddIndices:
    def test_roundtrip(self):
        ai = AddIndices([3, 5, 2])
        assert ai.dim == 10
        for flat in range(10):
            b, s = ai.first(flat), ai.second(flat)
            assert ai.absolute_index(b, s) == flat

    def test_offsets(self):
        ai = AddIndices([3, 5, 2])
        np.testing.assert_array_equal(ai.offsets, [0, 3, 8, 10])

    def test_periodic_block(self):
        ai = AddIndices([3, 5])
        # periodic extension of the block index (multi_indices.hpp:848-862)
        assert ai.absolute_index(2, 1) == ai.absolute_index(0, 1)
        assert ai.absolute_index(-1, 0) == ai.absolute_index(1, 0)

    def test_first_array(self):
        ai = AddIndices([2, 3])
        np.testing.assert_array_equal(ai.first_array(np.arange(5)), [0, 0, 1, 1, 1])
