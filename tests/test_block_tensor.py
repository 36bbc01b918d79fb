"""BlockTensor tests — dense-tensor oracle for every op, plus the
symmetry-sector selection rule (block_tensor.hpp:2014-2029,2651-2684)."""

import jax.numpy as jnp
import numpy as np
import pytest

from eigenex_tpu.block.block_tensor import BlockTensor, block_tensor_norm
from eigenex_tpu.core.indices import AddIndices
from eigenex_tpu.ops.einsum import einsum
from eigenex_tpu.utils.exceptions import BlockTensorError


def make_bt(rng, structures, density=0.6, dtype=np.float64):
    """Random block tensor with a random subset of blocks stored."""
    structures = [AddIndices(s) for s in structures]
    bt = BlockTensor(structures, dtype=dtype)
    for key in np.ndindex(*(s.num_blocks for s in structures)):
        if rng.random() < density:
            shape = tuple(s.block_dims[b] for s, b in zip(structures, key))
            bt.set_block(key, rng.standard_normal(shape).astype(dtype))
    return bt


class TestBasics:
    def test_dims_and_roundtrip(self, rng):
        bt = make_bt(rng, [[2, 3], [1, 4]])
        assert bt.dims == (5, 5)
        assert bt.block_dims == (2, 2)
        dense = np.asarray(bt.to_dense())
        bt2 = BlockTensor.from_dense(dense, bt.structures)
        np.testing.assert_allclose(np.asarray(bt2.to_dense()), dense)

    def test_from_dense_skips_zero_blocks(self):
        d = np.zeros((4, 4))
        d[0, 0] = 1.0  # only block (0,0) nonzero under [[2,2],[2,2]]
        bt = BlockTensor.from_dense(d, [[2, 2], [2, 2]])
        assert set(bt.block_keys()) == {(0, 0)}

    def test_get_set_element(self):
        bt = BlockTensor([AddIndices([2, 2]), AddIndices([3, 1])], dtype=np.float64)
        bt.set_element((3, 2), 7.0)  # block (1, 0), intra (1, 2)
        assert float(bt.get_element((3, 2))) == 7.0
        assert float(bt.get_element((0, 0))) == 0.0  # absent block ⇒ zero
        assert set(bt.block_keys()) == {(1, 0)}
        bt.add_element((3, 2), 1.0)
        assert float(bt.get_element((3, 2))) == 8.0

    def test_block_mutators(self, rng):
        bt = BlockTensor([[2, 2], [2, 2]], dtype=np.float64)
        blk = rng.standard_normal((2, 2))
        bt.set_block((0, 1), blk)
        bt.add_block((0, 1), blk)
        np.testing.assert_allclose(bt.blocks[(0, 1)], 2 * blk)
        bt.mul_block((0, 1), 0.5)
        np.testing.assert_allclose(bt.blocks[(0, 1)], blk)
        bt.erase_block((0, 1))
        assert bt.num_stored_blocks == 0

    def test_set_block_shape_check(self):
        bt = BlockTensor([[2, 3]], dtype=np.float64)
        with pytest.raises(BlockTensorError):
            bt.set_block((0,), np.zeros(3))

    def test_truncate_and_stored_values(self, rng):
        bt = BlockTensor([[2, 2]], dtype=np.float64)
        bt.set_block((0,), np.array([1e-14, 1e-14]))
        bt.set_block((1,), np.array([1.0, 2.0]))
        t = bt.truncate(1e-10)
        assert set(t.block_keys()) == {(1,)}
        assert bt.stored_values().shape == (4,)

    def test_cast_conjugate(self, rng):
        bt = make_bt(rng, [[2, 2]], density=1.0, dtype=np.complex128)
        np.testing.assert_allclose(
            np.asarray(bt.conjugate().to_dense()), np.asarray(bt.to_dense()).conj()
        )
        assert bt.cast(np.complex64).dtype == jnp.complex64

    def test_arithmetic(self, rng):
        a = make_bt(rng, [[2, 3], [2, 2]])
        b = make_bt(rng, [[2, 3], [2, 2]])
        da, db = np.asarray(a.to_dense()), np.asarray(b.to_dense())
        np.testing.assert_allclose(np.asarray((a + b).to_dense()), da + db)
        np.testing.assert_allclose(np.asarray((a - b).to_dense()), da - db)
        np.testing.assert_allclose(np.asarray((2.0 * a).to_dense()), 2 * da)
        np.testing.assert_allclose(np.asarray((a / 2).to_dense()), da / 2)
        np.testing.assert_allclose(np.asarray((a * b).to_dense()), da * db)

    def test_norm(self, rng):
        a = make_bt(rng, [[3, 2], [2, 2]])
        np.testing.assert_allclose(
            float(block_tensor_norm(a)), np.linalg.norm(np.asarray(a.to_dense())), rtol=1e-12
        )


class TestTransforms:
    def test_shuffle(self, rng):
        a = make_bt(rng, [[2, 3], [4], [1, 2]])
        d = np.asarray(a.to_dense())
        np.testing.assert_allclose(
            np.asarray(a.shuffle([2, 0, 1]).to_dense()), np.transpose(d, (2, 0, 1))
        )

    def test_block_shuffle(self, rng):
        a = make_bt(rng, [[2, 3]], density=1.0)
        s = a.block_shuffle(0, [1, 0])
        d = np.asarray(a.to_dense())
        np.testing.assert_allclose(
            np.asarray(s.to_dense()), np.concatenate([d[2:], d[:2]])
        )

    def test_reblock(self, rng):
        a = make_bt(rng, [[2, 2], [4]], density=1.0)
        r = a.reblock([[1, 3], [2, 2]])
        np.testing.assert_allclose(np.asarray(r.to_dense()), np.asarray(a.to_dense()))
        assert r.block_dims == (2, 2)

    def test_axis_fixed(self, rng):
        a = make_bt(rng, [[2, 3], [2, 2]], density=1.0)
        d = np.asarray(a.to_dense())
        for i in range(5):
            np.testing.assert_allclose(np.asarray(a.axis_fixed(0, i).to_dense()), d[i])


class TestContraction:
    def test_contract_matches_dense(self, rng):
        a = make_bt(rng, [[2, 3], [2, 2], [3]])
        b = make_bt(rng, [[2, 2], [3], [4, 1]])
        r = a.contract(b, [(1, 0), (2, 1)])
        da, db = np.asarray(a.to_dense()), np.asarray(b.to_dense())
        ref = np.einsum("ijk,jkl->il", da, db)
        np.testing.assert_allclose(np.asarray(r.to_dense()), ref, atol=1e-12)

    def test_contract_structure_mismatch(self, rng):
        a = make_bt(rng, [[2, 3]])
        b = make_bt(rng, [[3, 2]])
        with pytest.raises(BlockTensorError):
            a.contract(b, [(0, 0)])

    def test_selection_rule_sparsity(self):
        """Block-diagonal × block-diagonal keeps block-diagonal keys only
        (the quantum-number conservation mechanism)."""
        s = AddIndices([2, 3])
        rng = np.random.default_rng(0)
        a = BlockTensor([s, s], dtype=np.float64)
        b = BlockTensor([s, s], dtype=np.float64)
        for k in range(2):
            a.set_block((k, k), rng.standard_normal((s.block_dims[k],) * 2))
            b.set_block((k, k), rng.standard_normal((s.block_dims[k],) * 2))
        r = a.contract(b, [(1, 0)])
        assert set(r.block_keys()) == {(0, 0), (1, 1)}
        ref = np.asarray(a.to_dense()) @ np.asarray(b.to_dense())
        np.testing.assert_allclose(np.asarray(r.to_dense()), ref, atol=1e-12)

    def test_trace(self, rng):
        a = make_bt(rng, [[2, 3], [2, 3], [4]], density=1.0)
        d = np.asarray(a.to_dense())
        r = a.trace(0, 1)
        np.testing.assert_allclose(np.asarray(r.to_dense()), np.einsum("iik->k", d), atol=1e-12)

    def test_full_trace(self, rng):
        a = make_bt(rng, [[2, 3], [2, 3]], density=1.0)
        np.testing.assert_allclose(
            float(a.full_trace()), np.trace(np.asarray(a.to_dense())), atol=1e-12
        )


class TestBlockEinsum:
    def test_two_tensor_contract(self, rng):
        a = make_bt(rng, [[2, 3], [2, 2]])
        b = make_bt(rng, [[2, 2], [3, 1]])
        r = einsum(a, b).from_(["i", "j"], ["j", "k"]).to(["i", "k"])
        ref = np.einsum("ij,jk->ik", np.asarray(a.to_dense()), np.asarray(b.to_dense()))
        np.testing.assert_allclose(np.asarray(r.to_dense()), ref, atol=1e-12)

    def test_one_tensor_diag(self, rng):
        a = make_bt(rng, [[2, 3], [2, 3]], density=1.0)
        r = einsum(a).from_(["i", "i"]).to(["i"])
        np.testing.assert_allclose(
            np.asarray(r.to_dense()), np.diag(np.asarray(a.to_dense())), atol=1e-12
        )

    def test_two_tensor_batch_label(self, rng):
        a = make_bt(rng, [[2, 2], [3, 2]], density=1.0)
        b = make_bt(rng, [[2, 2], [2, 1]], density=1.0)
        r = einsum(a, b).from_(["i", "j"], ["i", "k"]).to(["i", "j", "k"])
        ref = np.einsum("ij,ik->ijk", np.asarray(a.to_dense()), np.asarray(b.to_dense()))
        np.testing.assert_allclose(np.asarray(r.to_dense()), ref, atol=1e-12)

    def test_structure_mismatch_label(self, rng):
        a = make_bt(rng, [[2, 3]])
        b = make_bt(rng, [[3, 2]])
        with pytest.raises(BlockTensorError):
            einsum(a, b).from_(["i"], ["i"]).to([])


# ---------------------------------------------------------------------------
# Round 3: block_einsum trace-time scaling — shared-label signature join
# ---------------------------------------------------------------------------
class TestBlockEinsumScaling:
    def test_enumeration_is_o_matching_pairs(self):
        """Two operands with S diagonal sectors share one label: only the
        S diagonal pairs match, and the enumeration must touch exactly
        those — not the S² all-combos loop."""
        import eigenex_tpu.block.block_tensor as bt
        from eigenex_tpu.block.block_tensor import BlockTensor, block_einsum
        from eigenex_tpu.core.indices import AddIndices

        S = 1000
        st = AddIndices([1] * S)  # S sectors of size 1
        A = BlockTensor([st, st], dtype=jnp.float64)
        B = BlockTensor([st, st], dtype=jnp.float64)
        rng = np.random.default_rng(0)
        for s in range(S):
            A.set_block((s, s), jnp.asarray(rng.standard_normal((1, 1))))
            B.set_block((s, s), jnp.asarray(rng.standard_normal((1, 1))))
        out = block_einsum([A, B], [("i", "j"), ("j", "k")], ("i", "k"))
        assert bt._LAST_CANDIDATE_COUNT == S, bt._LAST_CANDIDATE_COUNT
        # correctness spot check on a few sectors
        for s in (0, 499, 999):
            got = float(out.blocks[(s, s)][0, 0])
            want = float(A.blocks[(s, s)][0, 0]) * float(B.blocks[(s, s)][0, 0])
            assert abs(got - want) < 1e-12

    def test_results_unchanged_vs_dense_oracle(self):
        from eigenex_tpu.block.block_tensor import BlockTensor, block_einsum
        from eigenex_tpu.core.indices import AddIndices

        rng = np.random.default_rng(1)
        st = AddIndices([2, 3, 2])
        A = BlockTensor([st, st], dtype=jnp.float64)
        B = BlockTensor([st, st], dtype=jnp.float64)
        for (i, j) in [(0, 0), (0, 1), (1, 1), (2, 0), (2, 2)]:
            A.set_block((i, j), jnp.asarray(rng.standard_normal((st.block_dims[i], st.block_dims[j]))))
        for (i, j) in [(0, 0), (1, 0), (1, 2), (2, 1)]:
            B.set_block((i, j), jnp.asarray(rng.standard_normal((st.block_dims[i], st.block_dims[j]))))
        out = block_einsum([A, B], [("i", "j"), ("j", "k")], ("i", "k"))
        ref = np.asarray(A.to_dense()) @ np.asarray(B.to_dense())
        np.testing.assert_allclose(np.asarray(out.to_dense()), ref, atol=1e-12)

    def test_intra_tensor_diagonal_selection(self):
        """A label repeated WITHIN one tensor selects its diagonal
        sectors before the join (self_ok path)."""
        from eigenex_tpu.block.block_tensor import BlockTensor, block_einsum
        from eigenex_tpu.core.indices import AddIndices

        rng = np.random.default_rng(2)
        st = AddIndices([2, 2])
        A = BlockTensor([st, st], dtype=jnp.float64)
        for key in [(0, 0), (0, 1), (1, 1)]:
            A.set_block(key, jnp.asarray(rng.standard_normal((2, 2))))
        out = block_einsum([A], [("i", "i")], ("i",))
        dense = np.asarray(A.to_dense())
        np.testing.assert_allclose(np.asarray(out.to_dense()), np.diag(dense), atol=1e-12)
