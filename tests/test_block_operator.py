"""block_operator: the jit-compiled matvec bridge from rank-2
BlockTensor to LinearOperator."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eigenex_tpu.block.block_tensor import BlockTensor
from eigenex_tpu.block.hamiltonians import heisenberg_block_hamiltonian
from eigenex_tpu.block.operator import block_operator
from eigenex_tpu.core.indices import AddIndices
from eigenex_tpu.solvers.lanczos import LanczosEigenSolver, LanczosOptions
from eigenex_tpu.utils.exceptions import BlockTensorError


def test_matvec_matches_dense(rng):
    s1, s2 = AddIndices([2, 3, 1]), AddIndices([4, 2])
    bt = BlockTensor([s1, s2], dtype=np.float64)
    for key in [(0, 0), (1, 1), (2, 0), (1, 0)]:
        bt.set_block(key, rng.standard_normal(bt.intra_block_dims(key)))
    op = block_operator(bt)
    assert op.shape == (6, 6)
    x = rng.standard_normal(6)
    np.testing.assert_allclose(
        op(jnp.asarray(x)), np.asarray(bt.to_dense()) @ x, atol=1e-12
    )


def test_jit_and_grouping(rng):
    # many same-shape blocks → single batched group, works under jit
    s = AddIndices([3] * 5)
    bt = BlockTensor([s, s], dtype=np.float64)
    for i in range(5):
        bt.set_block((i, i), rng.standard_normal((3, 3)))
    op = block_operator(bt)
    x = jnp.asarray(rng.standard_normal(15))
    y = jax.jit(lambda o, v: o.matvec(v))(op, x)
    np.testing.assert_allclose(y, np.asarray(bt.to_dense()) @ np.asarray(x), atol=1e-12)


def test_rank_check():
    with pytest.raises(BlockTensorError):
        block_operator(BlockTensor([[2, 2]], dtype=np.float64))


def test_heisenberg_lanczos_through_block_operator():
    """BASELINE config 3 end-to-end: block-sparse Hamiltonian matvec +
    Lanczos ground state through the full-space operator."""
    L = 8
    bt = heisenberg_block_hamiltonian(L, storage="dense")
    op = block_operator(bt)
    res = LanczosEigenSolver(
        op, LanczosOptions(max_eigenvalues=1, tolerance=1e-13, max_subspace=120, seed=0)
    ).compute()
    import numpy as np

    from tests.test_hamiltonians import dense_heisenberg

    ref = np.linalg.eigvalsh(dense_heisenberg(L)).min()
    np.testing.assert_allclose(res.eigenvalues[0], ref, atol=1e-8)


# ---------------------------------------------------------------------------
# Round-2 scaling rework: batched gather/scatter dense path, sparse
# (COO/BSR) sector blocks, matmat (VERDICT round-1 item 4)
# ---------------------------------------------------------------------------
def test_many_blocks_match_dense(rng):
    # hundreds of stored blocks: the batched path must stay correct (and
    # the traced program no longer grows one slice pair per block)
    nb = 24
    s = AddIndices([4] * nb)
    bt = BlockTensor([s, s], dtype=np.float64)
    for i in range(nb):
        for j in range(nb):
            if (i + j) % 3 == 0:
                bt.set_block((i, j), rng.standard_normal((4, 4)))
    assert bt.num_stored_blocks > 150
    op = block_operator(bt)
    x = rng.standard_normal(4 * nb)
    np.testing.assert_allclose(
        op(jnp.asarray(x)), np.asarray(bt.to_dense()) @ x, atol=1e-12
    )
    X = rng.standard_normal((4 * nb, 3))
    np.testing.assert_allclose(
        op.matmat(jnp.asarray(X)), np.asarray(bt.to_dense()) @ X, atol=1e-12
    )


def test_sparse_coo_blocks_match_dense(rng):
    bt = heisenberg_block_hamiltonian(8, storage="sparse")
    assert bt.has_sparse_blocks
    dense = np.asarray(heisenberg_block_hamiltonian(8, storage="dense").to_dense())
    op = block_operator(bt)
    x = rng.standard_normal(256)
    np.testing.assert_allclose(op(jnp.asarray(x)), dense @ x, atol=1e-12)


def test_sparse_bsr_blocks_match_dense(rng):
    bt = heisenberg_block_hamiltonian(8, storage="bsr", block_shape=(4, 4))
    dense = np.asarray(heisenberg_block_hamiltonian(8, storage="dense").to_dense())
    op = block_operator(bt)
    x = rng.standard_normal(256)
    np.testing.assert_allclose(op(jnp.asarray(x)), dense @ x, atol=1e-12)


def test_sparse_blocks_never_densify_L16():
    """VERDICT item 4's acceptance at L=16: config-3 style ground state
    THROUGH BlockTensor/block_operator matches the direct sector path."""
    from eigenex_tpu.block.hamiltonians import heisenberg_sector_coo, sector_structure

    L = 16
    bt = heisenberg_block_hamiltonian(L, storage="sparse")
    # memory sanity: stored data is O(nnz), not O(dim^2)
    total_nnz = sum(blk.nnz for blk in bt.blocks.values())
    dim = 2**L
    assert total_nnz < dim * (L + 2)
    op = block_operator(bt)
    res = LanczosEigenSolver(
        op,
        LanczosOptions(max_eigenvalues=1, tolerance=1e-13, max_subspace=120,
                       compute_eigenvectors=False),
    ).compute()
    # direct sector path (the round-1 measured pipeline)
    coo = heisenberg_sector_coo(L, L // 2)
    direct = LanczosEigenSolver(
        coo.as_linear_operator(),
        LanczosOptions(max_eigenvalues=1, tolerance=1e-13, max_subspace=120,
                       compute_eigenvectors=False),
    ).compute()
    np.testing.assert_allclose(res.eigenvalues[0], direct.eigenvalues[0], atol=1e-9)


def test_sparse_blocks_guard_dense_only_ops():
    bt = heisenberg_block_hamiltonian(6, storage="sparse")
    with pytest.raises(BlockTensorError):
        bt.contract(bt, [(1, 0)])
    with pytest.raises(BlockTensorError):
        bt.shuffle((1, 0))
    with pytest.raises(BlockTensorError):
        bt.get_element((0, 0))
    # but norms and to_dense work
    dense = np.asarray(heisenberg_block_hamiltonian(6, storage="dense").to_dense())
    np.testing.assert_allclose(float(bt.norm()), np.linalg.norm(dense), atol=1e-10)
    np.testing.assert_allclose(np.asarray(bt.to_dense()), dense, atol=1e-12)


def test_reblock_sliced_matches_dense_roundtrip(rng):
    from eigenex_tpu.block.block_tensor import BlockTensor as BT

    s1, s2 = AddIndices([2, 3, 1]), AddIndices([4, 2])
    bt = BT([s1, s2], dtype=np.float64)
    for key in [(0, 0), (1, 1), (2, 0)]:
        bt.set_block(key, rng.standard_normal(bt.intra_block_dims(key)))
    new = [AddIndices([3, 3]), AddIndices([2, 2, 2])]
    rb = bt.reblock(new)
    np.testing.assert_allclose(
        np.asarray(rb.to_dense()), np.asarray(bt.to_dense()), atol=1e-14
    )
    assert rb.structures == tuple(new)
