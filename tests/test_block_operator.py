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
    bt = heisenberg_block_hamiltonian(L)
    op = block_operator(bt)
    res = LanczosEigenSolver(
        op, LanczosOptions(max_eigenvalues=1, tolerance=1e-13, max_subspace=120, seed=0)
    ).compute()
    import numpy as np

    from tests.test_hamiltonians import dense_heisenberg

    ref = np.linalg.eigvalsh(dense_heisenberg(L)).min()
    np.testing.assert_allclose(res.eigenvalues[0], ref, atol=1e-8)
