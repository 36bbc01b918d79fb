"""Rank-2 BlockTensor as a matrix-free LinearOperator.

The reference applies block-sparse Hamiltonians through
``BlockTensor::contract`` per multiplication (block_tensor.hpp:
1924-2094).  For Krylov iteration that per-call Python dict walk would
dominate, so this bridge compiles the block structure ONCE into a
jit-able matvec: the stored sector blocks are grouped by shape, stacked,
and applied as batched MXU matmuls; scatter back into the direct-sum
vector uses static slices (trace-time offsets from the axis
``AddIndices``).

Works for any sector-sparse rank-2 tensor; for the common block-diagonal
(quantum-number-conserving) case every group is a clean batched GEMM.
"""

from __future__ import annotations

from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

from ..core.operators import LinearOperator
from ..utils.exceptions import BlockTensorError
from .block_tensor import BlockTensor

__all__ = ["block_operator"]


def block_operator(bt: BlockTensor) -> LinearOperator:
    """LinearOperator y = T @ x over the direct-sum space of a rank-2
    BlockTensor (axis 0 output, axis 1 input)."""
    if bt.ndim != 2:
        raise BlockTensorError(f"block_operator requires rank 2, got rank {bt.ndim}")
    s_out, s_in = bt.structures
    out_off = s_out.offsets
    in_off = s_in.offsets

    # group stored blocks by shape → one stacked batched matmul per group
    groups: dict[tuple, list[tuple]] = defaultdict(list)
    for (bo, bi), blk in bt.blocks.items():
        groups[tuple(blk.shape)].append((bo, bi))

    stacked = {}
    plans = []
    for gi, (shape, keys) in enumerate(sorted(groups.items())):
        stacked[gi] = jnp.stack([bt.blocks[k] for k in keys])
        plans.append(
            (
                gi,
                shape,
                tuple((int(in_off[bi]), int(out_off[bo])) for bo, bi in keys),
            )
        )

    n_in = s_in.dim
    n_out = s_out.dim

    def matvec(params, x):
        y = jnp.zeros((n_out,), jnp.result_type(bt.dtype, x.dtype))
        for gi, (bm, bn), offs in plans:
            blocks = params[gi]  # (g, bm, bn)
            xs = jnp.stack([jax.lax.dynamic_slice(x, (i_in,), (bn,)) for i_in, _ in offs])
            ys = jnp.einsum("gij,gj->gi", blocks.astype(y.dtype), xs.astype(y.dtype))
            for g, (_, i_out) in enumerate(offs):
                y = jax.lax.dynamic_update_slice(
                    y, jax.lax.dynamic_slice(y, (i_out,), (bm,)) + ys[g], (i_out,)
                )
        return y

    return LinearOperator(matvec, stacked, (n_out, n_in), bt.dtype)
