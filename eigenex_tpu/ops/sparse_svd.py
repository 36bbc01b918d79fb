"""Truncated SVD via Lanczos on the Gram operator.

BASELINE.json config 4: "truncated SVD of a rank-4 tensor via Lanczos on
the Gram matrix, einsum-built operator".  The reference composes this
from its parts (TensorSVD + Lanczos + einsum); here it is a first-class
routine: the Gram operator G = M†M is a matrix-free ``LinearOperator``
whose matvec is two einsums (never materializing G), the top-``rank``
eigenpairs come from :class:`LanczosEigenSolver` tracking the largest
Ritz indices, and the left factor is recovered as U = M V Σ⁻¹.

Returns a :class:`~eigenex_tpu.ops.tensor_svd.TensorSVDResult` with the
same storage convention (V conjugated) so downstream truncation /
reconstruction code is shared.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..core.operators import LinearOperator
from ..solvers.lanczos import LanczosEigenSolver, LanczosOptions
from ..utils.exceptions import EigenexError
from .tensor_svd import TensorSVDResult

__all__ = ["truncated_svd_via_lanczos", "gram_operator"]


def _gram_matvec(m, x):
    # G x = M† (M x): two einsum contractions, G never materialized
    return jnp.einsum("ij,i->j", jnp.conj(m), jnp.einsum("ij,j->i", m, x))


def gram_operator(m: jax.Array) -> LinearOperator:
    """The einsum-built Gram operator G = M†M of a matrix."""
    m = jnp.asarray(m)
    return LinearOperator(_gram_matvec, m, (m.shape[1], m.shape[1]), m.dtype)


def truncated_svd_via_lanczos(
    t: jax.Array,
    left_axes: int,
    rank: int,
    *,
    tolerance: float = 1e-12,
    max_subspace: int | None = None,
    seed: int = 0,
) -> TensorSVDResult:
    """Top-``rank`` singular triplets of ``t`` split after ``left_axes``
    axes, without ever forming the full SVD."""
    t = jnp.asarray(t)
    if not (0 < left_axes < t.ndim):
        raise EigenexError(f"left_axes must split the tensor: 0 < {left_axes} < {t.ndim}")
    left_dims = t.shape[:left_axes]
    right_dims = t.shape[left_axes:]
    mr = int(np.prod(left_dims))
    mc = int(np.prod(right_dims))
    m = t.reshape(mr, mc)
    small = min(mr, mc)
    if rank > small:
        raise EigenexError(f"rank {rank} exceeds min matricized dim {small}")

    # Lanczos on the smaller Gram side
    use_right = mc <= mr
    g = gram_operator(m if use_right else m.conj().T)
    dim = mc if use_right else mr
    opts = LanczosOptions(
        max_eigenvalues=rank,
        eigenvalue_indices=tuple(range(-rank, 0)),  # largest Ritz values
        tolerance=tolerance,
        max_subspace=min(max_subspace or max(4 * rank + 16, 32), dim),
        seed=seed,
    )
    res = LanczosEigenSolver(g, opts).compute()
    # ascending from the tridiagonal solver → flip to descending σ
    theta = np.maximum(np.asarray(res.eigenvalues)[::-1], 0.0)
    sigma = jnp.asarray(np.sqrt(theta), jnp.abs(t).dtype)
    W = res.eigenvectors[:, ::-1]  # (dim, rank), columns for descending σ
    safe = jnp.where(sigma > 0, sigma, 1.0).astype(m.dtype)
    if use_right:
        V = W  # right singular vectors
        U = (m @ V) / safe[None, :]
    else:
        U = W
        V = (m.conj().T @ U) / jnp.conj(safe)[None, :]
    return TensorSVDResult(
        tensor_u=U.reshape(left_dims + (rank,)),
        singular_values=sigma,
        tensor_v=jnp.conj(V).reshape(right_dims + (rank,)),
        left_dims=tuple(left_dims),
        right_dims=tuple(right_dims),
    )
