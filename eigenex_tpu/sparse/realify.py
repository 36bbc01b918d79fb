"""Real embedding of complex operators — complex Krylov on complex-free TPUs.

The reference templates its solvers over complex scalars
(sample_lanczos2.cpp:13-57); TPU backends (notably the experimental axon
platform on this machine) have **no complex dtype at all**.  SURVEY.md
§7 prescribes "complex as paired real arrays" for the TPU path; the
clean algebraic form of that is the standard real embedding

    z = x + i y   ↦   [x, y]              (stacked real vector, dim 2n)
    H = A + i B   ↦   [[A, -B], [B, A]]   (real matrix, dim 2n x 2n)

For Hermitian H (A symmetric, B antisymmetric) the embedding is real
**symmetric**, and its spectrum is that of H with every eigenvalue
doubled: each complex eigenpair (λ, v) yields the orthogonal real pair
[Re v, Im v] and [-Im v, Re v].  So complex Hermitian eigenproblems run
through the entirely-real TPU Lanczos path; callers deduplicate the
doubled Ritz values (:func:`dedup_doubled_eigenvalues`) and reassemble
complex vectors (:func:`complex_from_real`).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..utils.exceptions import EigenexError
from ..utils.tolerance import real_dtype_of
from .coo import COOMatrix

__all__ = [
    "realify_coo",
    "real_from_complex",
    "complex_from_real",
    "dedup_doubled_eigenvalues",
]


def realify_coo(coo: COOMatrix) -> COOMatrix:
    """[[A, -B], [B, A]] real embedding of a complex COO matrix.

    Real inputs are returned unchanged.  Entries with zero imaginary
    (or zero real) part are dropped from the corresponding quadrant."""
    if not jnp.issubdtype(coo.dtype, jnp.complexfloating):
        return coo
    n_r, n_c = coo.shape
    r = np.asarray(coo.row, np.int64)
    c = np.asarray(coo.col, np.int64)
    v = np.asarray(coo.val)
    a, b = v.real, v.imag
    rows, cols, vals = [], [], []
    am = a != 0
    bm = b != 0
    # top-left A, bottom-right A
    rows += [r[am], r[am] + n_r]
    cols += [c[am], c[am] + n_c]
    vals += [a[am], a[am]]
    # top-right -B, bottom-left B
    rows += [r[bm], r[bm] + n_r]
    cols += [c[bm] + n_c, c[bm]]
    vals += [-b[bm], b[bm]]
    rr = np.concatenate(rows)
    cc = np.concatenate(cols)
    vv = np.concatenate(vals)
    order = np.lexsort((cc, rr))
    rdt = real_dtype_of(coo.dtype)
    return COOMatrix(
        jnp.asarray(rr[order].astype(np.int32)),
        jnp.asarray(cc[order].astype(np.int32)),
        jnp.asarray(vv[order].astype(rdt)),
        (2 * n_r, 2 * n_c),
    )


def real_from_complex(z) -> jax.Array:
    """z (n,) complex → [Re z, Im z] (2n,) real."""
    z = jnp.asarray(z)
    return jnp.concatenate([jnp.real(z), jnp.imag(z)])


def complex_from_real(x) -> np.ndarray:
    """[x, y] (2n,) real → x + i y (n,) complex (host array; complex
    device arrays may not exist on the TPU backend)."""
    x = np.asarray(x)
    if x.shape[-1] % 2:
        raise EigenexError("realified vector length must be even")
    n = x.shape[-1] // 2
    return x[..., :n] + 1j * x[..., n:]


def dedup_doubled_eigenvalues(evals: np.ndarray, tol: float | None = None) -> np.ndarray:
    """Collapse the doubled spectrum of a realified Hermitian operator:
    consecutive pairs within ``tol`` merge to one eigenvalue."""
    evals = np.asarray(evals)
    if tol is None:
        spread = float(evals.max() - evals.min()) if evals.size > 1 else 1.0
        tol = max(spread, 1.0) * 1e-8
    out = []
    i = 0
    while i < len(evals):
        if i + 1 < len(evals) and abs(evals[i + 1] - evals[i]) <= tol:
            out.append((evals[i] + evals[i + 1]) / 2)
            i += 2
        else:
            out.append(evals[i])
            i += 1
    return np.asarray(out)
