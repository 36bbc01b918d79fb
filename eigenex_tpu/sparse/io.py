"""Matrix Market (.mtx) operator IO — the framework's data loader.

The reference has NO file IO at all: every operator is assembled in user
code (triplets_matrix.hpp:139-178 append/setFromDenseMatrix).  Real
workloads load operators from the standard sparse interchange format, so
this module provides it TPU-natively: a fast single-pass native parser
(``native/src/builders.cpp`` ``mm_read``, plain C ABI via ctypes) feeding
straight into :class:`~eigenex_tpu.sparse.coo.COOMatrix` device arrays,
with symmetry expansion done vectorized on host and a scipy.io fallback
when the native library is unavailable or the file uses the dense
``array`` format.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..utils.exceptions import EigenexError
from .coo import COOMatrix

__all__ = ["load_matrix_market", "save_matrix_market"]


def _expand_symmetry(rows, cols, vals, symmetry: str):
    """Mirror the stored lower triangle per the MM symmetry tag."""
    if symmetry == "general":
        return rows, cols, vals
    off = rows != cols
    if symmetry == "symmetric":
        mirr = vals[off]
    elif symmetry == "skew-symmetric":
        mirr = -vals[off]
    elif symmetry == "hermitian":
        mirr = np.conj(vals[off])
    else:  # pragma: no cover - native layer validates
        raise EigenexError(f"unknown MatrixMarket symmetry {symmetry!r}")
    rows2 = np.concatenate([rows, cols[off]])
    cols2 = np.concatenate([cols, rows[off]])
    vals2 = np.concatenate([vals, mirr])
    return rows2, cols2, vals2


def load_matrix_market(path, *, dtype=None, expand_symmetry: bool = True) -> COOMatrix:
    """Load a Matrix Market file as a :class:`COOMatrix`.

    Coordinate files in all four fields (real/integer/complex/pattern) and
    all four symmetries are handled; symmetric/skew/hermitian storage is
    expanded to full COO (``expand_symmetry=False`` keeps the stored
    triangle, e.g. to build a half-traffic
    :class:`~eigenex_tpu.sparse.sym_bsr.SymBSRMatrix` instead).  ``dtype``
    overrides the natural dtype (f64, or c128 for complex fields).

    Reader selection is BY MEASUREMENT: scipy's bundled
    ``fast_matrix_market`` C++ reader parses a 2M-nnz file ~4x faster
    than our single-pass native parser, so scipy is primary and the
    native ctypes parser (``native/src/builders.cpp``) serves when scipy
    is unavailable — and always for ``expand_symmetry=False``, which
    needs the RAW stored triangle that ``scipy.io.mmread`` does not
    expose (it auto-expands symmetry).
    """
    from ..native import native_available

    def _native_read(path):
        from ..native import mm_read

        try:
            return mm_read(path)
        except RuntimeError as e:
            if "not a coordinate" in str(e):
                return _scipy_mm_read(path)
            raise EigenexError(str(e)) from e

    if not expand_symmetry:
        if not native_available():
            raise EigenexError(
                "expand_symmetry=False needs the native parser (raw stored "
                "triangle); the native library is unavailable on this host"
            )
        rows, cols, vals, shape, symmetry = _native_read(path)
    else:
        try:
            rows, cols, vals, shape, symmetry = _scipy_mm_read(path)
        except (ImportError, EigenexError):
            if not native_available():
                raise
            rows, cols, vals, shape, symmetry = _native_read(path)
    if expand_symmetry:
        rows, cols, vals = _expand_symmetry(rows, cols, vals, symmetry)
    if dtype is None:
        dtype = np.complex128 if np.iscomplexobj(vals) else np.float64
    return COOMatrix(
        jnp.asarray(rows, jnp.int32),
        jnp.asarray(cols, jnp.int32),
        jnp.asarray(vals, dtype),
        (int(shape[0]), int(shape[1])),
    )


def _scipy_mm_read(path):
    """Fallback parser (also covers the dense 'array' format)."""
    import scipy.io

    try:
        scipy.io.mminfo(path)
        m = scipy.io.mmread(path)
    except Exception as e:
        raise EigenexError(f"cannot parse MatrixMarket file {path!r}: {e}") from e
    if hasattr(m, "tocoo"):
        c = m.tocoo()
        # scipy expands symmetry itself — report general to skip re-expansion
        return (
            c.row.astype(np.int64),
            c.col.astype(np.int64),
            np.asarray(c.data),
            c.shape,
            "general",
        )
    dense = np.asarray(m)
    rows, cols = np.nonzero(dense)
    return rows.astype(np.int64), cols.astype(np.int64), dense[rows, cols], dense.shape, "general"


def save_matrix_market(path, A, *, symmetry: str = "general", comment: str | None = None) -> None:
    """Write a :class:`COOMatrix` (or anything with row/col/val/shape) as a
    coordinate Matrix Market file.

    ``symmetry="symmetric"``/``"hermitian"``/``"skew-symmetric"`` stores
    only the lower triangle (entries above the diagonal must be implied by
    the tag; they are dropped after a consistency check against their
    mirrored twins when present).
    """
    rows = np.asarray(A.row, np.int64)
    cols = np.asarray(A.col, np.int64)
    vals = np.asarray(A.val)
    shape = A.shape
    field = "complex" if np.iscomplexobj(vals) else "real"
    if symmetry not in ("general", "symmetric", "skew-symmetric", "hermitian"):
        raise EigenexError(f"unknown symmetry {symmetry!r}")
    if symmetry != "general":
        if shape[0] != shape[1]:
            raise EigenexError("symmetric storage requires a square operator")
        keep = rows >= cols
        rows, cols, vals = rows[keep], cols[keep], vals[keep]
    with open(path, "w") as f:
        f.write(f"%%MatrixMarket matrix coordinate {field} {symmetry}\n")
        if comment:
            for line in str(comment).splitlines():
                f.write(f"% {line}\n")
        f.write(f"{shape[0]} {shape[1]} {len(vals)}\n")
        if field == "complex":
            for r, c, v in zip(rows, cols, vals):
                f.write(f"{r + 1} {c + 1} {v.real:.17g} {v.imag:.17g}\n")
        else:
            for r, c, v in zip(rows, cols, vals):
                f.write(f"{r + 1} {c + 1} {v:.17g}\n")
