"""ctypes loader for the native host-side builders.

Compiles ``src/builders.cpp`` with g++ on first import (cached as a
shared library next to the source; no pip/pybind11 involved) and exposes
typed wrappers.  Every entry point has a pure-NumPy fallback at its call
site — ``NATIVE is None`` simply routes there, so the package works on
machines without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from pathlib import Path

import numpy as np

__all__ = [
    "NATIVE", "native_available", "coo_shrink", "bsr_pack",
    "heisenberg_sector", "mm_info", "mm_read",
    "rcm_permutation", "blk_widths", "bsr_pack_f32", "sym_bsr_pack_f32",
    "sym_bsr_pack_bf16", "bsr_pack_bf16", "build_csr",
]

_SRC = Path(__file__).parent / "src" / "builders.cpp"
_LIB = Path(__file__).parent / "libeigenex_native.so"


def _build() -> bool:
    try:
        cmd = [
            "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-march=native",
            "-pthread",  # std::thread in the packers: explicit link, not implicit
            str(_SRC), "-o", str(_LIB),
        ]
        res = subprocess.run(cmd, capture_output=True, timeout=120)
        if res.returncode != 0:
            sys.stderr.write(f"eigenex_tpu.native build failed:\n{res.stderr.decode()[:2000]}\n")
            return False
        return True
    except Exception as e:  # no toolchain, sandboxed fs, ...
        sys.stderr.write(f"eigenex_tpu.native build unavailable: {e}\n")
        return False


def _load():
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_LIB))
    except OSError:
        return None
    i64 = ctypes.c_int64
    p_i64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    p_i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    p_f64 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    lib.coo_shrink.restype = i64
    lib.coo_shrink.argtypes = [p_i64, p_i64, p_f64, i64, i64, ctypes.c_double]
    lib.bsr_kmax.restype = i64
    lib.bsr_kmax.argtypes = [p_i64, p_i64, i64, i64, i64, i64, i64]
    lib.bsr_pack.restype = i64
    lib.bsr_pack.argtypes = [p_i64, p_i64, p_f64, i64, i64, i64, i64, i64, i64, p_f64, p_i32]
    lib.heisenberg_sector.restype = i64
    lib.heisenberg_sector.argtypes = [i64, i64, ctypes.c_double, ctypes.c_double, i64, p_i64, p_i64, p_f64]
    lib.mm_info.restype = i64
    lib.mm_info.argtypes = [ctypes.c_char_p, p_i64]
    lib.mm_read.restype = i64
    lib.mm_read.argtypes = [ctypes.c_char_p, p_i64, p_i64, p_f64, p_f64, i64]
    p_f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.rcm_permutation.restype = i64
    lib.rcm_permutation.argtypes = [p_i64, p_i64, i64, p_i64]
    lib.blk_widths.restype = i64
    lib.blk_widths.argtypes = [p_i64, p_i64, i64, i64, i64, i64, p_i64, p_i64]
    lib.bsr_pack_sorted_f32.restype = i64
    lib.bsr_pack_sorted_f32.argtypes = [
        p_i64, p_i64, p_f64, i64, p_i64, i64, i64, i64, i64, p_f32, p_i32,
    ]
    lib.sym_bsr_pack_sorted_f32.restype = i64
    lib.sym_bsr_pack_sorted_f32.argtypes = [
        p_i64, p_i64, p_f64, i64, p_i64, i64, i64, p_f32, p_f32, p_i32,
    ]
    p_u16 = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")
    lib.sym_bsr_pack_sorted_bf16.restype = i64
    lib.sym_bsr_pack_sorted_bf16.argtypes = [
        p_i64, p_i64, p_f64, i64, p_i64, i64, i64, p_u16, p_u16, p_i32,
    ]
    lib.bsr_pack_sorted_bf16.restype = i64
    lib.bsr_pack_sorted_bf16.argtypes = [
        p_i64, p_i64, p_f64, i64, p_i64, i64, i64, i64, i64, p_u16, p_i32,
    ]
    lib.sym_bsr_pack_sorted_f32_mt.restype = i64
    lib.sym_bsr_pack_sorted_f32_mt.argtypes = [
        p_i64, p_i64, p_f64, i64, p_i64, i64, i64, p_f32, p_f32, p_i32,
    ]
    lib.build_csr.restype = i64
    lib.build_csr.argtypes = [p_i64, p_i64, i64, i64, p_i64, p_i64]
    return lib


NATIVE = None if os.environ.get("EIGENEX_TPU_NO_NATIVE") else _load()


def native_available() -> bool:
    return NATIVE is not None


def coo_shrink(rows, cols, vals, n_cols: int, threshold: float):
    """Sort row-major, merge duplicates, drop small entries (native).
    Returns (rows, cols, vals) trimmed copies."""
    # the C function sorts/merges IN PLACE — always hand it private copies
    rows = np.array(rows, np.int64, copy=True, order="C")
    cols = np.array(cols, np.int64, copy=True, order="C")
    vals = np.array(vals, np.float64, copy=True, order="C")
    kept = NATIVE.coo_shrink(rows, cols, vals, len(vals), int(n_cols), float(threshold))
    return rows[:kept].copy(), cols[:kept].copy(), vals[:kept].copy()


def bsr_pack(rows, cols, vals, shape, block_shape):
    """Pack float64 triplets into BSR-ELL (native).  Returns (data, block_cols)."""
    bm, bn = block_shape
    m = -(-shape[0] // bm) * bm
    n = -(-shape[1] // bn) * bn
    nbr, nbc = m // bm, n // bn
    rows = np.ascontiguousarray(rows, np.int64)
    cols = np.ascontiguousarray(cols, np.int64)
    vals = np.ascontiguousarray(vals, np.float64)
    kmax = NATIVE.bsr_kmax(rows, cols, len(vals), bm, bn, nbr, nbc)
    data = np.zeros((nbr, kmax, bm, bn), np.float64)
    bcols = np.zeros((nbr, kmax), np.int32)
    rc = NATIVE.bsr_pack(rows, cols, vals, len(vals), bm, bn, nbr, nbc, kmax, data, bcols)
    if rc != 0:
        raise RuntimeError(f"bsr_pack failed with code {rc}")
    return data, bcols, (m, n)


def heisenberg_sector(L: int, n_up: int, J: float, Jz: float, pbc: bool):
    """Sector Hamiltonian triplets (native).  Returns (rows, cols, vals, dim)."""
    from math import comb

    dim = comb(L, n_up)
    n_bonds = (L - 1) + (1 if pbc and L > 2 else 0)
    cap = dim * (1 + n_bonds)
    rows = np.zeros(cap, np.int64)
    cols = np.zeros(cap, np.int64)
    vals = np.zeros(cap, np.float64)
    nnz = NATIVE.heisenberg_sector(L, n_up, float(J), float(Jz), int(bool(pbc)), rows, cols, vals)
    if nnz < 0:
        raise RuntimeError(f"heisenberg_sector failed with code {nnz}")
    return rows[:nnz], cols[:nnz], vals[:nnz], dim


def build_csr(rows, cols, n: int):
    """(rowptr, colidx) adjacency of UNSORTED triplets — one threaded
    histogram + scatter, no argsort/gather (feeds rcm_permutation)."""
    rows = np.ascontiguousarray(rows, np.int64)
    cols = np.ascontiguousarray(cols, np.int64)
    rowptr = np.zeros(n + 1, np.int64)
    colidx = np.zeros(len(cols), np.int64)
    rc = NATIVE.build_csr(rows, cols, len(rows), n, rowptr, colidx)
    if rc != 0:
        raise RuntimeError(f"build_csr failed with code {rc} (row index out of range?)")
    return rowptr, colidx


def rcm_permutation(rowptr, colidx):
    """Reverse Cuthill-McKee ordering of a symmetric-pattern CSR graph.

    Returns perm (int64) with scipy's convention: ``A[perm][:, perm]``
    is banded (perm[i] = original index at new position i)."""
    rowptr = np.ascontiguousarray(rowptr, np.int64)
    colidx = np.ascontiguousarray(colidx, np.int64)
    n = len(rowptr) - 1
    perm = np.zeros(n, np.int64)
    rc = NATIVE.rcm_permutation(rowptr, colidx, n, perm)
    if rc != 0:
        raise RuntimeError(f"rcm_permutation failed with code {rc}")
    return perm


def blk_widths(rows, cols, bm: int, bn: int, nbc: int):
    """One shared sort for the block packers.

    Returns (order, kmax, ku, reach): ``order`` argsorts the triplets by
    (block_row, block_col) and feeds :func:`bsr_pack_f32` /
    :func:`sym_bsr_pack_f32`; kmax/ku are the general/strictly-upper ELL
    widths, reach the block band reach (ku/reach only for bm == bn)."""
    rows = np.ascontiguousarray(rows, np.int64)
    cols = np.ascontiguousarray(cols, np.int64)
    order = np.zeros(len(rows), np.int64)
    out = np.zeros(3, np.int64)
    rc = NATIVE.blk_widths(rows, cols, len(rows), bm, bn, nbc, order, out)
    if rc != 0:
        raise RuntimeError(f"blk_widths failed with code {rc}")
    return order, int(out[0]), int(out[1]), int(out[2])


def bsr_pack_f32(rows, cols, vals, order, nbr, nbc, bm, bn, kmax):
    """General BSR-ELL pack (f32 data) over a blk_widths order."""
    rows = np.ascontiguousarray(rows, np.int64)
    cols = np.ascontiguousarray(cols, np.int64)
    vals = np.ascontiguousarray(vals, np.float64)
    data = np.zeros((nbr, kmax, bm, bn), np.float32)
    bcols = np.zeros((nbr, kmax), np.int32)
    rc = NATIVE.bsr_pack_sorted_f32(
        rows, cols, vals, len(vals), order, bm, bn, nbc, kmax, data, bcols
    )
    if rc != 0:
        raise RuntimeError(f"bsr_pack_sorted_f32 failed with code {rc}")
    return data, bcols


def sym_bsr_pack_f32(rows, cols, vals, order, nbr, b, ku):
    """Symmetric diag + strictly-upper pack (f32, threaded) over a
    blk_widths order.

    Lower-triangle triplets are skipped (their count is returned for the
    caller's symmetry sanity check as ``skipped``)."""
    rows = np.ascontiguousarray(rows, np.int64)
    cols = np.ascontiguousarray(cols, np.int64)
    vals = np.ascontiguousarray(vals, np.float64)
    diag = np.zeros((nbr, b, b), np.float32)
    upper = np.zeros((nbr, ku, b, b), np.float32)
    ucols = np.zeros((nbr, ku), np.int32)
    skipped = NATIVE.sym_bsr_pack_sorted_f32_mt(
        rows, cols, vals, len(vals), order, b, ku, diag, upper, ucols
    )
    if skipped < 0:
        raise RuntimeError(f"sym_bsr_pack_sorted_f32 failed with code {skipped}")
    return diag, upper, ucols, int(skipped)


def sym_bsr_pack_bf16(rows, cols, vals, order, nbr, b, ku):
    """Symmetric pack emitting bfloat16 DIRECTLY (threaded) — no host
    f32 staging buffer and no ml_dtypes astype pass (that cast measured
    ~19M el/s and dominated the round-4 pack wall time).  Returns
    (diag, upper, ucols, skipped) with diag/upper as ml_dtypes.bfloat16
    views of the packed uint16 buffers."""
    import ml_dtypes

    rows = np.ascontiguousarray(rows, np.int64)
    cols = np.ascontiguousarray(cols, np.int64)
    vals = np.ascontiguousarray(vals, np.float64)
    diag = np.zeros((nbr, b, b), np.uint16)
    upper = np.zeros((nbr, ku, b, b), np.uint16)
    ucols = np.zeros((nbr, ku), np.int32)
    skipped = NATIVE.sym_bsr_pack_sorted_bf16(
        rows, cols, vals, len(vals), order, b, ku, diag, upper, ucols
    )
    if skipped < 0:
        raise RuntimeError(f"sym_bsr_pack_sorted_bf16 failed with code {skipped}")
    return (
        diag.view(ml_dtypes.bfloat16),
        upper.view(ml_dtypes.bfloat16),
        ucols,
        int(skipped),
    )


def bsr_pack_bf16(rows, cols, vals, order, nbr, nbc, bm, bn, kmax):
    """General BSR-ELL pack emitting bfloat16 directly (threaded)."""
    import ml_dtypes

    rows = np.ascontiguousarray(rows, np.int64)
    cols = np.ascontiguousarray(cols, np.int64)
    vals = np.ascontiguousarray(vals, np.float64)
    data = np.zeros((nbr, kmax, bm, bn), np.uint16)
    bcols = np.zeros((nbr, kmax), np.int32)
    rc = NATIVE.bsr_pack_sorted_bf16(
        rows, cols, vals, len(vals), order, bm, bn, nbc, kmax, data, bcols
    )
    if rc != 0:
        raise RuntimeError(f"bsr_pack_sorted_bf16 failed with code {rc}")
    return data.view(ml_dtypes.bfloat16), bcols


_MM_ERRORS = {
    -1: "cannot open/read file",
    -2: "not a coordinate MatrixMarket file",
    -3: "unknown field (expect real/integer/complex/pattern)",
    -4: "unknown symmetry (expect general/symmetric/skew-symmetric/hermitian)",
    -5: "malformed size line",
    -6: "malformed or truncated triplet data",
    -7: "capacity smaller than declared nnz",
    -8: "1-based index out of declared range",
}

MM_FIELDS = ("real", "integer", "complex", "pattern")
MM_SYMMETRIES = ("general", "symmetric", "skew-symmetric", "hermitian")


def mm_info(path: str):
    """(rows, cols, nnz, field, symmetry) of a coordinate .mtx file (native)."""
    out = np.zeros(5, np.int64)
    rc = NATIVE.mm_info(str(path).encode(), out)
    if rc != 0:
        raise RuntimeError(f"mm_info({path!r}): {_MM_ERRORS.get(rc, rc)}")
    return (
        int(out[0]), int(out[1]), int(out[2]),
        MM_FIELDS[int(out[3])], MM_SYMMETRIES[int(out[4])],
    )


def mm_read(path: str):
    """Raw triplets of a coordinate .mtx file (native, 0-based).

    Returns (rows, cols, vals, shape, symmetry) — vals complex128 only for
    complex files; symmetry is NOT expanded here (sparse.io does that)."""
    nr, nc, nnz, field, symmetry = mm_info(path)
    rows = np.zeros(nnz, np.int64)
    cols = np.zeros(nnz, np.int64)
    vre = np.zeros(nnz, np.float64)
    vim = np.zeros(nnz, np.float64)
    rc = NATIVE.mm_read(str(path).encode(), rows, cols, vre, vim, nnz)
    if rc < 0:
        raise RuntimeError(f"mm_read({path!r}): {_MM_ERRORS.get(rc, rc)}")
    vals = vre + 1j * vim if field == "complex" else vre
    return rows, cols, vals, (nr, nc), symmetry
