"""Scalar-sparse acceleration: band-reducing reorder + dense-block packing.

The reference's only sparse operator is the scalar COO scatter
(triplets_matrix.hpp:314-318); its TPU-native translation (gather +
``segment_sum``) is dtype-general but measures **0.04-0.07 Gnnz/s** on
v5e for unstructured operators (the Heisenberg sector Hamiltonian, any
``.mtx`` import): scalar gathers serialize at ~13 cycles/element, so no
XLA formulation of scalar SpMV can be fast.  TPU bandwidth only flows
through dense tiles.

This module is the bridge from "born scalar" to the dense-block Pallas
kernels (:mod:`eigenex_tpu.ops.pallas_spmv`):

1. **Reorder** — a reverse Cuthill-McKee permutation over the
   (symmetrized) pattern concentrates entries near the diagonal
   (Heisenberg L=20: bandwidth 48,620 → 5,573 = 0.03·n).
2. **Pack** — the permuted triplets densify into 128x128 (symmetric:
   diagonal + strictly-upper) or 8x128 (general) BSR-ELL blocks.  Block
   fill is low (~0.4-1%) but the kernels then stream at the HBM roofline
   (measured 610-790 GB/s on v5e), so effective throughput is
   roofline x fill — **2.66 Gnnz/s for the L=24 Heisenberg sector
   (35.2M nnz), 76x the scalar path**; the end-to-end ground state went
   from 64-207 s to 4.3 s warm.  bf16 storage is auto-selected only
   when *lossless* (every value round-trips bf16 exactly — dyadic
   couplings do), and the Pallas dots split the f32 x vector into bf16
   components so bf16 storage never degrades Krylov convergence.
3. **Solve in permuted space** — the permutation is applied once to the
   operator on host; solvers run entirely in permuted coordinates
   (no per-matvec gather), and eigenvectors are unpermuted at the end
   (:meth:`AcceleratedOperator.restore`).

Padding rows/cols (to the block multiple) are structurally zero: with a
zero-padded start vector the Krylov space never leaves the embedded
subspace, so no spurious eigenvalues enter the computed spectrum
(:meth:`AcceleratedOperator.embed` builds such vectors).

Complex operators ride the same pipeline through the real embedding
[[A,−B],[B,A]] (:mod:`eigenex_tpu.sparse.realify`): for Hermitian H the
embedding is real-symmetric, so complex Hermitian operators reach the
half-traffic symmetric kernel — the at-scale path for the reference's
flagship complex sample (sample_lanczos2.cpp:13-57).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from ..utils.exceptions import EigenexError
from ..core.operators import LinearOperator
from .coo import COOMatrix
from .bsr import BSRMatrix, bsr_from_coo_arrays
from .sym_bsr import SymBSRMatrix, sym_bsr_from_bsr
from .realify import realify_coo

__all__ = ["AcceleratedOperator", "accelerate", "band_permutation"]


def _as_host_triplets(A) -> tuple[np.ndarray, np.ndarray, np.ndarray, tuple[int, int]]:
    """(rows, cols, vals, shape) host arrays from any accepted operand."""
    if isinstance(A, COOMatrix):
        return (
            np.asarray(A.row, np.int64),
            np.asarray(A.col, np.int64),
            np.asarray(A.val),
            A.shape,
        )
    if hasattr(A, "tocoo"):  # scipy sparse
        coo = A.tocoo()
        return (
            coo.row.astype(np.int64),
            coo.col.astype(np.int64),
            coo.data,
            coo.shape,
        )
    if isinstance(A, tuple) and len(A) == 4:
        r, c, v, shape = A
        return (
            np.asarray(r, np.int64),
            np.asarray(c, np.int64),
            np.asarray(v),
            (int(shape[0]), int(shape[1])),
        )
    raise EigenexError(
        "accelerate() expects a COOMatrix, a scipy sparse matrix, or a "
        "(rows, cols, vals, shape) tuple"
    )


def _merged(r, c, v, shape):
    """Row-major sorted, duplicate-merged triplets (the pack and the
    symmetry check both need canonical form)."""
    key = r * np.int64(shape[1]) + c
    order = np.argsort(key, kind="stable")
    key, v = key[order], v[order]
    uniq, start = np.unique(key, return_index=True)
    if len(uniq) != len(key):
        sums = np.add.reduceat(v, start)
        key, v = uniq, sums
    return key // shape[1], key % shape[1], v


def _is_hermitian(r, c, v, shape) -> bool:
    """Exact A == Aᴴ on canonical (sorted, merged) triplets."""
    if shape[0] != shape[1]:
        return False
    key = r * np.int64(shape[1]) + c
    tkey = c * np.int64(shape[1]) + r
    torder = np.argsort(tkey, kind="stable")
    if not np.array_equal(key, tkey[torder]):
        return False
    return np.array_equal(v, np.conj(v[torder]))


def band_permutation(rows, cols, n: int) -> np.ndarray:
    """Reverse Cuthill-McKee ordering of the SYMMETRIZED pattern of the
    triplets — perm[i] = original index at new position i, so
    ``A[perm][:, perm]`` is banded (scipy's convention).

    Native C++ BFS (``rcm_permutation`` in native/src/builders.cpp) when
    the toolchain is available, scipy's ``reverse_cuthill_mckee``
    otherwise — the two orderings differ only in tie-breaks; tests assert
    comparable bandwidth."""
    import scipy.sparse as sp

    pattern = sp.csr_matrix(
        (np.ones(len(rows), np.int8), (rows, cols)), shape=(n, n)
    )
    pattern = pattern + pattern.T  # symmetrize for the general case

    from .. import native

    if native.native_available():
        return native.rcm_permutation(
            pattern.indptr.astype(np.int64), pattern.indices.astype(np.int64)
        )
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    return reverse_cuthill_mckee(pattern, symmetric_mode=True).astype(np.int64)


def _bf16_lossless(values: np.ndarray) -> bool:
    """True iff every value round-trips bfloat16 exactly (then bf16
    storage halves SpMV traffic at ZERO accuracy cost — e.g. the dyadic
    ±J/2, ±Jz/4 couplings of spin Hamiltonians)."""
    import ml_dtypes

    v32 = values.astype(np.float32)
    return bool(np.array_equal(v32.astype(ml_dtypes.bfloat16).astype(np.float32), v32))


def _host_cast(a: np.ndarray, dtype):
    """Cast packed block data ON HOST before the device put — uploading
    f32 and casting on device would transiently hold BOTH copies in HBM
    (measured: the 8.4 GiB bf16 L=24 Heisenberg operator OOMed a 16 GB
    chip because its 16.7 GiB f32 precursor was device-resident)."""
    import ml_dtypes

    np_dtype = np.dtype(jnp.dtype(dtype).name) if jnp.dtype(dtype) != jnp.bfloat16 else ml_dtypes.bfloat16
    return jnp.asarray(np.asarray(a).astype(np_dtype))


def _pack_symmetric(r, c, v, n_pad, block, use_native, dtype):
    nbr = n_pad // block
    if use_native:
        from .. import native

        order, _kmax, ku, reach = native.blk_widths(r, c, block, block, nbr)
        diag, upper, ucols, _skipped = native.sym_bsr_pack_f32(
            r, c, v.astype(np.float64), order, nbr, block, ku
        )
        return SymBSRMatrix(
            _host_cast(diag, dtype), _host_cast(upper, dtype), jnp.asarray(ucols),
            (n_pad, n_pad), int(reach),
        )
    bsr = bsr_from_coo_arrays(r, c, v.astype(np.float32), (n_pad, n_pad), (block, block))
    sym = sym_bsr_from_bsr(bsr)
    return sym.astype(dtype) if sym.dtype != jnp.dtype(dtype) else sym


def _pack_general(r, c, v, m_pad, n_pad, bm, bn, use_native, dtype):
    nbr, nbc = m_pad // bm, n_pad // bn
    if use_native:
        from .. import native

        order, kmax, _ku, _reach = native.blk_widths(r, c, bm, bn, nbc)
        data, bcols = native.bsr_pack_f32(
            r, c, v.astype(np.float64), order, nbr, nbc, bm, bn, kmax
        )
        return BSRMatrix(_host_cast(data, dtype), jnp.asarray(bcols), (m_pad, n_pad))
    bsr = bsr_from_coo_arrays(r, c, v.astype(np.float32), (m_pad, n_pad), (bm, bn))
    return bsr.astype(dtype) if bsr.dtype != jnp.dtype(dtype) else bsr


@dataclasses.dataclass(frozen=True)
class AcceleratedOperator:
    """A scalar-sparse operator repacked for the Pallas block kernels.

    Lives in PERMUTED + PADDED coordinates: ``matrix`` is
    ``P·A·Pᵀ`` (zero-padded to the block multiple), where P is the
    band-reducing permutation.  Solvers run here; :meth:`embed` carries
    original-space vectors in and :meth:`restore` carries results back
    (one host-side permutation each — never a per-matvec gather)."""

    matrix: Any  # SymBSRMatrix | BSRMatrix, permuted + padded
    perm: np.ndarray  # (n_work,) original index at permuted position i
    orig_shape: tuple[int, int]  # user-facing shape (pre-embedding)
    symmetric: bool
    complexified: bool  # True: ``matrix`` is the real embedding (dim 2n)
    stats: dict

    @property
    def shape(self) -> tuple[int, int]:
        """Padded working shape (what the solvers see)."""
        return self.matrix.shape

    @property
    def n_work(self) -> int:
        """Unpadded working dimension (2n for complexified operators)."""
        return len(self.perm)

    def as_linear_operator(self, use_pallas: bool | None = None) -> LinearOperator:
        return self.matrix.as_linear_operator(use_pallas=use_pallas)

    def embed(self, v) -> jax.Array:
        """Original-space (n,) or (n, k) vector(s) → permuted, zero-padded
        device array over :attr:`shape`.  Complex inputs realify to
        [Re v; Im v] first when the operator was complexified."""
        v = np.asarray(v)
        squeeze = v.ndim == 1
        if squeeze:
            v = v[:, None]
        if v.shape[0] != self.orig_shape[1]:
            raise EigenexError(
                f"embed expects length {self.orig_shape[1]}, got {v.shape[0]}"
            )
        if self.complexified:
            v = np.concatenate([v.real, v.imag], axis=0)
        elif np.iscomplexobj(v):
            raise EigenexError("complex vector for a real operator")
        out = np.zeros((self.shape[1], v.shape[1]), np.float32)
        out[: self.n_work] = v[self.perm]
        if squeeze:
            out = out[:, 0]
        return jnp.asarray(out)

    def restore(self, V) -> np.ndarray:
        """Permuted-padded (n_pad,) or (n_pad, k) result(s) → original
        space (host array; complex when the operator was complexified)."""
        V = np.asarray(V)
        squeeze = V.ndim == 1
        if squeeze:
            V = V[:, None]
        if V.shape[0] != self.shape[0]:
            raise EigenexError(
                f"restore expects length {self.shape[0]}, got {V.shape[0]}"
            )
        out = np.zeros((self.n_work, V.shape[1]), V.dtype)
        out[self.perm] = V[: self.n_work]
        if self.complexified:
            n = self.orig_shape[0]
            out = out[:n] + 1j * out[n:]
        if squeeze:
            out = out[:, 0]
        return out

    def matvec_oracle(self, x) -> np.ndarray:
        """Host scipy SpMV of the ORIGINAL operator for verification —
        only available when accelerate() was given host triplets small
        enough to keep (stats['oracle'] is set by tests, not here)."""
        raise EigenexError("use the source COOMatrix for oracle matvecs")

    # -- persistence ------------------------------------------------------
    def save(self, path) -> None:
        """Persist the packed operator (blocks, permutation, metadata) as
        a ``.npz`` — the pack (RCM + block fill, minutes at 10^7-nnz
        scale) is the dominant cost of the pipeline and is fully
        deterministic, so production runs pack once and reload.
        bfloat16 block data is stored as a uint16 view (npz has no bf16)."""
        import json as _json

        def host(a):
            a = np.asarray(a)
            if a.dtype.name == "bfloat16":
                return a.view(np.uint16)
            return a

        meta = dict(
            orig_shape=list(self.orig_shape),
            symmetric=self.symmetric,
            complexified=self.complexified,
            stats=self.stats,
            kind="sym" if isinstance(self.matrix, SymBSRMatrix) else "gen",
            dtype=str(jnp.dtype(self.matrix.dtype)),
            shape=list(self.matrix.shape),
            band_reach=getattr(self.matrix, "band_reach", -1),
        )
        arrays = dict(perm=self.perm, meta=np.frombuffer(
            _json.dumps(meta).encode(), dtype=np.uint8
        ))
        if isinstance(self.matrix, SymBSRMatrix):
            arrays.update(
                diag=host(self.matrix.diag_data),
                upper=host(self.matrix.upper_data),
                ucols=np.asarray(self.matrix.upper_cols),
            )
        else:
            arrays.update(
                data=host(self.matrix.data),
                bcols=np.asarray(self.matrix.block_cols),
            )
        np.savez(path, **arrays)

    @classmethod
    def load(cls, path) -> "AcceleratedOperator":
        """Reload a :meth:`save`'d operator (device arrays restored at
        the stored dtype)."""
        import json as _json

        with np.load(path) as z:
            meta = _json.loads(bytes(z["meta"]).decode())
            target = jnp.dtype(meta["dtype"])

            def dev(a):
                if str(target) == "bfloat16" and a.dtype == np.uint16:
                    import ml_dtypes

                    return jnp.asarray(a.view(ml_dtypes.bfloat16))
                return jnp.asarray(a)

            shape = tuple(meta["shape"])
            if meta["kind"] == "sym":
                mat = SymBSRMatrix(
                    dev(z["diag"]), dev(z["upper"]), jnp.asarray(z["ucols"]),
                    shape, int(meta["band_reach"]),
                )
            else:
                mat = BSRMatrix(dev(z["data"]), jnp.asarray(z["bcols"]), shape)
            return cls(
                matrix=mat,
                perm=np.asarray(z["perm"]),
                orig_shape=tuple(meta["orig_shape"]),
                symmetric=bool(meta["symmetric"]),
                complexified=bool(meta["complexified"]),
                stats=meta["stats"],
            )


def dedup_embedded_pairs(lam, vecs, keep_max: int | None = None):
    """Indices to KEEP from a RESTORED doubled-spectrum result.

    Eigenvalues of a complexified (real-embedded) Hermitian operator
    appear up to twice; a clean Krylov space may hold only ONE vector
    per 2-D embedded eigenspace, so dedup goes by value-closeness AND
    vector overlap, never by blind pairing.  ``vecs`` are the restored
    complex eigenvectors (columns, any normalization); eigenvalues are
    assumed sorted the way the caller wants them kept."""
    lam = np.asarray(lam)
    spread = float(np.abs(lam).max()) if lam.size else 1.0
    close = max(spread, 1.0) * 1e-3
    unit = None
    if vecs is not None:
        norms = np.linalg.norm(vecs, axis=0)
        unit = vecs / np.maximum(norms, 1e-300)
    keep: list[int] = []
    for i in range(len(lam)):
        dup = False
        for j in keep:
            if abs(lam[i] - lam[j]) > close:
                continue
            if unit is None or abs(np.vdot(unit[:, j], unit[:, i])) > 0.9:
                dup = True
                break
        if not dup:
            keep.append(i)
        if keep_max is not None and len(keep) >= keep_max:
            break
    return keep


def accelerate(
    A,
    *,
    symmetric: bool | None = None,
    dtype: Any = "auto",
    block: int = 128,
    general_block: tuple[int, int] = (8, 128),
    reorder: bool = True,
    merge_duplicates: bool | None = None,
) -> AcceleratedOperator:
    """Repack a scalar sparse operator for the dense-block TPU kernels.

    Parameters
    ----------
    A : COOMatrix | scipy sparse | (rows, cols, vals, shape)
        The operator, in any host/device scalar-sparse form.  Complex
        operators are embedded as [[A,−B],[B,A]] automatically (Hermitian
        → real-symmetric → the half-traffic kernel).
    symmetric : bool | None
        None (default) detects A == Aᴴ exactly on the triplets.  Passing
        True skips the check (the pack then TRUSTS the claim: lower-
        triangle entries are dropped and reconstructed as mirrors).
    dtype : "auto" | jnp dtype
        "auto" stores bf16 when every value round-trips bf16 exactly
        (lossless; halves traffic), else f32.  An explicit dtype forces.
    block : int
        Symmetric block size (128 = the MXU/lane-native tile; the sym
        kernels require square bn=128 blocks).
    general_block : (bm, bn)
        Block shape for non-symmetric operators.
    reorder : bool
        Apply the RCM band-reducing permutation (disable only for
        operators already ordered, e.g. tridiagonal).
    merge_duplicates : bool | None
        None merges duplicate triplets unless A is a COOMatrix (whose
        builder already merged).

    Returns an :class:`AcceleratedOperator`; ``.stats`` records fill,
    slot counts, bytes, bandwidth before/after, and pack time.
    """
    t0 = time.time()
    r, c, v, shape = _as_host_triplets(A)
    if shape[0] != shape[1]:
        # embed/restore carry ONE permutation; a rectangular operand
        # would need separate row/col maps — pack it with
        # bsr_from_coo_arrays directly instead (svds consumes that)
        raise EigenexError("accelerate() requires a square operator")
    if merge_duplicates is None:
        merge_duplicates = not isinstance(A, COOMatrix)
    if merge_duplicates:
        r, c, v = _merged(r, c, v, shape)

    complexified = bool(np.iscomplexobj(v))
    if complexified:
        if shape[0] != shape[1]:
            raise EigenexError("complex acceleration requires a square operator")
        if symmetric is None:
            symmetric = _is_hermitian(r, c, v, shape)
        emb = realify_coo(
            COOMatrix(r.astype(np.int32), c.astype(np.int32), v, shape)
        )
        r = np.asarray(emb.row, np.int64)
        c = np.asarray(emb.col, np.int64)
        v = np.asarray(emb.val)
        work_shape = emb.shape
    else:
        if symmetric is None:
            symmetric = _is_hermitian(r, c, v, shape)
        work_shape = shape
    n_work = work_shape[0]

    bw_before = int(np.abs(r - c).max()) if len(r) else 0
    if reorder and work_shape[0] == work_shape[1] and len(r):
        perm = band_permutation(r, c, n_work)
        ip = np.empty(n_work, np.int64)
        ip[perm] = np.arange(n_work)
        r, c = ip[r], ip[c]
    else:
        perm = np.arange(n_work, dtype=np.int64)
    bw_after = int(np.abs(r - c).max()) if len(r) else 0

    from .. import native

    use_native = native.native_available() and np.isrealobj(v)
    nnz = len(v)
    if dtype == "auto":
        target = jnp.bfloat16 if _bf16_lossless(v) else jnp.float32
    else:
        target = dtype

    if symmetric:
        # pad to 32 BLOCK rows so the streaming/ring kernels always have
        # a dividing strip (21127 block rows is prime-ish; the pad adds
        # at most 31 empty block rows of slots)
        n_pad = -(-n_work // (32 * block)) * (32 * block)
        mat = _pack_symmetric(r, c, v, n_pad, block, use_native, target)
        slots = mat.diag_data.size + mat.upper_data.size
        applied = mat.diag_data.size + 2 * mat.upper_data.size
        widths = dict(ku=mat.upper_cols.shape[1], band_reach=mat.band_reach)
    else:
        bm, bn = general_block
        if work_shape[0] == work_shape[1]:
            # square stays square (eigs needs it): pad both to lcm(bm, bn)
            mult = int(np.lcm(bm, bn))
            m_pad = n_pad = -(-n_work // mult) * mult
        else:
            m_pad = -(-work_shape[0] // bm) * bm
            n_pad = -(-work_shape[1] // bn) * bn
        mat = _pack_general(r, c, v, m_pad, n_pad, bm, bn, use_native, target)
        slots = mat.data.size
        applied = slots
        widths = dict(kmax=mat.k_max)

    itemsize = jnp.dtype(target).itemsize
    stats = dict(
        nnz=nnz,
        slots=int(slots),
        fill=float(nnz / max(applied, 1)),
        bytes=int(slots * itemsize),
        dtype=str(jnp.dtype(target)),
        bandwidth_before=bw_before,
        bandwidth_after=bw_after,
        symmetric=bool(symmetric),
        complexified=complexified,
        pack_seconds=time.time() - t0,
        **widths,
    )
    return AcceleratedOperator(
        matrix=mat,
        perm=perm,
        orig_shape=shape,
        symmetric=bool(symmetric),
        complexified=complexified,
        stats=stats,
    )
