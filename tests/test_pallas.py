"""Pallas SpMV kernel tests in interpreter mode (CPU) — the XLA BSR path
is the oracle; the real-TPU timing runs live in bench.py."""

import jax.numpy as jnp
import numpy as np
import pytest

from eigenex_tpu.ops.pallas_spmv import bsr_matmat_pallas, bsr_matvec_pallas
from eigenex_tpu.sparse import bsr_from_coo_arrays


def banded_bsr(nbr, bm, dtype=np.float32, seed=0):
    rng = np.random.default_rng(seed)
    rows, cols, vals = [], [], []
    for r in range(nbr):
        for c in (r - 1, r, r + 1):
            if 0 <= c < nbr:
                blk = rng.standard_normal((bm, bm)).astype(dtype)
                rr, cc = np.meshgrid(np.arange(bm), np.arange(bm), indexing="ij")
                rows.append(r * bm + rr.ravel())
                cols.append(c * bm + cc.ravel())
                vals.append(blk.ravel())
    n = nbr * bm
    return bsr_from_coo_arrays(
        np.concatenate(rows), np.concatenate(cols), np.concatenate(vals), (n, n), (bm, bm)
    )


class TestPallasSpMV:
    def test_matvec_interpret_matches_xla(self):
        bsr = banded_bsr(16, 128)
        x = jnp.asarray(np.random.default_rng(1).standard_normal(bsr.shape[1]).astype(np.float32))
        y_ref = bsr.matvec(x)
        y = bsr_matvec_pallas(bsr, x, interpret=True)
        np.testing.assert_allclose(y, y_ref, rtol=2e-5, atol=1e-4)

    def test_matmat_interpret_matches_xla(self):
        bsr = banded_bsr(8, 128)
        X = jnp.asarray(
            np.random.default_rng(2).standard_normal((bsr.shape[1], 8)).astype(np.float32)
        )
        y_ref = bsr.matmat(X)
        y = bsr_matmat_pallas(bsr, X, interpret=True)
        np.testing.assert_allclose(y, y_ref, rtol=2e-5, atol=1e-4)

    def test_fallback_f64(self):
        """f64 silently takes the XLA path (TPU MXU is f32/bf16)."""
        bsr = banded_bsr(4, 8, dtype=np.float64)
        x = jnp.asarray(np.random.default_rng(3).standard_normal(bsr.shape[1]))
        np.testing.assert_allclose(bsr_matvec_pallas(bsr, x), bsr.matvec(x), atol=1e-12)

    def test_fallback_odd_rows(self):
        """Row counts that violate the tile rules fall back cleanly."""
        bsr = banded_bsr(3, 128)  # 3 % 8 != 0
        x = jnp.asarray(np.random.default_rng(4).standard_normal(bsr.shape[1]).astype(np.float32))
        np.testing.assert_allclose(
            bsr_matvec_pallas(bsr, x), bsr.matvec(x), rtol=2e-5, atol=1e-4
        )