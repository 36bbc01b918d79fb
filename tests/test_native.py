"""Native (C++) builder tests: native path must agree exactly with the
pure-NumPy fallback, and the fallback must still work with native
disabled."""

import numpy as np
import pytest

from eigenex_tpu import native


pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="native builders not built on this host"
)


class TestCooShrink:
    def test_matches_python(self, rng):
        n = 500
        r = rng.integers(0, 30, n)
        c = rng.integers(0, 40, n)
        v = rng.standard_normal(n)
        rr, cc, vv = native.coo_shrink(r, c, v, 40, 0.0)
        # python oracle
        from eigenex_tpu.sparse.coo import _shrink

        pr, pc, pv = _shrink(r.astype(np.int32), c.astype(np.int32), v.copy(), 30, 40, 0.0)
        np.testing.assert_array_equal(rr, pr)
        np.testing.assert_array_equal(cc, pc)
        np.testing.assert_allclose(vv, pv, atol=1e-14)

    def test_threshold(self):
        r, c, v = native.coo_shrink([0, 1], [0, 1], [1e-15, 1.0], 2, 1e-12)
        assert len(v) == 1 and v[0] == 1.0


class TestBsrPack:
    def test_matches_python(self, rng):
        from eigenex_tpu.sparse.bsr import BSRMatrix, bsr_from_coo_arrays

        n = 48
        m = rng.standard_normal((n, n))
        m[rng.random((n, n)) > 0.2] = 0
        r, c = np.nonzero(m)
        v = m[r, c]
        bsr_native = bsr_from_coo_arrays(r, c, v, (n, n), (4, 4))  # uses native
        import os

        # force python path
        import jax.numpy as jnp

        data, bcols, shp = native.bsr_pack(r, c, v, (n, n), (4, 4))
        d_native = np.asarray(BSRMatrix(jnp.asarray(data), jnp.asarray(bcols), shp).to_dense())
        np.testing.assert_allclose(d_native[:n, :n], m, atol=1e-14)
        np.testing.assert_allclose(np.asarray(bsr_native.to_dense())[:n, :n], m, atol=1e-14)


class TestHeisenbergNative:
    @pytest.mark.parametrize("L,n_up,pbc", [(6, 3, False), (8, 4, True), (5, 2, False)])
    def test_matches_python(self, L, n_up, pbc):
        r, c, v, dim = native.heisenberg_sector(L, n_up, 1.0, 0.7, pbc)
        d = np.zeros((dim, dim))
        np.add.at(d, (r, c), v)
        from eigenex_tpu.block.hamiltonians import heisenberg_sector_coo

        # float32 dtype routes heisenberg_sector_coo down its pure-Python path
        py = heisenberg_sector_coo(L, n_up, 1.0, 0.7, pbc, dtype=np.float32)
        np.testing.assert_allclose(d, np.asarray(py.to_dense()), atol=1e-6)

    def test_dim(self):
        from math import comb

        _, _, _, dim = native.heisenberg_sector(10, 5, 1.0, 1.0, False)
        assert dim == comb(10, 5)
