"""DTensor — labeled dynamic-rank tensor (the completed intent of the
reference's unfinished DTensor framework, multi_indices.hpp:982-1440)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eigenex_tpu import DTensor, dtensor
from eigenex_tpu.utils.exceptions import EigenexError


@pytest.fixture
def t3(rng):
    x = rng.standard_normal((3, 4, 5))
    return dtensor(jnp.asarray(x), ("i", "j", "k")), x


class TestConstruction:
    def test_labels_must_match_rank(self, rng):
        with pytest.raises(EigenexError):
            dtensor(jnp.zeros((2, 2)), ("i",))

    def test_labels_must_be_unique(self):
        with pytest.raises(EigenexError):
            dtensor(jnp.zeros((2, 2)), ("i", "i"))

    def test_introspection(self, t3):
        t, x = t3
        assert t.ndim == 3 and t.shape == (3, 4, 5)
        assert t.dim("j") == 4 and t.axis("k") == 2
        with pytest.raises(EigenexError):
            t.axis("z")


class TestLabelSurgery:
    def test_rename_and_transpose(self, t3):
        t, x = t3
        r = t.rename(i="a")
        assert r.labels == ("a", "j", "k")
        p = t.transpose_to(("k", "i", "j"))
        np.testing.assert_allclose(p.to_array(), x.transpose(2, 0, 1))
        # to_array with explicit order
        np.testing.assert_allclose(t.to_array(("j", "i", "k")), x.transpose(1, 0, 2))

    def test_rename_absent_raises(self, t3):
        with pytest.raises(EigenexError):
            t3[0].rename(z="q")

    def test_transpose_needs_permutation(self, t3):
        with pytest.raises(EigenexError):
            t3[0].transpose_to(("i", "j"))


class TestAlgebra:
    def test_ewise_auto_aligns(self, t3):
        t, x = t3
        u = t.transpose_to(("k", "j", "i"))  # different layout, same labels
        s = t + u
        np.testing.assert_allclose(s.to_array(), 2 * x, atol=1e-12)
        d = t - u
        np.testing.assert_allclose(d.to_array(), np.zeros_like(x), atol=1e-12)
        h = (2.0 * t) * u  # hadamard after align
        np.testing.assert_allclose(h.to_array(), 2 * x * x, atol=1e-12)

    def test_ewise_label_mismatch_raises(self, t3, rng):
        with pytest.raises(EigenexError):
            t3[0] + dtensor(jnp.asarray(rng.standard_normal((3, 4, 5))), ("i", "j", "z"))

    def test_contract_shared_labels(self, rng):
        A = rng.standard_normal((3, 4))
        B = rng.standard_normal((4, 5))
        ta = dtensor(jnp.asarray(A), ("i", "j"))
        tb = dtensor(jnp.asarray(B), ("j", "k"))
        c = ta.contract(tb)
        assert c.labels == ("i", "k")
        np.testing.assert_allclose(c.to_array(), A @ B, atol=1e-12)

    def test_contract_with_batch_label(self, rng):
        A = rng.standard_normal((6, 3, 4))
        B = rng.standard_normal((6, 4, 5))
        ta = dtensor(jnp.asarray(A), ("b", "i", "j"))
        tb = dtensor(jnp.asarray(B), ("b", "j", "k"))
        c = ta.contract(tb, out_labels=("b", "i", "k"))  # b kept: batch matmul
        np.testing.assert_allclose(c.to_array(), np.einsum("bij,bjk->bik", A, B), atol=1e-12)

    def test_trace_label(self, rng):
        X = rng.standard_normal((4, 4, 3))
        t = dtensor(jnp.asarray(X), ("i", "j", "k"))
        tr = t.trace_label("i", "j")
        np.testing.assert_allclose(tr.to_array(), np.einsum("iik->k", X), atol=1e-12)
        diag = t.trace_label("i", "j", out_label="d")
        assert diag.labels == ("k", "d")
        np.testing.assert_allclose(diag.to_array(), np.einsum("iik->ki", X), atol=1e-12)

    def test_kron_disjoint_labels(self, rng):
        A = rng.standard_normal((2, 3))
        B = rng.standard_normal((4,))
        k = dtensor(jnp.asarray(A), ("i", "j")).kron(dtensor(jnp.asarray(B), ("m",)))
        assert k.labels == ("i", "j", "m")
        np.testing.assert_allclose(k.to_array(), np.einsum("ij,m->ijm", A, B), atol=1e-12)
        with pytest.raises(EigenexError):
            dtensor(jnp.asarray(A), ("i", "j")).kron(dtensor(jnp.asarray(B), ("i",)))

    def test_to_projection_sums_absent(self, t3):
        t, x = t3
        np.testing.assert_allclose(t.to(("j",)).to_array(), x.sum(axis=(0, 2)), atol=1e-12)


class TestPytree:
    def test_jit_through(self, t3):
        t, x = t3

        @jax.jit
        def f(a: DTensor):
            return a.contract(a.rename(i="i2", k="k2"))  # sum over j

        out = f(t)
        want = np.einsum("ijk,ajc->ikac", x, x)
        np.testing.assert_allclose(out.to_array(), want, atol=1e-11)
        assert out.labels == ("i", "k", "i2", "k2")
