"""Matrix Market IO: native parser vs scipy oracle, round-trips,
symmetry expansion, and error paths."""

import numpy as np
import pytest

import jax.numpy as jnp

from eigenex_tpu.sparse.io import load_matrix_market, save_matrix_market
from eigenex_tpu.sparse.coo import coo_from_dense
from eigenex_tpu.utils.exceptions import EigenexError


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def test_load_general_real(tmp_path):
    p = _write(
        tmp_path,
        "a.mtx",
        "%%MatrixMarket matrix coordinate real general\n"
        "% a comment\n"
        "3 4 4\n"
        "1 1 2.5\n"
        "2 3 -1.0\n"
        "3 4 7\n"
        "1 2 1e-3\n",
    )
    A = load_matrix_market(p)
    assert A.shape == (3, 4)
    D = np.zeros((3, 4))
    D[0, 0] = 2.5
    D[1, 2] = -1.0
    D[2, 3] = 7
    D[0, 1] = 1e-3
    np.testing.assert_allclose(np.asarray(A.to_dense()), D)


def test_load_symmetric_expansion(tmp_path):
    p = _write(
        tmp_path,
        "s.mtx",
        "%%MatrixMarket matrix coordinate real symmetric\n"
        "3 3 4\n"
        "1 1 1.0\n"
        "2 1 5.0\n"
        "3 2 -2.0\n"
        "3 3 4.0\n",
    )
    A = load_matrix_market(p)
    D = np.asarray(A.to_dense())
    np.testing.assert_allclose(D, D.T)
    assert D[0, 1] == 5.0 and D[1, 0] == 5.0
    # keep the stored triangle when asked
    A2 = load_matrix_market(p, expand_symmetry=False)
    assert A2.nnz == 4


def test_load_hermitian_complex(tmp_path):
    p = _write(
        tmp_path,
        "h.mtx",
        "%%MatrixMarket matrix coordinate complex hermitian\n"
        "2 2 2\n"
        "1 1 3.0 0.0\n"
        "2 1 1.0 -2.0\n",
    )
    A = load_matrix_market(p)
    D = np.asarray(A.to_dense())
    np.testing.assert_allclose(D, D.conj().T)
    assert D[1, 0] == 1.0 - 2.0j and D[0, 1] == 1.0 + 2.0j


def test_load_pattern_and_integer(tmp_path):
    p = _write(
        tmp_path,
        "p.mtx",
        "%%MatrixMarket matrix coordinate pattern general\n"
        "2 2 2\n1 2\n2 1\n",
    )
    A = load_matrix_market(p)
    np.testing.assert_allclose(np.asarray(A.to_dense()), [[0, 1], [1, 0]])
    q = _write(
        tmp_path,
        "i.mtx",
        "%%MatrixMarket matrix coordinate integer skew-symmetric\n"
        "2 2 1\n2 1 3\n",
    )
    B = load_matrix_market(q)
    np.testing.assert_allclose(np.asarray(B.to_dense()), [[0, -3], [3, 0]])


def test_native_matches_scipy(tmp_path, key):
    """Native parse == scipy parse on a random sparse operator."""
    import scipy.io
    import scipy.sparse

    rng = np.random.default_rng(0)
    D = rng.standard_normal((17, 9))
    D[np.abs(D) < 1.0] = 0.0
    p = str(tmp_path / "r.mtx")
    scipy.io.mmwrite(p, scipy.sparse.coo_matrix(D))
    A = load_matrix_market(p)
    np.testing.assert_allclose(np.asarray(A.to_dense()), D, atol=1e-15)


def test_save_load_roundtrip(tmp_path, key):
    rng = np.random.default_rng(1)
    D = rng.standard_normal((8, 8))
    D[np.abs(D) < 0.8] = 0.0
    D = D + D.T
    A = coo_from_dense(jnp.asarray(D))
    p = str(tmp_path / "rt.mtx")
    save_matrix_market(p, A, symmetry="symmetric", comment="round trip")
    B = load_matrix_market(p)
    np.testing.assert_allclose(np.asarray(B.to_dense()), D, atol=1e-15)
    # scipy can read what we write
    import scipy.io

    S = scipy.io.mmread(p).toarray()
    np.testing.assert_allclose(S, D, atol=1e-15)


def test_save_load_complex_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    D = rng.standard_normal((6, 6)) + 1j * rng.standard_normal((6, 6))
    D[np.abs(D) < 1.2] = 0.0
    A = coo_from_dense(jnp.asarray(D))
    p = str(tmp_path / "c.mtx")
    save_matrix_market(p, A)
    B = load_matrix_market(p)
    np.testing.assert_allclose(np.asarray(B.to_dense()), D, atol=1e-15)


def test_errors(tmp_path):
    bad = _write(tmp_path, "bad.mtx", "not a matrix market file\n1 2 3\n")
    with pytest.raises(EigenexError):
        load_matrix_market(bad)
    trunc = _write(
        tmp_path,
        "trunc.mtx",
        "%%MatrixMarket matrix coordinate real general\n3 3 5\n1 1 1.0\n",
    )
    with pytest.raises((EigenexError, RuntimeError)):
        load_matrix_market(trunc)
    oob = _write(
        tmp_path,
        "oob.mtx",
        "%%MatrixMarket matrix coordinate real general\n2 2 1\n5 1 1.0\n",
    )
    with pytest.raises((EigenexError, RuntimeError)):
        load_matrix_market(oob)


def test_load_feeds_eigsh(tmp_path):
    """End-to-end: .mtx file -> COOMatrix -> eigsh matches dense eigh."""
    from eigenex_tpu.solvers.api import eigsh

    n = 30
    rng = np.random.default_rng(3)
    D = rng.standard_normal((n, n))
    D = (D + D.T) / 2
    D[np.abs(D) < 1.0] = 0.0
    A = coo_from_dense(jnp.asarray(D))
    p = str(tmp_path / "op.mtx")
    save_matrix_market(p, A, symmetry="symmetric")
    B = load_matrix_market(p)
    res = eigsh(B, k=2, which="SA", tol=1e-12)
    ref = np.linalg.eigvalsh(np.asarray(B.to_dense()))
    np.testing.assert_allclose(res.eigenvalues, ref[:2], atol=1e-9)


def test_scipy_fallback_path(tmp_path, monkeypatch):
    """With the native library disabled the scipy route must serve."""
    import eigenex_tpu.native as nat

    monkeypatch.setattr(nat, "NATIVE", None)
    p = _write(
        tmp_path,
        "f.mtx",
        "%%MatrixMarket matrix coordinate real symmetric\n"
        "2 2 2\n1 1 2.0\n2 1 -1.0\n",
    )
    A = load_matrix_market(p)
    np.testing.assert_allclose(np.asarray(A.to_dense()), [[2, -1], [-1, 0]])


def test_array_format_via_fallback(tmp_path):
    """Dense 'array' format routes to the scipy reader."""
    p = _write(
        tmp_path,
        "d.mtx",
        "%%MatrixMarket matrix array real general\n2 2\n1.0\n3.0\n2.0\n4.0\n",
    )
    A = load_matrix_market(p)
    np.testing.assert_allclose(np.asarray(A.to_dense()), [[1, 2], [3, 4]])


def test_array_format_raw_triangle_refused(tmp_path):
    """expand_symmetry=False on a dense 'array' file must raise, not
    silently return the scipy-expanded matrix (round-3 advisor finding)."""
    p = _write(
        tmp_path,
        "ds.mtx",
        "%%MatrixMarket matrix array real symmetric\n2 2\n1.0\n3.0\n4.0\n",
    )
    with pytest.raises(EigenexError, match="array"):
        load_matrix_market(p, expand_symmetry=False)


def test_save_asymmetric_with_symmetric_tag_raises(tmp_path):
    """The docstring's mirror-consistency check is real now: saving a
    non-symmetric operator with symmetry='symmetric' raises instead of
    silently corrupting the data on round-trip."""
    D = np.array([[1.0, 2.0], [5.0, 3.0]])  # D[0,1] != D[1,0]
    A = coo_from_dense(jnp.asarray(D))
    p = str(tmp_path / "bad_sym.mtx")
    with pytest.raises(EigenexError, match="mirror"):
        save_matrix_market(p, A, symmetry="symmetric")
    # a one-sided upper entry (no twin at all) is refused too
    E = np.array([[0.0, 2.0], [0.0, 0.0]])
    B = coo_from_dense(jnp.asarray(E))
    with pytest.raises(EigenexError, match="no stored"):
        save_matrix_market(p, B, symmetry="symmetric")


def test_save_skew_drops_no_diagonal_and_checks(tmp_path):
    """Skew-symmetric save omits the diagonal (MM spec) and verifies
    anti-symmetry; nonzero diagonal raises."""
    D = np.array([[0.0, 3.0, 0.0], [-3.0, 0.0, -7.0], [0.0, 7.0, 0.0]])
    A = coo_from_dense(jnp.asarray(D))
    p = str(tmp_path / "skew.mtx")
    save_matrix_market(p, A, symmetry="skew-symmetric")
    text = open(p).read()
    assert "skew-symmetric" in text
    B = load_matrix_market(p)
    np.testing.assert_allclose(np.asarray(B.to_dense()), D, atol=1e-15)
    Dbad = D + np.diag([1.0, 0.0, 0.0])
    with pytest.raises(EigenexError, match="diagonal"):
        save_matrix_market(p, coo_from_dense(jnp.asarray(Dbad)), symmetry="skew-symmetric")
    # not actually antisymmetric
    Dns = D.copy()
    Dns[0, 1] = 4.0
    with pytest.raises(EigenexError, match="mirror"):
        save_matrix_market(p, coo_from_dense(jnp.asarray(Dns)), symmetry="skew-symmetric")


def test_save_hermitian_checks(tmp_path):
    """Hermitian save verifies conjugate mirroring + real diagonal."""
    D = np.array([[2.0 + 0j, 1 - 2j], [1 + 2j, 5.0 + 0j]])
    A = coo_from_dense(jnp.asarray(D))
    p = str(tmp_path / "herm.mtx")
    save_matrix_market(p, A, symmetry="hermitian")
    B = load_matrix_market(p)
    np.testing.assert_allclose(np.asarray(B.to_dense()), D, atol=1e-15)
    Dbad = D.copy()
    Dbad[0, 0] = 2.0 + 1j
    with pytest.raises(EigenexError, match="diagonal"):
        save_matrix_market(p, coo_from_dense(jnp.asarray(Dbad)), symmetry="hermitian")


def test_load_skew_with_stored_diagonal_raises(tmp_path):
    """Malformed skew files (stored diagonal) are refused by the loader."""
    p = _write(
        tmp_path,
        "badskew.mtx",
        "%%MatrixMarket matrix coordinate real skew-symmetric\n"
        "2 2 2\n1 1 9.0\n2 1 3.0\n",
    )
    with pytest.raises(EigenexError, match="skew"):
        load_matrix_market(p)


def test_save_large_vectorized_writer(tmp_path):
    """1M-nnz save+load round-trips in seconds (chunked vectorized body,
    not a per-entry Python loop)."""
    import time

    rng = np.random.default_rng(7)
    nnz, n = 1_000_000, 500_000
    r = rng.integers(0, n, nnz)
    c = rng.integers(0, n, nnz)
    v = rng.standard_normal(nnz)

    class Raw:
        row, col, val = r, c, v
        shape = (n, n)

    p = str(tmp_path / "big.mtx")
    t0 = time.time()
    save_matrix_market(p, Raw)
    dt = time.time() - t0
    assert dt < 30.0, f"vectorized writer took {dt:.1f}s for 1M nnz"
    B = load_matrix_market(p)
    assert B.shape == (n, n)
    # duplicates merge on load; spot-check total mass instead of nnz
    np.testing.assert_allclose(float(np.sum(np.asarray(B.val))), v.sum(), rtol=1e-12)
