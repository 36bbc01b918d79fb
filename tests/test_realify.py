"""Real-embedding tests: complex Hermitian eigenproblems through the
all-real (TPU-safe) path."""

import jax.numpy as jnp
import numpy as np
import pytest

from eigenex_tpu import COOBuilder, LanczosEigenSolver, LanczosOptions, coo_from_dense
from eigenex_tpu.sparse.realify import (
    complex_from_real,
    dedup_doubled_eigenvalues,
    real_from_complex,
    realify_coo,
)


def complex_hermitian_coo(n=40, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    A[rng.random((n, n)) > 0.3] = 0
    H = (A + A.conj().T) / 2
    return coo_from_dense(H), H


def test_embedding_matvec(rng):
    coo, H = complex_hermitian_coo()
    R = realify_coo(coo)
    assert R.shape == (80, 80)
    z = rng.standard_normal(40) + 1j * rng.standard_normal(40)
    y_complex = H @ z
    y_real = np.asarray(R.matvec(jnp.asarray(real_from_complex(jnp.asarray(z)))))
    np.testing.assert_allclose(complex_from_real(y_real), y_complex, atol=1e-12)


def test_embedding_symmetric():
    coo, _ = complex_hermitian_coo()
    R = np.asarray(realify_coo(coo).to_dense())
    np.testing.assert_allclose(R, R.T, atol=1e-14)


def test_doubled_spectrum():
    coo, H = complex_hermitian_coo()
    R = np.asarray(realify_coo(coo).to_dense())
    ev_r = np.linalg.eigvalsh(R)
    ev_c = np.linalg.eigvalsh(H)
    np.testing.assert_allclose(ev_r, np.sort(np.repeat(ev_c, 2)), atol=1e-10)
    np.testing.assert_allclose(dedup_doubled_eigenvalues(ev_r), ev_c, atol=1e-8)


def test_real_passthrough():
    coo = coo_from_dense(np.eye(3))
    assert realify_coo(coo) is coo


def test_lanczos_on_realified_matches_complex_oracle():
    """The headline use: complex Hermitian ground state computed entirely
    with real arithmetic (the TPU-compatible path)."""
    n = 60
    b = COOBuilder(n, n, np.complex128)
    for i in range(n):
        b.append(i, i, 2.0)
        if i + 1 < n:
            b.append(i, i + 1, -1.0j)
            b.append(i + 1, i, +1.0j)
    coo = b.build()
    ref = np.linalg.eigvalsh(np.asarray(coo.to_dense()))

    R = realify_coo(coo)
    res = LanczosEigenSolver(
        R.as_linear_operator(),
        LanczosOptions(max_eigenvalues=2, tolerance=1e-14, max_subspace=2 * n, seed=0),
    ).compute()
    # doubled spectrum: Ritz values pair up; first two pairs = lowest two λ
    got = dedup_doubled_eigenvalues(res.eigenvalues)
    np.testing.assert_allclose(got[:1], ref[:1], atol=1e-9)
    # eigenvector reassembles into a complex eigenvector of H
    v = complex_from_real(np.asarray(res.eigenvectors[:, 0]))
    Hd = np.asarray(coo.to_dense())
    r = Hd @ v - ref[0] * v
    assert np.linalg.norm(r) < 1e-7
