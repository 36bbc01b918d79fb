"""Hybrid-precision refinement: f32-grade Ritz pairs → 1e-10-grade
eigenvalues (the TPU accuracy bridge)."""

import jax.numpy as jnp
import numpy as np

from eigenex_tpu import LanczosEigenSolver, LanczosOptions, coo_from_dense
from eigenex_tpu.solvers.refine import inverse_iteration_refine, rayleigh_refine


def make_problem(n=80, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n, n))
    A = (A + A.T) / 2
    A[np.abs(A) < 0.8] = 0  # sparsify
    A = (A + A.T) / 2
    return coo_from_dense(A), np.linalg.eigvalsh(A)


def test_rayleigh_refine_squares_the_error():
    coo, ref = make_problem()
    # f32 solve: eigenvalues/vectors good to ~1e-6
    coo32 = coo_from_dense(np.asarray(coo.to_dense(), np.float32))
    # drive the f32 iteration to stagnation (residuals ~ f32 eps · ‖A‖)
    res = LanczosEigenSolver(
        coo32.as_linear_operator(),
        LanczosOptions(max_eigenvalues=3, tolerance=1e-9, max_subspace=80, seed=0),
    ).compute()
    f32_err = np.abs(np.asarray(res.eigenvalues) - ref[:3]).max()
    lam, resid = rayleigh_refine(coo, res.eigenvectors)
    ref_err = np.abs(lam - ref[:3]).max()
    assert ref_err < 1e-8           # ~ε² of the f32 vectors
    assert ref_err < f32_err        # strictly better than the f32 values
    assert np.all(resid < 1e-2)


def test_inverse_iteration_full_precision():
    coo, ref = make_problem(seed=1)
    coo32 = coo_from_dense(np.asarray(coo.to_dense(), np.float32))
    res = LanczosEigenSolver(
        coo32.as_linear_operator(),
        LanczosOptions(max_eigenvalues=2, max_subspace=80, seed=1),
    ).compute()
    lam, X, resid = inverse_iteration_refine(coo, res.eigenvectors)
    np.testing.assert_allclose(lam, ref[:2], atol=1e-11)
    assert np.all(resid < 1e-9)
    # vectors are true f64 eigenvectors now
    d = np.asarray(coo.to_dense())
    np.testing.assert_allclose(d @ X, X * lam[None, :], atol=1e-9)
