"""GMRES tests: nonsymmetric solves + shift-invert Arnoldi for interior
eigenvalues of a general operator."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eigenex_tpu.core.operators import aslinearoperator
from eigenex_tpu.solvers.arnoldi import ArnoldiEigenSolver, ArnoldiOptions
from eigenex_tpu.solvers.gmres import (
    gmres_solve,
    gmres_solve_jit,
    shift_invert_operator_general,
)
from eigenex_tpu.utils.prng import random_matrix, random_vector


@pytest.fixture
def system(key):
    n = 50
    A = random_matrix(key, n, n, jnp.float64) + 8 * jnp.eye(n)  # well-conditioned
    b = random_vector(jax.random.fold_in(key, 1), n, jnp.float64)
    return A, b


def test_gmres_host(system):
    A, b = system
    x, rel, cycles = gmres_solve(A, b, tol=1e-12, restart=25)
    np.testing.assert_allclose(np.asarray(A) @ np.asarray(x), b, atol=1e-9)
    assert rel <= 1e-12


def test_gmres_jit(system):
    A, b = system
    x = gmres_solve_jit(A, b, restart=25, cycles=4)
    np.testing.assert_allclose(np.asarray(A) @ np.asarray(x), b, atol=1e-9)


def test_gmres_jit_under_jit(system):
    A, b = system
    op = aslinearoperator(A)
    f = jax.jit(lambda o, rhs: gmres_solve_jit(o, rhs, restart=25, cycles=4))
    x = f(op, b)
    np.testing.assert_allclose(np.asarray(A) @ np.asarray(x), b, atol=1e-9)


def test_gmres_nonsymmetric(key):
    """Convection-diffusion-like strongly nonsymmetric system."""
    n = 64
    A = (
        2 * np.eye(n)
        - 1.4 * np.eye(n, k=1)
        - 0.6 * np.eye(n, k=-1)
    )
    b = np.ones(n)
    x, rel, _ = gmres_solve(jnp.asarray(A), jnp.asarray(b), tol=1e-12, restart=32)
    np.testing.assert_allclose(A @ np.asarray(x), b, atol=1e-8)


def test_shift_invert_arnoldi_interior(key):
    """Interior eigenvalue of a nonsymmetric matrix via shift-invert
    Arnoldi: the eigenvalue nearest σ dominates (A−σI)⁻¹."""
    n = 40
    rng = np.random.default_rng(3)
    evals = np.sort(rng.uniform(-5, 5, n))
    X = rng.standard_normal((n, n))
    A = jnp.asarray(X @ np.diag(evals) @ np.linalg.inv(X))
    target = evals[n // 2]
    sigma = target + 0.05 * (evals[n // 2 + 1] - target)
    si = shift_invert_operator_general(A, sigma, restart=40, cycles=6)
    res = ArnoldiEigenSolver(
        si, ArnoldiOptions(max_eigenvalues=1, tolerance=1e-10, max_subspace=25, seed=0)
    ).compute()
    theta = res.eigenvalues[0]
    lam = sigma + 1.0 / theta
    np.testing.assert_allclose(np.real(lam), target, atol=1e-6)


def test_cgls_least_squares():
    """CGLS solves rectangular least squares (the normal-equations CG)."""
    import numpy as np
    from eigenex_tpu.solvers.cg import cgls_solve
    from eigenex_tpu.core.operators import aslinearoperator

    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((30, 12)))
    b = jnp.asarray(rng.standard_normal(30))
    x, rn, it = cgls_solve(aslinearoperator(A), b, tol=1e-13, max_iters=200)
    x_ref = np.linalg.lstsq(np.asarray(A), np.asarray(b), rcond=None)[0]
    np.testing.assert_allclose(np.asarray(x), x_ref, atol=1e-9)


def test_cgls_indefinite_hermitian():
    """CGLS converges where plain CG (indefinite system) fails."""
    import numpy as np
    from eigenex_tpu.solvers.cg import cgls_solve
    from eigenex_tpu.core.operators import aslinearoperator

    rng = np.random.default_rng(1)
    n = 40
    Q = np.linalg.qr(rng.standard_normal((n, n)))[0]
    lam = np.linspace(-3.0, 3.0, n)
    lam[np.abs(lam) < 0.2] += 0.4  # keep nonsingular
    A = jnp.asarray(Q @ np.diag(lam) @ Q.T)
    b = jnp.asarray(rng.standard_normal(n))
    x, rn, it = cgls_solve(aslinearoperator(A), b, tol=1e-12, max_iters=2000)
    resid = np.linalg.norm(np.asarray(A) @ np.asarray(x) - np.asarray(b))
    assert resid < 1e-10, resid


def test_shift_invert_general_cgls_fallback():
    """GMRES(m) stagnation on a nonnormal complex shift must be rescued
    by the CGLS fallback inside shift_invert_operator_general."""
    import numpy as np
    from eigenex_tpu.solvers.gmres import shift_invert_operator_general
    from eigenex_tpu.core.operators import aslinearoperator

    rng = np.random.default_rng(0)
    n = 80
    A = jnp.asarray(rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n)))
    sigma = 0.5 + 0.2j
    si = shift_invert_operator_general(aslinearoperator(A), sigma, tol=1e-12)
    x = jnp.asarray(rng.standard_normal(n) + 1j * rng.standard_normal(n))
    y = si.matvec(x)
    r = np.asarray(A) @ np.asarray(y) - sigma * np.asarray(y) - np.asarray(x)
    rel = np.linalg.norm(r) / np.linalg.norm(np.asarray(x))
    assert rel < 1e-10, f"SI solve rel residual {rel:.2e}"


def test_shift_invert_hermitian_indefinite_fallback():
    """CG on an interior (indefinite) Hermitian shift must be rescued by
    the CGLS fallback inside shift_invert_operator (cg.py)."""
    import numpy as np
    from eigenex_tpu.solvers.cg import shift_invert_operator
    from eigenex_tpu.core.operators import aslinearoperator

    rng = np.random.default_rng(2)
    n = 50
    Q = np.linalg.qr(rng.standard_normal((n, n)))[0]
    lam = np.linspace(0.0, 5.0, n)
    A = jnp.asarray(Q @ np.diag(lam) @ Q.T)
    sigma = 2.51  # interior: (A - sigma I) indefinite
    si = shift_invert_operator(aslinearoperator(A), sigma, tol=1e-12, max_iters=4000)
    x = jnp.asarray(rng.standard_normal(n))
    y = si.matvec(x)
    r = np.asarray(A) @ np.asarray(y) - sigma * np.asarray(y) - np.asarray(x)
    rel = np.linalg.norm(r) / np.linalg.norm(np.asarray(x))
    assert rel < 1e-9, f"SI solve rel residual {rel:.2e}"


def test_minres_definite_and_indefinite():
    import numpy as np
    from eigenex_tpu.solvers.cg import minres_solve
    from eigenex_tpu.core.operators import aslinearoperator

    rng = np.random.default_rng(3)
    n = 60
    Q = np.linalg.qr(rng.standard_normal((n, n)))[0]
    for lam in (np.linspace(0.5, 5.0, n), np.linspace(-3.0, 3.0, n) + 0.07):
        A = jnp.asarray(Q @ np.diag(lam) @ Q.T)
        b = jnp.asarray(rng.standard_normal(n))
        x, rn, it = minres_solve(aslinearoperator(A), b, tol=1e-12, max_iters=2000)
        resid = np.linalg.norm(np.asarray(A) @ np.asarray(x) - np.asarray(b))
        assert resid < 1e-9, (resid, int(it))


def test_minres_complex_hermitian():
    import numpy as np
    from eigenex_tpu.solvers.cg import minres_solve
    from eigenex_tpu.core.operators import aslinearoperator

    rng = np.random.default_rng(4)
    n = 40
    H = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    H = (H + H.conj().T) / 2 + np.eye(n) * 0.1  # Hermitian indefinite-ish
    A = jnp.asarray(H)
    b = jnp.asarray(rng.standard_normal(n) + 1j * rng.standard_normal(n))
    x, rn, it = minres_solve(aslinearoperator(A), b, tol=1e-12, max_iters=4000)
    resid = np.linalg.norm(H @ np.asarray(x) - np.asarray(b))
    assert resid < 1e-9, (resid, int(it))


def test_minres_rejects_rectangular():
    import pytest
    from eigenex_tpu.solvers.cg import minres_solve
    from eigenex_tpu.core.operators import aslinearoperator
    from eigenex_tpu.utils.exceptions import EigenexError

    with pytest.raises(EigenexError):
        minres_solve(aslinearoperator(jnp.ones((3, 4))), jnp.ones(3))
