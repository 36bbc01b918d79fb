"""Chebyshev-filtered subspace iteration — interior windows without
linear solves. Oracles: dense eigh on small operators, Laplacian closed
form."""

import jax.numpy as jnp
import numpy as np
import pytest

from eigenex_tpu.solvers.chebyshev import (
    ChebyshevFilterOptions,
    ChebyshevFilterSolver,
    chebyshev_filter_apply,
    eigsh_window,
)
from eigenex_tpu.core.operators import aslinearoperator
from eigenex_tpu.utils.exceptions import LanczosError


def laplacian_dense(n):
    return 2.0 * np.eye(n) - np.eye(n, k=1) - np.eye(n, k=-1)


def laplacian_spectrum(n):
    return 2.0 - 2.0 * np.cos(np.arange(1, n + 1) * np.pi / (n + 1))


class TestFilterApply:
    def test_damps_interval_amplifies_outside(self):
        n = 64
        A = laplacian_dense(n)
        lam = laplacian_spectrum(n)
        w, V = np.linalg.eigh(A)
        op = aslinearoperator(jnp.asarray(A))
        X = jnp.asarray(np.eye(n)[:, ::4])  # 16 probe vectors
        # damp the upper 3/4 of the spectrum
        lo = lam[n // 4]
        Y = np.asarray(chebyshev_filter_apply(op, X, lo, lam[-1] + 0.01, degree=18))
        # components along damped eigenvectors stay O(1); components along
        # the amplified low end grow by orders of magnitude
        comp = np.abs(V.T @ Y)
        amp = comp[: n // 8].max()
        damped = comp[n // 2 :].max()
        assert amp > 1e3 * damped


class TestWindowSolver:
    def test_interior_window_laplacian(self):
        n = 200
        A = laplacian_dense(n)
        lam = laplacian_spectrum(n)
        # a window strictly inside the spectrum containing ~4 eigenvalues
        window = (float(lam[100]) - 1e-4, float(lam[103]) + 1e-4)
        res = eigsh_window(
            jnp.asarray(A), window, block_size=10, degree=24,
            tol=1e-11, max_iterations=200, spectral_bounds=(0.0, 4.0),
        )
        want = lam[(lam >= window[0]) & (lam <= window[1])]
        assert res.converged
        np.testing.assert_allclose(np.sort(res.eigenvalues), want, atol=1e-8)
        # residual certificate
        X = np.asarray(res.eigenvectors)
        r = A @ X - X * np.asarray(res.eigenvalues)[None, :]
        assert np.linalg.norm(r, axis=0).max() < 1e-7

    def test_low_edge_window(self):
        n = 150
        A = laplacian_dense(n)
        lam = laplacian_spectrum(n)
        res = eigsh_window(
            jnp.asarray(A), (0.0, float(lam[4]) + 1e-5), block_size=8,
            degree=30, tol=1e-11, max_iterations=300, spectral_bounds=(0.0, 4.0),
        )
        assert res.converged
        np.testing.assert_allclose(np.sort(res.eigenvalues), lam[:5], atol=1e-8)

    def test_gershgorin_bounds_from_coo(self):
        from eigenex_tpu.sparse.coo import coo_from_dense

        n = 120
        A = laplacian_dense(n)
        lam = laplacian_spectrum(n)
        coo = coo_from_dense(A)
        window = (float(lam[60]) - 1e-4, float(lam[62]) + 1e-4)
        res = eigsh_window(
            coo.as_linear_operator(), window, block_size=8, degree=24,
            tol=1e-10, max_iterations=200,
        )
        want = lam[(lam >= window[0]) & (lam <= window[1])]
        assert res.converged
        np.testing.assert_allclose(np.sort(res.eigenvalues), want, atol=1e-7)

    def test_empty_window_reports_unconverged(self):
        n = 60
        A = laplacian_dense(n) + 10 * np.eye(n)  # spectrum in [10, 14]
        res = eigsh_window(
            jnp.asarray(A), (2.0, 3.0), block_size=4, degree=10,
            max_iterations=5, spectral_bounds=(9.0, 15.0),
        )
        assert not res.converged
        assert res.eigenvalues.size == 0

    def test_window_covering_spectrum_raises(self):
        A = jnp.asarray(laplacian_dense(20))
        with pytest.raises(LanczosError):
            eigsh_window(A, (-10.0, 10.0), spectral_bounds=(0.0, 4.0))

    def test_bad_window_raises(self):
        A = jnp.asarray(laplacian_dense(20))
        with pytest.raises(LanczosError):
            eigsh_window(A, (2.0, 1.0))

    def test_complex_hermitian(self):
        n = 64
        rng = np.random.default_rng(3)
        A = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
        A = (A + A.conj().T) / 2
        w = np.linalg.eigvalsh(A)
        window = (float(w[n // 2]) - 1e-6, float(w[n // 2 + 2]) + 1e-6)
        res = eigsh_window(
            jnp.asarray(A), window, block_size=8, degree=20, tol=1e-10,
            max_iterations=300, spectral_bounds=(float(w[0]), float(w[-1])),
        )
        want = w[(w >= window[0]) & (w <= window[1])]
        assert res.converged
        np.testing.assert_allclose(np.sort(res.eigenvalues), want, atol=1e-7)


# ---------------------------------------------------------------------------
# Round 3: mesh-aware window filtering (distributed SpMM chain + CholQR2)
# ---------------------------------------------------------------------------
class TestMeshWindow:
    def _operator(self, nbr=24, bs=4, seed=9):
        import numpy as np
        from eigenex_tpu.sparse.bsr import bsr_from_dense

        rng = np.random.default_rng(seed)
        n = nbr * bs
        A = np.zeros((n, n))
        for r in range(nbr):
            for c in (r, r + 1):
                if c < nbr:
                    A[r*bs:(r+1)*bs, c*bs:(c+1)*bs] = 0.3 * rng.standard_normal((bs, bs))
        A = (A + A.T) / 2 + np.diag(np.linspace(0.0, 10.0, n))
        return bsr_from_dense(A, (bs, bs)), A

    def test_cholesky_qr2_orthonormalizes(self):
        import numpy as np
        from eigenex_tpu.solvers.chebyshev import cholesky_qr2

        rng = np.random.default_rng(3)
        X = jnp.asarray(rng.standard_normal((200, 6)) @ np.diag(10.0 ** np.arange(-3, 3)))
        Q = cholesky_qr2(X)
        np.testing.assert_allclose(np.asarray(Q.T @ Q), np.eye(6), atol=1e-12)
        # same column space
        P1 = np.asarray(Q) @ np.asarray(Q).T
        Q2, _ = np.linalg.qr(np.asarray(X))
        np.testing.assert_allclose(P1, Q2 @ Q2.T, atol=1e-9)

    @pytest.mark.parametrize("mode", ["allgather", "halo", "sym_halo"])
    def test_mesh_window_matches_single_device(self, mode):
        import jax
        import numpy as np
        from jax.sharding import Mesh
        from eigenex_tpu.solvers.chebyshev import eigsh_window

        bsr, A = self._operator()
        ev = np.linalg.eigvalsh(A)
        window = (float(ev[40]) - 1e-6, float(ev[45]) + 1e-6)  # 6 interior pairs
        mesh = Mesh(np.array(jax.devices("cpu")), ("rows",))
        res_m = eigsh_window(
            bsr, window, block_size=10, degree=60, tol=1e-11, mesh=mesh,
            matvec_mode=mode,
        )
        res_s = eigsh_window(bsr, window, block_size=10, degree=60, tol=1e-11)
        want = ev[(ev >= window[0]) & (ev <= window[1])]
        np.testing.assert_allclose(np.sort(res_m.eigenvalues), want, atol=1e-10)
        np.testing.assert_allclose(
            np.sort(res_m.eigenvalues), np.sort(res_s.eigenvalues), atol=1e-10
        )
        # true residuals at original length
        for j in range(res_m.eigenvalues.size):
            v = np.asarray(res_m.eigenvectors[:, j])
            r = np.linalg.norm(A @ v - res_m.eigenvalues[j] * v)
            assert r < 1e-8

    def test_mesh_window_with_padding(self):
        """Block-row count NOT divisible by the mesh: padding adds
        eigenvalue 0, but the padding-safe start block keeps it invisible
        even when the window contains 0."""
        import jax
        import numpy as np
        from jax.sharding import Mesh
        from eigenex_tpu.solvers.chebyshev import eigsh_window

        bsr, A = self._operator(nbr=21)  # 21 % 8 != 0
        ev = np.linalg.eigvalsh(A)
        window = (float(ev[0]) - 1e-3, float(ev[3]) + 1e-6)  # contains low end
        mesh = Mesh(np.array(jax.devices("cpu")), ("rows",))
        res = eigsh_window(
            bsr, window, block_size=8, degree=60, tol=1e-11, mesh=mesh,
        )
        want = ev[(ev >= window[0]) & (ev <= window[1])]
        np.testing.assert_allclose(np.sort(res.eigenvalues), want, atol=1e-10)
        assert res.eigenvectors.shape[0] == A.shape[0]

    def test_mesh_window_2d(self):
        """2-axis mesh: the filter SpMM chain runs on the panel-grid
        operator (round-3 mesh_operator_2d)."""
        import jax
        import numpy as np
        from jax.sharding import Mesh
        from eigenex_tpu.solvers.chebyshev import eigsh_window

        bsr, A = self._operator(nbr=24)
        ev = np.linalg.eigvalsh(A)
        window = (float(ev[40]) - 1e-6, float(ev[45]) + 1e-6)
        mesh = Mesh(np.array(jax.devices("cpu")).reshape(2, 4), ("r", "c"))
        res = eigsh_window(bsr, window, block_size=10, degree=60, tol=1e-11, mesh=mesh)
        want = ev[(ev >= window[0]) & (ev <= window[1])]
        np.testing.assert_allclose(np.sort(res.eigenvalues), want, atol=1e-10)
