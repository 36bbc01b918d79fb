"""KPM spectral density / counts / whole-interval eigensolving.

Oracles: dense eigh histograms and the Laplacian closed-form spectrum."""

import jax.numpy as jnp
import numpy as np
import pytest

from eigenex_tpu.solvers.kpm import (
    chebyshev_moments,
    eigenvalue_count,
    eigsh_range,
    spectral_density,
)
from eigenex_tpu.utils.exceptions import LanczosError


def laplacian_dense(n):
    return 2.0 * np.eye(n) - np.eye(n, k=1) - np.eye(n, k=-1)


def laplacian_spectrum(n):
    return 2.0 - 2.0 * np.cos(np.arange(1, n + 1) * np.pi / (n + 1))


class TestMoments:
    def test_mu0_is_one(self):
        A = jnp.asarray(laplacian_dense(128))
        mu, (lo, hi) = chebyshev_moments(A, 32, n_probes=8, spectral_bounds=(0.0, 4.0))
        np.testing.assert_allclose(mu[0], 1.0, atol=1e-10)
        assert lo < 0.0 < 4.0 < hi

    def test_dos_integrates_to_n(self):
        n = 200
        A = jnp.asarray(laplacian_dense(n))
        lam_g, rho = spectral_density(
            A, 96, n_probes=16, grid=600, spectral_bounds=(0.0, 4.0)
        )
        total = np.trapezoid(rho, lam_g)
        assert abs(total - n) < 0.05 * n

    def test_dos_shape_matches_histogram(self):
        # 1D Laplacian DOS has the 1/√(λ(4−λ)) van-Hove shape: the KPM
        # estimate must correlate strongly with the exact histogram
        n = 400
        A = jnp.asarray(laplacian_dense(n))
        lam_g, rho = spectral_density(
            A, 128, n_probes=16, grid=300, spectral_bounds=(0.0, 4.0)
        )
        lam = laplacian_spectrum(n)
        hist, edges = np.histogram(lam, bins=30, range=(0.0, 4.0))
        centers = (edges[:-1] + edges[1:]) / 2
        rho_i = np.interp(centers, lam_g, rho) * (edges[1] - edges[0])
        mask = hist > 0
        corr = np.corrcoef(hist[mask], rho_i[mask])[0, 1]
        assert corr > 0.9


class TestCounts:
    def test_count_interval(self):
        n = 300
        A = jnp.asarray(laplacian_dense(n))
        lam = laplacian_spectrum(n)
        for iv in ((0.5, 1.5), (1.0, 3.0), (3.5, 4.0)):
            want = int(np.sum((lam >= iv[0]) & (lam <= iv[1])))
            got = eigenvalue_count(
                A, iv, n_moments=200, n_probes=24, spectral_bounds=(0.0, 4.0)
            )
            # KPM counts carry O(DOS × transition-width) edge error —
            # ~10% near the 1D van-Hove singularities at M=200; the
            # eigsh_range slack absorbs exactly this
            assert abs(got - want) < max(0.10 * want, 6), (iv, got, want)

    def test_count_whole_spectrum(self):
        n = 150
        A = jnp.asarray(laplacian_dense(n))
        got = eigenvalue_count(
            A, (-0.1, 4.1), n_moments=120, n_probes=16, spectral_bounds=(0.0, 4.0)
        )
        assert abs(got - n) < 0.03 * n


class TestEigshRange:
    def test_all_pairs_in_interval(self):
        n = 120
        A = jnp.asarray(laplacian_dense(n))
        lam = laplacian_spectrum(n)
        iv = (1.0, 1.6)  # ~11 eigenvalues
        want = lam[(lam >= iv[0]) & (lam <= iv[1])]
        res = eigsh_range(
            A, iv, block_size=10, slack=4, degree=60, tol=1e-10,
            max_iterations=300, spectral_bounds=(0.0, 4.0),
        )
        assert res.converged
        np.testing.assert_allclose(res.eigenvalues, want, atol=1e-7)
        X = np.asarray(res.eigenvectors)
        r = np.asarray(A) @ X - X * res.eigenvalues[None, :]
        assert np.linalg.norm(r, axis=0).max() < 1e-6

    def test_bad_interval_raises(self):
        A = jnp.asarray(laplacian_dense(16))
        with pytest.raises(LanczosError):
            eigsh_range(A, (2.0, 1.0))


# ---------------------------------------------------------------------------
# Round 3: mesh-aware KPM (distributed moment SpMMs + per-slice windows)
# ---------------------------------------------------------------------------
class TestMeshKPM:
    def _operator(self, nbr=21, bs=4, seed=17):
        # 21 block rows: NOT divisible by 8 — exercises the padding path
        import numpy as np
        from eigenex_tpu.sparse.bsr import bsr_from_dense

        rng = np.random.default_rng(seed)
        n = nbr * bs
        A = np.zeros((n, n))
        for r in range(nbr):
            for c in (r, r + 1):
                if c < nbr:
                    A[r*bs:(r+1)*bs, c*bs:(c+1)*bs] = 0.3 * rng.standard_normal((bs, bs))
        A = (A + A.T) / 2 + np.diag(np.linspace(-4.0, 4.0, n))
        return bsr_from_dense(A, (bs, bs)), A

    def test_mesh_moments_match_single_device(self):
        import jax
        import numpy as np
        from jax.sharding import Mesh
        from eigenex_tpu.solvers.kpm import chebyshev_moments

        bsr, A = self._operator()
        mesh = Mesh(np.array(jax.devices("cpu")), ("rows",))
        lo, hi = map(float, bsr.estimate_eigenvalue_range())
        mu_s, _ = chebyshev_moments(bsr, 64, n_probes=8, seed=0,
                                    spectral_bounds=(lo, hi))
        mu_m, _ = chebyshev_moments(bsr, 64, n_probes=8, seed=0,
                                    spectral_bounds=(lo, hi), mesh=mesh)
        # identical probes + identical operator (padding invisible) =>
        # identical moments to fp roundoff
        np.testing.assert_allclose(mu_m, mu_s, atol=1e-12)
        assert abs(mu_m[0] - 1.0) < 1e-12  # per-state normalization

    def test_mesh_count_ignores_padding_zeros(self):
        """The interval around 0 must count only the TRUE eigenvalues:
        the mesh padding adds 3 block rows of eigenvalue 0 that must not
        leak into the estimate."""
        import jax
        import numpy as np
        from jax.sharding import Mesh
        from eigenex_tpu.solvers.kpm import eigenvalue_count

        bsr, A = self._operator()
        ev = np.linalg.eigvalsh(A)
        mesh = Mesh(np.array(jax.devices("cpu")), ("rows",))
        interval = (-0.5, 0.5)
        true_count = int(((ev >= interval[0]) & (ev <= interval[1])).sum())
        est = eigenvalue_count(bsr, interval, n_moments=200, n_probes=16,
                               mesh=mesh, seed=1)
        # stochastic + filter-transition error; padding would add 12
        assert abs(est - true_count) < 0.25 * true_count + 2, (est, true_count)

    def test_mesh_eigsh_range_matches_single_device(self):
        import jax
        import numpy as np
        from jax.sharding import Mesh
        from eigenex_tpu.solvers.kpm import eigsh_range

        bsr, A = self._operator(nbr=16)
        ev = np.linalg.eigvalsh(A)
        interval = (float(ev[20]) - 1e-6, float(ev[30]) + 1e-6)
        mesh = Mesh(np.array(jax.devices("cpu")), ("rows",))
        res_m = eigsh_range(bsr, interval, block_size=10, degree=80,
                            tol=1e-11, mesh=mesh, seed=2)
        want = ev[(ev >= interval[0]) & (ev <= interval[1])]
        np.testing.assert_allclose(np.sort(res_m.eigenvalues), want, atol=1e-9)
        for j in range(res_m.eigenvalues.size):
            v = np.asarray(res_m.eigenvectors[:, j])
            r = np.linalg.norm(A @ v - float(res_m.eigenvalues[j]) * v)
            assert r < 1e-8
