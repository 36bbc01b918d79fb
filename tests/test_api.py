"""One-call front-end tests (eigsh/eigs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from eigenex_tpu.solvers.api import eigs, eigsh
from eigenex_tpu.utils.prng import random_hermitian, random_matrix
from eigenex_tpu.utils.exceptions import EigenexError


def test_eigsh_smallest(key):
    n = 80
    A = random_hermitian(key, n, jnp.float64)
    ref = np.linalg.eigvalsh(np.asarray(A))
    res = eigsh(A, k=3, which="SA", tol=1e-12)
    np.testing.assert_allclose(res.eigenvalues, ref[:3], atol=1e-8)


def test_eigsh_largest(key):
    n = 80
    A = random_hermitian(key, n, jnp.float64)
    ref = np.linalg.eigvalsh(np.asarray(A))
    res = eigsh(A, k=2, which="LA", tol=1e-12)
    np.testing.assert_allclose(res.eigenvalues, ref[-2:], atol=1e-8)


def test_eigsh_restarted_small_subspace():
    n = 300
    A = jnp.asarray(2 * np.eye(n) - np.eye(n, k=1) - np.eye(n, k=-1))
    res = eigsh(A, k=2, which="SA", tol=1e-12, max_subspace=30, max_restarts=300)
    exact = [2 - 2 * np.cos((j + 1) * np.pi / (n + 1)) for j in range(2)]
    np.testing.assert_allclose(res.eigenvalues, exact, atol=1e-9)


def test_eigsh_sigma_targets_interior(key):
    n = 60
    A = random_hermitian(key, n, jnp.float64)
    ref = np.linalg.eigvalsh(np.asarray(A))
    target = float(ref[n // 2])
    sigma = target - 1e-3
    res = eigsh(A, k=1, sigma=sigma, tol=1e-10, max_subspace=30)
    np.testing.assert_allclose(res.eigenvalues[0], target, atol=1e-7)


def test_eigs_dominant(key):
    n = 70
    A = random_matrix(key, n, n, jnp.float64)
    ref = np.linalg.eigvals(np.asarray(A))
    ref = ref[np.argsort(-np.abs(ref))]
    res = eigs(A, k=2, tol=1e-9, max_subspace=40)
    np.testing.assert_allclose(
        np.sort(np.abs(res.eigenvalues)), np.sort(np.abs(ref[:2])), atol=1e-6
    )


def test_which_validation(key):
    with pytest.raises(EigenexError):
        eigsh(random_hermitian(key, 4, jnp.float64), k=1, which="XX")


def test_eigsh_sigma_nearest_below(key):
    """Review regression: the nearest eigenvalue lying BELOW sigma has a
    large NEGATIVE theta — tracking only the algebraic top of the
    shift-inverted spectrum missed it."""
    import jax

    A = random_hermitian(jax.random.PRNGKey(5), 60, jnp.float64)
    ref = np.linalg.eigvalsh(np.asarray(A))
    gap = ref[31] - ref[30]
    sigma = float(ref[30] + 0.1 * gap)  # nearest eigenvalue is below sigma
    res = eigsh(A, k=3, sigma=sigma, tol=1e-10, max_subspace=40)
    near = np.sort(ref[np.argsort(np.abs(ref - sigma))[:3]])
    np.testing.assert_allclose(np.sort(res.eigenvalues), near, atol=1e-8)


# ---------------------------------------------------------------------------
# Round-2 surface: sparse operands, mesh routing, refine, inner_tol
# ---------------------------------------------------------------------------
def _laplacian_coo(n):
    from eigenex_tpu.sparse.coo import coo_from_dense

    A = 2 * np.eye(n) - np.eye(n, k=1) - np.eye(n, k=-1)
    return coo_from_dense(A), A


def test_eigsh_accepts_coo_and_bsr():
    from eigenex_tpu.sparse.bsr import bsr_from_dense

    coo, A = _laplacian_coo(64)
    exact = [2 - 2 * np.cos((j + 1) * np.pi / 65) for j in range(2)]
    r1 = eigsh(coo, k=2, which="SA", tol=1e-12)
    np.testing.assert_allclose(r1.eigenvalues, exact, atol=1e-9)
    r2 = eigsh(bsr_from_dense(A, (4, 4)), k=2, which="SA", tol=1e-12)
    np.testing.assert_allclose(r2.eigenvalues, exact, atol=1e-9)


def test_eigsh_mesh_routes_distributed():
    import jax
    from jax.sharding import Mesh

    coo, A = _laplacian_coo(128)
    mesh = Mesh(np.array(jax.devices("cpu")), ("rows",))
    res = eigsh(coo, k=2, which="SA", tol=1e-13, mesh=mesh, max_subspace=48,
                max_restarts=300, block_shape=(4, 4))
    exact = [2 - 2 * np.cos((j + 1) * np.pi / 129) for j in range(2)]
    np.testing.assert_allclose(res.eigenvalues, exact, atol=1e-9)


def test_eigsh_sigma_mesh_one_call_config5():
    """BASELINE config 5 in ONE call: eigsh(A, k, sigma=σ, mesh=mesh)
    routes to the distributed CG shift-invert Lanczos (each matvec a
    mesh-parallel CG solve, halo SpMV, psum'd Gram-Schmidt) and
    back-transforms λ = σ + 1/θ."""
    import jax
    from jax.sharding import Mesh

    coo, A = _laplacian_coo(512)
    mesh = Mesh(np.array(jax.devices("cpu")), ("rows",))
    # sigma just below lambda_1: definite shift (the CG regime), and the
    # two lowest pairs are the ones nearest sigma
    res = eigsh(
        coo, k=2, sigma=-1e-4, tol=1e-13, inner_tol=1e-13, mesh=mesh,
        matvec_mode="halo", block_shape=(4, 4), max_subspace=32,
    )
    exact = [2 - 2 * np.cos((j + 1) * np.pi / 513) for j in range(2)]
    np.testing.assert_allclose(res.eigenvalues, exact, atol=1e-9)
    # Ritz vectors come back at the ORIGINAL length with true residuals
    assert res.eigenvectors.shape == (512, 2)
    for j in range(2):
        v = np.asarray(res.eigenvectors[:, j])
        r = np.linalg.norm(A @ v - res.eigenvalues[j] * v)
        assert r < 1e-7, f"pair {j} residual {r:.2e}"


def test_eigs_mesh_routes_distributed(key):
    import jax
    from jax.sharding import Mesh
    from eigenex_tpu.sparse.coo import coo_from_dense

    rng = np.random.default_rng(1)
    A = np.diag(np.arange(1.0, 65.0)) + 0.05 * rng.standard_normal((64, 64))
    mesh = Mesh(np.array(jax.devices("cpu")), ("rows",))
    res = eigs(coo_from_dense(A), k=2, tol=1e-12, mesh=mesh, max_subspace=40,
               block_shape=(4, 4))
    true = np.linalg.eigvals(A)
    true = true[np.argsort(-np.abs(true))][:2]
    np.testing.assert_allclose(
        np.sort_complex(np.asarray(res.eigenvalues)), np.sort_complex(true), atol=1e-7
    )


def test_eigsh_refine_hits_1e10():
    coo, A = _laplacian_coo(100)
    res = eigsh(coo, k=2, which="SA", tol=1e-6, refine=True)
    exact = [2 - 2 * np.cos((j + 1) * np.pi / 101) for j in range(2)]
    np.testing.assert_allclose(res.eigenvalues, exact, atol=1e-12)


def test_eigs_refine_hits_1e10():
    from eigenex_tpu.sparse.coo import coo_from_dense

    rng = np.random.default_rng(2)
    A = np.diag(np.arange(1.0, 51.0)) + 0.1 * rng.standard_normal((50, 50))
    res = eigs(coo_from_dense(A), k=2, tol=1e-8, refine=True)
    true = np.linalg.eigvals(A)
    true = true[np.argsort(-np.abs(true))][:2]
    np.testing.assert_allclose(
        np.sort_complex(np.asarray(res.eigenvalues)), np.sort_complex(true), atol=1e-11
    )


def test_inner_tol_controls_outer_accuracy():
    """VERDICT item 5's acceptance: a loose inner GMRES tolerance visibly
    degrades sigma-targeted eigenvalues; a tight one reaches 1e-10.

    n=300 > restart=64 so the inner solve genuinely iterates (a full
    single-cycle Krylov solve would be exact regardless of tol); sigma
    sits below the spectrum so restarted GMRES converges (interior sigma
    makes (A - sigma*I) indefinite, where GMRES(m) can stagnate for any
    tol — that failure is reported honestly, not silently)."""
    n = 300
    A = 2 * np.eye(n) - np.eye(n, k=1) - np.eye(n, k=-1)
    target = 2 - 2 * np.cos(np.pi / (n + 1))
    sigma = -1e-3  # close below the spectrum: well-separated thetas
    Aj = jnp.asarray(A)
    loose = eigsh(Aj, k=1, sigma=sigma, tol=1e-12, max_subspace=30, inner_tol=1e-2)
    tight = eigsh(Aj, k=1, sigma=sigma, tol=1e-12, max_subspace=30, inner_tol=1e-13)
    err_loose = abs(loose.eigenvalues[0] - target)
    err_tight = abs(tight.eigenvalues[0] - target)
    assert err_tight <= 1e-10
    assert err_loose > 10 * err_tight


def test_mesh_requires_sparse_operand(key):
    import jax
    from jax.sharding import Mesh

    A = random_hermitian(key, 32, jnp.float64)
    mesh = Mesh(np.array(jax.devices("cpu")), ("rows",))
    with pytest.raises(EigenexError):
        eigsh(A, k=1, mesh=mesh)


# ---------------------------------------------------------------------------
# svds — scipy-style truncated SVD front end (Gram-Lanczos route)
# ---------------------------------------------------------------------------
class TestSvds:
    def test_tall_dense(self, rng):
        from eigenex_tpu import svds

        A = rng.standard_normal((40, 12))
        U, s, Vh = svds(A, k=3, tol=1e-14)
        ref = np.linalg.svd(A, compute_uv=False)[:3]
        np.testing.assert_allclose(s, ref, atol=1e-10)
        # triplets satisfy A v = s u
        np.testing.assert_allclose(
            A @ np.asarray(Vh).conj().T, np.asarray(U) * s[None, :], atol=1e-8
        )

    def test_wide_coo(self, rng):
        from eigenex_tpu import coo_from_dense, svds

        A = rng.standard_normal((10, 50))
        A[np.abs(A) < 0.5] = 0
        U, s, Vh = svds(coo_from_dense(A), k=2, tol=1e-14)
        ref = np.linalg.svd(A, compute_uv=False)[:2]
        np.testing.assert_allclose(s, ref, atol=1e-10)
        np.testing.assert_allclose(
            A.conj().T @ np.asarray(U), np.asarray(Vh).conj().T * s[None, :], atol=1e-8
        )

    def test_values_only_and_restarted(self, rng):
        from eigenex_tpu import svds

        A = rng.standard_normal((300, 200))
        s = svds(A, k=4, max_subspace=40, return_singular_vectors=False, tol=1e-13)
        ref = np.linalg.svd(A, compute_uv=False)[:4]
        np.testing.assert_allclose(s, ref, atol=1e-8)

    def test_requires_adjoint(self):
        from eigenex_tpu import svds
        from eigenex_tpu.core.operators import LinearOperator
        from eigenex_tpu.utils.exceptions import EigenexError

        op = LinearOperator(lambda p, x: x, None, (5, 5), np.float64)
        with pytest.raises(EigenexError):
            svds(op, k=1)

    def test_k_too_large(self, rng):
        from eigenex_tpu import svds
        from eigenex_tpu.utils.exceptions import EigenexError

        with pytest.raises(EigenexError):
            svds(rng.standard_normal((6, 4)), k=5)


# ---------------------------------------------------------------------------
# scipy `which` parity (round 3): BE / LM / SM
# ---------------------------------------------------------------------------
class TestWhichParity:
    def _op(self, n=80, seed=3):
        rng = np.random.default_rng(seed)
        # spectrum straddling zero with distinct |lambda| structure
        d = np.concatenate([np.linspace(-3.0, -0.4, n // 2), np.linspace(0.2, 4.0, n - n // 2)])
        Q = np.linalg.qr(rng.standard_normal((n, n)))[0]
        A = Q @ np.diag(d) @ Q.T
        return jnp.asarray((A + A.T) / 2), np.sort(d)

    def test_be_both_ends(self):
        A, d = self._op()
        res = eigsh(A, k=5, which="BE", tol=1e-12)
        want = np.sort(np.concatenate([d[:2], d[-3:]]))  # kl=2 low, kh=3 high
        np.testing.assert_allclose(res.eigenvalues, want, atol=1e-8)

    def test_lm_largest_magnitude(self):
        A, d = self._op()
        res = eigsh(A, k=4, which="LM", tol=1e-12)
        want = np.sort(d[np.argsort(-np.abs(d))[:4]])
        np.testing.assert_allclose(res.eigenvalues, want, atol=1e-8)
        assert np.all(np.diff(res.eigenvalues) > 0)  # ascending

    def test_sm_smallest_magnitude(self):
        A, d = self._op()
        res = eigsh(A, k=3, which="SM", tol=1e-12)
        want = np.sort(d[np.argsort(np.abs(d))[:3]])
        np.testing.assert_allclose(res.eigenvalues, want, atol=1e-7)

    def test_lm_mesh_route(self):
        import jax
        from jax.sharding import Mesh

        coo, A = _laplacian_coo(96)  # PD: LM == LA here
        mesh = Mesh(np.array(jax.devices("cpu")), ("rows",))
        res = eigsh(coo, k=2, which="LM", tol=1e-13, mesh=mesh,
                    max_subspace=64, max_restarts=300, block_shape=(4, 4))
        exact = np.sort([2 - 2 * np.cos(j * np.pi / 97) for j in (95, 96)])
        np.testing.assert_allclose(res.eigenvalues, exact, atol=1e-8)

    def test_lobpcg_route_rejects_be(self):
        A, _ = self._op(32)
        with pytest.raises(EigenexError):
            eigsh(A, k=2, which="BE", preconditioner=lambda X: X)


def test_eigs_sigma_mesh_interior():
    """Round 3: eigs(A, k, sigma, mesh=...) — GMRES shift-invert through
    the global-array mesh operator, interior targets of a nonsymmetric
    operator on the virtual-8 mesh (with padding: 9 block rows -> 16)."""
    import jax
    from jax.sharding import Mesh
    from eigenex_tpu.sparse.coo import coo_from_dense

    rng = np.random.default_rng(4)
    n = 36
    A = np.diag(np.arange(1.0, n + 1)) + 0.05 * rng.standard_normal((n, n))
    true = np.linalg.eigvals(A)
    sigma = 17.6  # interior, non-degenerate neighborhood
    near = true[np.argsort(np.abs(true - sigma))[:2]]
    mesh = Mesh(np.array(jax.devices("cpu")), ("rows",))
    res = eigs(coo_from_dense(A), k=2, sigma=sigma, tol=1e-11, mesh=mesh,
               max_subspace=30, block_shape=(4, 4))
    assert res.eigenvectors.shape[0] == n
    np.testing.assert_allclose(
        np.sort_complex(np.asarray(res.eigenvalues)), np.sort_complex(near), atol=1e-7
    )
    # residuals of the returned pairs in the ORIGINAL operator
    for j in range(2):
        v = np.asarray(res.eigenvectors[:, j])
        lam = complex(res.eigenvalues[j])
        r = np.linalg.norm(A @ v - lam * v) / np.linalg.norm(v)
        assert r < 1e-6, f"pair {j}: residual {r:.2e}"


def test_eigsh_2d_mesh_route():
    """A 2-axis mesh routes eigsh through the panel-grid operator
    (mesh_operator_2d) with padding-safe v0 — results match closed form."""
    import jax
    from jax.sharding import Mesh

    coo, A = _laplacian_coo(132)  # 33 block rows of 4: pads to 40 over 8
    mesh = Mesh(np.array(jax.devices("cpu")).reshape(2, 4), ("r", "c"))
    res = eigsh(coo, k=2, which="SA", tol=1e-13, mesh=mesh,
                max_subspace=48, max_restarts=300, block_shape=(4, 4))
    exact = [2 - 2 * np.cos((j + 1) * np.pi / 133) for j in range(2)]
    np.testing.assert_allclose(res.eigenvalues, exact, atol=1e-9)
    assert res.eigenvectors.shape == (132, 2)


def test_svds_mesh_rectangular():
    """svds(mesh=): Gram matvecs through two row-partitioned mesh
    operators (A and its adjoint), rows/cols padded independently —
    top-k triplets match LAPACK on a rectangular sparse operand."""
    import jax
    from jax.sharding import Mesh
    from eigenex_tpu.sparse.coo import coo_from_dense
    from eigenex_tpu.solvers.api import svds

    rng = np.random.default_rng(13)
    A = rng.standard_normal((100, 52))  # 25/13 block rows/cols of 4: both pad
    A[np.abs(A) < 1.0] = 0.0  # sparsify
    mesh = Mesh(np.array(jax.devices("cpu")), ("rows",))
    U, s, Vh = svds(coo_from_dense(A), k=3, tol=1e-12, mesh=mesh, block_shape=(4, 4))
    s_ref = np.linalg.svd(A, compute_uv=False)[:3]
    np.testing.assert_allclose(s, s_ref, atol=1e-9)
    assert U.shape == (100, 3) and Vh.shape == (3, 52)
    # triplet identity A v = s u on the ORIGINAL operator
    for j in range(3):
        r = np.linalg.norm(A @ np.conj(np.asarray(Vh))[j] - s[j] * np.asarray(U)[:, j])
        assert r < 1e-8, f"triplet {j}: residual {r:.2e}"
    # values-only path
    s2 = svds(coo_from_dense(A), k=3, tol=1e-12, mesh=mesh, block_shape=(4, 4),
              return_singular_vectors=False)
    np.testing.assert_allclose(s2, s_ref, atol=1e-9)


# ---- scipy `which` parity for the general front end ----

def _which_key_np(lam, which):
    return {
        "LM": -np.abs(lam), "SM": np.abs(lam),
        "LR": -lam.real, "SR": lam.real,
        "LI": -lam.imag, "SI": lam.imag,
    }[which]


@pytest.mark.parametrize("which", ["LM", "LR", "SR", "LI", "SI"])
def test_eigs_which_modes(key, which):
    # complex operator: generic spectrum, no conjugate-pair ties at the
    # selection boundary (scipy eigs semantics)
    n = 90
    A = random_matrix(key, n, n, jnp.complex128)
    lam_all = np.linalg.eigvals(np.asarray(A))
    want = lam_all[np.argsort(_which_key_np(lam_all, which), kind="stable")][:3]
    res = eigs(A, k=3, which=which, tol=1e-10, max_subspace=45, max_restarts=400)
    got = np.asarray(res.eigenvalues)
    np.testing.assert_allclose(
        np.sort_complex(got), np.sort_complex(want), atol=1e-6
    )
    # the result order leads with the most-wanted pair
    keys = _which_key_np(got, which)
    assert keys[0] <= keys[-1] + 1e-9


def test_eigs_which_sm_full_subspace(key):
    # SM without shift-invert needs a generous subspace (same caveat as
    # scipy/ARPACK); exact at m=n is the functional check — sigma=0 is
    # the recommended fast route for interior/smallest magnitude
    n = 40
    A = random_matrix(key, n, n, jnp.complex128)
    lam_all = np.linalg.eigvals(np.asarray(A))
    want = lam_all[np.argsort(np.abs(lam_all))][:2]
    res = eigs(A, k=2, which="SM", tol=1e-10, max_subspace=n)
    np.testing.assert_allclose(
        np.sort_complex(np.asarray(res.eigenvalues)),
        np.sort_complex(want), atol=1e-7,
    )


def test_eigs_which_validation(key):
    with pytest.raises(EigenexError):
        eigs(random_matrix(key, 4, 4, jnp.float64), k=1, which="XY")


def test_eigs_sigma_complex_nonnormal(key):
    """Regression: restarted GMRES(48) stagnates on this complex Gaussian
    shift — the CGLS fallback inside shift_invert_operator_general must
    still produce the true nearest-sigma pairs (previously: silently
    converged to wrong eigenvalues)."""
    rng = np.random.default_rng(0)
    n = 80
    A = jnp.asarray(rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n)))
    lam_all = np.linalg.eigvals(np.asarray(A))
    sigma = 0.5 + 0.2j
    res = eigs(A, k=2, sigma=sigma, tol=1e-10, max_subspace=40)
    assert res.converged and res.termination != "inner_solve_failure"
    d = np.sort(np.abs(np.asarray(res.eigenvalues) - sigma))
    want = np.sort(np.abs(lam_all - sigma))[:2]
    np.testing.assert_allclose(d, want, atol=1e-7)


def test_sigma_residual_honesty_flags_garbage(key):
    """The post-hoc true-residual check turns silently-wrong eigenpairs
    into converged=False + an ERROR trace entry."""
    from eigenex_tpu.solvers.api import _check_true_residuals
    from eigenex_tpu.core.operators import aslinearoperator

    n = 40
    A = random_hermitian(key, n, jnp.float64)
    res = eigsh(A, k=2, which="SA", tol=1e-12)
    assert res.converged
    # corrupt the eigenvectors: residuals on A are now O(1)
    rng = np.random.default_rng(1)
    res.eigenvectors = jnp.asarray(rng.standard_normal((n, 2)))
    res = _check_true_residuals(res, aslinearoperator(A), "unit test")
    assert not res.converged
    assert res.termination == "inner_solve_failure"
    assert res.trace.has_error()


def test_eigsh_sigma_mesh_interior_indefinite():
    """INTERIOR sigma on the mesh: (A − σI) is indefinite, plain CG can
    fail silently — the distributed CGLS fallback must still deliver the
    nearest-σ pairs (previously the docs told users to avoid mesh= here)."""
    import jax
    from jax.sharding import Mesh

    n = 256
    coo, A = _laplacian_coo(n)
    lam = np.array([2 - 2 * np.cos((j + 1) * np.pi / (n + 1)) for j in range(n)])
    sigma = 2.0  # dead middle of the [0, 4] Laplacian spectrum
    mesh = Mesh(np.array(jax.devices("cpu")), ("rows",))
    res = eigsh(
        coo, k=2, sigma=sigma, tol=1e-12, inner_tol=1e-12, mesh=mesh,
        matvec_mode="halo", block_shape=(4, 4), max_subspace=40,
    )
    assert res.termination != "inner_solve_failure", res.trace
    want = np.sort(lam[np.argsort(np.abs(lam - sigma))[:2]])
    np.testing.assert_allclose(np.sort(res.eigenvalues), want, atol=1e-8)
    for j in range(2):
        v = np.asarray(res.eigenvectors[:, j])
        r = np.linalg.norm(A @ v - res.eigenvalues[j] * v)
        assert r < 1e-6, f"pair {j} residual {r:.2e}"


class Test2AxisMeshParity:
    """Every mesh-accepting front end must route a 2-axis mesh through the
    panel-grid operator (or an explicit flatten) — never a silent axis-0
    decomposition (round-3 verdict weak item 4)."""

    @pytest.fixture
    def mesh2(self):
        import jax
        from jax.sharding import Mesh

        dev = np.array(jax.devices("cpu")[:8]).reshape(2, 4)
        return Mesh(dev, ("r", "c"))

    def _sym_coo(self, n, seed):
        import scipy.sparse as sp

        m = sp.random(n, n, density=0.05, random_state=seed)
        m = (m + m.T + sp.eye(n) * 2).tocoo()
        return m

    def test_eigs_2axis_matches_single(self, mesh2):
        import scipy.sparse as sp

        from eigenex_tpu.solvers.api import eigs
        from eigenex_tpu.sparse.coo import COOBuilder

        n = 96
        m = sp.random(n, n, density=0.06, random_state=3).tocoo()
        b = COOBuilder(n, n)
        b.extend(m.row, m.col, m.data)
        coo = b.build()
        r_single = eigs(coo, k=2, tol=1e-12, seed=1)
        r_mesh = eigs(coo, k=2, tol=1e-12, seed=1, mesh=mesh2)
        lam_s = np.sort_complex(np.asarray(r_single.eigenvalues))
        lam_m = np.sort_complex(np.asarray(r_mesh.eigenvalues))
        np.testing.assert_allclose(lam_m, lam_s, atol=1e-10)
        assert r_mesh.eigenvectors.shape[0] == n

    def test_eigs_sigma_2axis_matches_single(self, mesh2):
        from eigenex_tpu.solvers.api import eigs
        from eigenex_tpu.sparse.coo import COOBuilder

        n = 80
        m = self._sym_coo(n, 5)
        b = COOBuilder(n, n)
        b.extend(m.row, m.col, m.data)
        coo = b.build()
        dense = m.toarray()
        evals = np.sort(np.linalg.eigvals(dense).real)
        target = float((evals[10] + evals[11]) / 2)
        r_single = eigs(coo, k=2, sigma=target, tol=1e-10, seed=1)
        r_mesh = eigs(coo, k=2, sigma=target, tol=1e-10, seed=1, mesh=mesh2)
        lam_s = np.sort(np.asarray(r_single.eigenvalues).real)
        lam_m = np.sort(np.asarray(r_mesh.eigenvalues).real)
        np.testing.assert_allclose(lam_m, lam_s, atol=1e-8)

    def test_eigsh_sigma_2axis_matches_single(self, mesh2):
        from eigenex_tpu.solvers.api import eigsh
        from eigenex_tpu.sparse.coo import COOBuilder

        n = 80
        m = self._sym_coo(n, 7)
        b = COOBuilder(n, n)
        b.extend(m.row, m.col, m.data)
        coo = b.build()
        evals = np.sort(np.linalg.eigvalsh(m.toarray()))
        target = float((evals[8] + evals[9]) / 2)
        r_single = eigsh(coo, k=2, sigma=target, tol=1e-10, seed=1)
        r_mesh = eigsh(coo, k=2, sigma=target, tol=1e-10, seed=1, mesh=mesh2)
        lam_s = np.asarray(r_single.eigenvalues)
        lam_m = np.asarray(r_mesh.eigenvalues)
        np.testing.assert_allclose(lam_m, lam_s, atol=1e-8)
        want = np.sort(evals[np.argsort(np.abs(evals - target))[:2]])
        np.testing.assert_allclose(lam_m, want, atol=1e-6)

    def test_svds_2axis_matches_single(self, mesh2):
        import scipy.sparse as sp

        from eigenex_tpu.solvers.api import svds
        from eigenex_tpu.sparse.coo import COOBuilder

        m = sp.random(72, 48, density=0.1, random_state=11).tocoo()
        b = COOBuilder(72, 48)
        b.extend(m.row, m.col, m.data)
        coo = b.build()
        s_ref = np.linalg.svd(m.toarray(), compute_uv=False)[:3]
        _, s_single, _ = svds(coo, k=3, tol=1e-12, seed=1)
        U, s_mesh, Vh = svds(coo, k=3, tol=1e-12, seed=1, mesh=mesh2)
        np.testing.assert_allclose(s_mesh, s_single, atol=1e-10)
        np.testing.assert_allclose(s_mesh, s_ref, atol=1e-8)
        assert U.shape == (72, 3) and Vh.shape == (3, 48)


def test_eigsh_mesh_accepts_sym_bsr_operand():
    """A SymBSRMatrix operand (e.g. an accelerate()-packed operator)
    rides the mesh through the sym_halo mode automatically; eigenvalues
    match the single-device solve."""
    import jax
    from jax.sharding import Mesh

    from eigenex_tpu.solvers.api import eigsh
    from eigenex_tpu.sparse.bsr import bsr_from_coo_arrays
    from eigenex_tpu.sparse.sym_bsr import sym_bsr_from_bsr

    n = 128
    r = np.concatenate([np.arange(n), np.arange(n - 1), np.arange(1, n)])
    c = np.concatenate([np.arange(n), np.arange(1, n), np.arange(n - 1)])
    v = np.concatenate([2.0 * np.ones(n), -np.ones(n - 1), -np.ones(n - 1)])
    sym = sym_bsr_from_bsr(bsr_from_coo_arrays(r, c, v, (n, n), (4, 4)))
    mesh = Mesh(np.array(jax.devices("cpu")[:8]), ("rows",))
    lam_mesh = np.asarray(eigsh(sym, k=3, which="SA", tol=1e-12, mesh=mesh).eigenvalues)
    lam_ref = 2 - 2 * np.cos(np.arange(1, 4) * np.pi / (n + 1))
    np.testing.assert_allclose(lam_mesh, lam_ref, atol=1e-9)
    from eigenex_tpu.utils.exceptions import EigenexError

    with pytest.raises(EigenexError, match="sym_halo"):
        eigsh(sym, k=1, mesh=mesh, matvec_mode="colsplit")
