"""Small-surface coverage: profiling utilities, Arnoldi warm resume,
COOBuilder.extend, misc operator edges."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eigenex_tpu import COOBuilder, aslinearoperator
from eigenex_tpu.solvers.arnoldi import ArnoldiEigenSolver, ArnoldiOptions
from eigenex_tpu.utils.profiling import PhaseTimer, annotate
from eigenex_tpu.utils.prng import random_matrix


def test_phase_timer():
    t = PhaseTimer()
    with t("a"):
        pass
    with t("a"):
        pass
    with t("b"):
        pass
    assert t.counts["a"] == 2 and t.counts["b"] == 1
    s = t.summary()
    assert "a" in s and "ms/call" in s


def test_annotate_context():
    with annotate("region"):
        x = jnp.ones(4) + 1
    assert float(x.sum()) == 8.0


def test_arnoldi_continue_to_compute(key):
    """Warm resume retains the basis/Hessenberg (arnoldi.hpp:720-736)."""
    n = 60
    A = random_matrix(key, n, n, jnp.float64)
    solver = ArnoldiEigenSolver(
        A, ArnoldiOptions(max_eigenvalues=2, tolerance=1e-13, max_subspace=8, seed=0)
    )
    r1 = solver.compute()
    assert r1.termination == "max_iterations"
    solver.set_max_subspace(n)
    r2 = solver.continue_to_compute()
    assert r2.iterations > r1.iterations
    ref = np.linalg.eigvals(np.asarray(A))
    ref = ref[np.argsort(-np.abs(ref))]
    np.testing.assert_allclose(
        np.sort(np.abs(r2.eigenvalues)), np.sort(np.abs(ref[:2])), atol=1e-7
    )


def test_coo_builder_extend():
    b = COOBuilder(4, 4)
    b.extend([0, 1, 1], [1, 2, 2], [1.0, 2.0, 3.0])  # duplicate (1,2) merges
    coo = b.build()
    d = np.asarray(coo.to_dense())
    assert d[0, 1] == 1.0 and d[1, 2] == 5.0
    from eigenex_tpu.utils.exceptions import EigenexError

    with pytest.raises(EigenexError):
        b.extend([9], [0], [1.0])


def test_operator_call_and_matmul_array(key):
    A = random_matrix(key, 5, 5, jnp.float64)
    op = aslinearoperator(A)
    x = jnp.ones(5)
    np.testing.assert_allclose(op @ x, A @ x)  # __matmul__ on an array


class TestBenchtime:
    """The shared benchmark timing protocol (utils/benchtime.py) —
    slope math, sync, and plausibility clamping."""

    def test_chain_slope_recovers_known_cost(self):
        import jax.numpy as jnp

        from eigenex_tpu.utils.benchtime import chain_slope

        n = 64
        A = jnp.eye(n) * 0.5

        def mv(p, x):
            return p @ x

        x = jnp.ones((n,), jnp.float64)
        per, stats = chain_slope(mv, A, x, k_lo=2, k_hi=10, reps=3)
        # on CPU the tiny matmul takes SOME positive time; the protocol
        # must return either a positive slope or an explicit
        # "unresolvable" flag — never a negative rate
        assert (per is None and stats.get("unresolvable")) or per > 0
        assert stats["reps"] == 3 and stats["k_hi"] == 10

    def test_clamp_rejects_superluminal(self):
        from eigenex_tpu.utils.benchtime import clamp_to_roofline, plausibility_floor

        gb = 8 * 10**9
        floor = plausibility_floor(gb)
        t, clamped = clamp_to_roofline(floor / 2, gb)
        assert clamped and t == floor
        t2, clamped2 = clamp_to_roofline(floor * 3, gb)
        assert not clamped2 and t2 == floor * 3

    def test_force_sync_accepts_shapes(self):
        import jax.numpy as jnp

        from eigenex_tpu.utils.benchtime import force_sync

        force_sync(jnp.ones((8, 8)))
        force_sync((jnp.ones(4), jnp.ones(4)))
