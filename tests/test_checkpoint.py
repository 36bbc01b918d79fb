"""Checkpoint/resume tests: interrupted solve restored from disk must
finish identically to an uninterrupted one."""

import jax.numpy as jnp
import numpy as np

from eigenex_tpu.solvers.arnoldi import ArnoldiState, init_arnoldi_state
from eigenex_tpu.solvers.lanczos import (
    LanczosEigenSolver,
    LanczosOptions,
    LanczosState,
    init_lanczos_state,
    lanczos_steps,
)
from eigenex_tpu.core.operators import aslinearoperator
from eigenex_tpu.utils.checkpoint import load_state, save_state
from eigenex_tpu.utils.prng import random_hermitian


def test_lanczos_state_roundtrip(tmp_path, key):
    A = random_hermitian(key, 20, jnp.float64)
    op = aslinearoperator(A)
    s = lanczos_steps(op, init_lanczos_state(op, 10, seed=0), 5)
    p = str(tmp_path / "state.npz")
    save_state(p, s)
    s2 = load_state(p)
    assert isinstance(s2, LanczosState)
    np.testing.assert_array_equal(np.asarray(s.V), np.asarray(s2.V))
    np.testing.assert_array_equal(np.asarray(s.alpha), np.asarray(s2.alpha))
    assert int(s2.k) == 5 and not bool(s2.breakdown)


def test_arnoldi_state_roundtrip(tmp_path, key):
    from eigenex_tpu.utils.prng import random_matrix
    from eigenex_tpu.solvers.arnoldi import arnoldi_steps

    A = random_matrix(key, 16, 16, jnp.float64)
    op = aslinearoperator(A)
    s = arnoldi_steps(op, init_arnoldi_state(op, 8, seed=0), 4)
    p = str(tmp_path / "astate.npz")
    save_state(p, s)
    s2 = load_state(p)
    assert isinstance(s2, ArnoldiState)
    np.testing.assert_array_equal(np.asarray(s.H), np.asarray(s2.H))


def test_resume_from_checkpoint_matches_uninterrupted(tmp_path, key):
    """Kill-and-restore mid-solve ⇒ same eigenvalues as straight-through
    (the preemption-recovery story, SURVEY.md §5 failure detection)."""
    n = 60
    A = random_hermitian(key, n, jnp.float64)
    opts = LanczosOptions(max_eigenvalues=2, tolerance=1e-14, max_subspace=n, seed=3)

    straight = LanczosEigenSolver(A, opts).compute()

    # run half, checkpoint, "crash", restore into a fresh solver, resume
    op = aslinearoperator(A)
    half = lanczos_steps(op, init_lanczos_state(op, n, seed=3), 10)
    p = str(tmp_path / "mid.npz")
    save_state(p, half)

    solver = LanczosEigenSolver(A, opts)
    solver.state = load_state(p)
    resumed = solver.continue_to_compute()
    np.testing.assert_allclose(resumed.eigenvalues, straight.eigenvalues, atol=1e-10)
