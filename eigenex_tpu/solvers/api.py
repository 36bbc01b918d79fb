"""One-call eigensolver front ends (scipy.sparse.linalg-style).

Convenience layer that picks the right driver from the problem
statement — the "a user of the reference should find everything they
need" surface for people arriving from scipy/ARPACK:

- :func:`eigsh` — Hermitian: ``which`` in {"SA", "LA"} (smallest/largest
  algebraic), optional ``sigma`` (shift-invert targeting via CG).
  Chooses plain Lanczos when the subspace covers the problem,
  thick-restart otherwise.
- :func:`eigs` — general: dominant (largest-|λ|) eigenpairs via
  Krylov–Schur; optional ``sigma`` (GMRES shift-invert for interior
  targets).
"""

from __future__ import annotations

import numpy as np

from ..core.operators import aslinearoperator
from ..utils.exceptions import EigenexError
from .gmres import shift_invert_operator_general
from .krylov_schur import KrylovSchurArnoldiSolver, KrylovSchurOptions
from .lanczos import LanczosEigenSolver, LanczosOptions, LanczosResult
from .restart import ThickRestartLanczosEigenSolver, ThickRestartOptions

__all__ = ["eigsh", "eigs"]


def eigsh(
    A,
    k: int = 6,
    *,
    which: str = "SA",
    sigma=None,
    tol: float | None = None,
    max_subspace: int | None = None,
    max_restarts: int = 200,
    seed: int = 0,
) -> LanczosResult:
    """k extremal (or σ-targeted) eigenpairs of a Hermitian operator.

    which: "SA" (smallest algebraic) or "LA" (largest algebraic);
    ignored when ``sigma`` is given (returns the pairs nearest σ).
    """
    op = aslinearoperator(A)
    n = op.shape[0]
    if op.shape[0] != op.shape[1]:
        raise EigenexError("eigsh requires a square operator")
    if which not in ("SA", "LA"):
        raise EigenexError(f"which must be 'SA' or 'LA', got {which!r}")

    if sigma is not None:
        # Shift-invert: pairs nearest σ have the LARGEST |θ| of
        # (A − σI)⁻¹ — θ can be large positive (λ just above σ) or large
        # negative (λ just below σ), so track BOTH spectral ends and pick
        # by |θ|.  The inner solve is GMRES, which tolerates the
        # indefinite (A − σI) that any interior σ produces (CG does not).
        si = shift_invert_operator_general(op, sigma, restart=64, cycles=6)
        m = min(max_subspace or max(4 * k + 16, 32), n)
        kk = min(k, m // 2 - 1) if m // 2 - 1 > 0 else k
        both_ends = tuple(range(kk)) + tuple(range(-kk, 0))
        res = LanczosEigenSolver(
            si,
            LanczosOptions(
                max_eigenvalues=2 * kk,
                eigenvalue_indices=both_ends,
                tolerance=tol,
                max_subspace=m,
                seed=seed,
            ),
        ).compute()
        theta = np.asarray(res.eigenvalues)
        nonzero = np.abs(theta) > 0
        lam_all = np.where(nonzero, float(np.real(sigma)) + 1.0 / np.where(nonzero, theta, 1.0), np.inf)
        pick = np.argsort(np.abs(lam_all - float(np.real(sigma))))[:k]
        order = pick[np.argsort(lam_all[pick])]
        vecs = res.eigenvectors[:, order] if res.eigenvectors is not None else None
        return LanczosResult(
            eigenvalues=lam_all[order],
            eigenvectors=vecs,
            iterations=res.iterations,
            converged=res.converged,
            termination=res.termination,
            trace=res.trace,
        )

    indices = tuple(range(k)) if which == "SA" else tuple(range(-k, 0))
    m = min(max_subspace or max(6 * k + 32, 64), n)
    if m >= n:
        # full subspace available: plain Lanczos terminates exactly
        return LanczosEigenSolver(
            op,
            LanczosOptions(
                max_eigenvalues=k, eigenvalue_indices=indices, tolerance=tol,
                max_subspace=n, seed=seed,
            ),
        ).compute()
    return ThickRestartLanczosEigenSolver(
        op,
        ThickRestartOptions(
            max_eigenvalues=k, eigenvalue_indices=indices, tolerance=tol,
            max_subspace=m, max_restarts=max_restarts, seed=seed,
        ),
    ).compute()


def eigs(
    A,
    k: int = 6,
    *,
    sigma=None,
    tol: float | None = None,
    max_subspace: int | None = None,
    max_restarts: int = 100,
    seed: int = 0,
):
    """k dominant (or σ-nearest) eigenpairs of a general operator."""
    op = aslinearoperator(A)
    n = op.shape[0]
    if op.shape[0] != op.shape[1]:
        raise EigenexError("eigs requires a square operator")
    m = min(max_subspace or max(4 * k + 24, 48), n)
    if sigma is not None:
        si = shift_invert_operator_general(op, sigma)
        res = KrylovSchurArnoldiSolver(
            si,
            KrylovSchurOptions(
                max_eigenvalues=k, tolerance=tol, max_subspace=m,
                max_restarts=max_restarts, seed=seed,
            ),
        ).compute()
        lam = complex(sigma) + 1.0 / res.eigenvalues
        order = np.argsort(np.abs(lam - complex(sigma)))
        res.eigenvalues = lam[order]
        if res.eigenvectors is not None:
            res.eigenvectors = res.eigenvectors[:, order]
        return res
    return KrylovSchurArnoldiSolver(
        op,
        KrylovSchurOptions(
            max_eigenvalues=k, tolerance=tol, max_subspace=m,
            max_restarts=max_restarts, seed=seed,
        ),
    ).compute()
