"""Host-side float64 eigenpair refinement.

TPU hardware iterates in f32/bf16; the baseline demands eigenvalues
matching the reference to 1e-10.  The bridge is hybrid precision:
iterate on the TPU, then refine each extracted Ritz pair on the host in
float64 —

1. **Rayleigh-quotient refinement**: λ̃ = ⟨x, A x⟩ / ⟨x, x⟩ evaluated in
   f64 from the operator's triplets.  Error is O(ε²) in the vector error
   ε (Hermitian A) — cheap, but note the vectors delivered by an
   f32-*operator* iteration carry ε ~ f32 level against the true f64
   operator, so Rayleigh alone typically lands ~1e-5–1e-8.
2. **Inverse-iteration polish** (SciPy sparse LU on the f64 triplets):
   two iterations from an f32-grade pair reach f64 machine precision
   (measured 1e-14 on the TPU hybrid sample) — this is the path that
   guarantees the 1e-10 baseline target.

Tip: on TPU machines build the f64 operator with
``COOBuilder.build(to_device=False)`` — a device array would silently
truncate the triplets to f32.
"""

from __future__ import annotations

import numpy as np

from ..sparse.coo import COOMatrix
from ..utils.exceptions import EigenexError

__all__ = [
    "rayleigh_refine",
    "inverse_iteration_refine",
    "general_rayleigh_refine",
    "general_inverse_iteration_refine",
    "shift_invert_arnoldi_refine",
]


def _coo_scipy64(coo: COOMatrix):
    import scipy.sparse as sp

    return sp.csr_matrix(
        (
            np.asarray(coo.val, np.complex128 if np.iscomplexobj(np.asarray(coo.val)) else np.float64),
            (np.asarray(coo.row), np.asarray(coo.col)),
        ),
        shape=coo.shape,
    )


def rayleigh_refine(coo: COOMatrix, X, evals=None):
    """f64 Rayleigh quotients of approximate eigenvectors.

    X: (n, p) approximate eigenvectors (any precision / device array).
    Returns (refined_evals (p,) f64, residual_norms (p,) f64)."""
    A = _coo_scipy64(coo)
    X = np.asarray(X, A.dtype)
    X = X / np.linalg.norm(X, axis=0, keepdims=True)
    AX = A @ X
    lam = np.real_if_close(np.einsum("ip,ip->p", X.conj(), AX))
    R = AX - X * lam[None, :]
    return np.real(lam).astype(np.float64), np.linalg.norm(R, axis=0).astype(np.float64)


def inverse_iteration_refine(coo: COOMatrix, X, evals=None, iters: int = 2):
    """Polish eigenvectors by f64 shifted inverse iteration.

    Each vector x with Rayleigh shift λ is replaced by
    (A − λI)⁻¹ x (sparse LU), renormalized; λ is re-evaluated.  Two
    iterations take an f32-grade pair to f64 machine precision unless
    the eigenvalue is pathologically clustered."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    A = _coo_scipy64(coo)
    n = A.shape[0]
    X = np.asarray(X, A.dtype)
    X = X / np.linalg.norm(X, axis=0, keepdims=True)
    lam, _ = rayleigh_refine(coo, X)
    out = np.empty_like(X)
    for p in range(X.shape[1]):
        x = X[:, p]
        mu = lam[p]
        for _ in range(iters):
            # tiny regularization keeps the factorization nonsingular when
            # mu is numerically exact
            M = (A - (mu + 1e-14 * max(1.0, abs(mu))) * sp.identity(n, dtype=A.dtype)).tocsc()
            try:
                x = spla.splu(M).solve(x)
            except RuntimeError as e:  # singular factorization
                raise EigenexError(f"inverse iteration failed at pair {p}: {e}")
            x = x / np.linalg.norm(x)
            mu = float(np.real(np.vdot(x, A @ x)))
        out[:, p] = x
        lam[p] = mu
    _, res = rayleigh_refine(coo, out)
    return lam, out, res


def general_rayleigh_refine(coo: COOMatrix, X, evals=None):
    """c128 Rayleigh quotients λ = ⟨x, A x⟩ for general (non-Hermitian)
    approximate eigenvectors.

    Returns (refined_evals (p,) complex128, residual_norms (p,) f64)."""
    A = _coo_scipy64(coo).astype(np.complex128)
    X = np.asarray(X, np.complex128)
    X = X / np.linalg.norm(X, axis=0, keepdims=True)
    AX = A @ X
    lam = np.einsum("ip,ip->p", X.conj(), AX)
    R = AX - X * lam[None, :]
    return lam, np.linalg.norm(R, axis=0).astype(np.float64)


def general_inverse_iteration_refine(
    coo: COOMatrix, X, evals=None, iters: int = 60, tol: float | None = None
):
    """f64/c128 residual-controlled BLOCK inverse-iteration polish for
    NON-Hermitian eigenpairs — the hybrid-precision bridge for
    Arnoldi/Krylov–Schur output (the reference's Arnoldi extraction is
    exact-arithmetic f64 end-to-end, arnoldi.hpp:805-865; this recovers
    that accuracy from an f32-device iteration).

    Independent per-vector Rayleigh-quotient iteration is the textbook
    polish but fails two ways on non-normal operators: (a) convergence
    through the pseudospectral cloud is slow at first, so a FIXED
    iteration count can stop mid-transient with a residual *worse* than
    the input (measured on the convection–diffusion baseline: 3 steps
    land at 6.5e-5, 10 at 4e-15); (b) nearby shifts make several vectors
    collapse onto the same exact eigenpair.  This routine instead
    iterates the whole block — per-column shifted solves
    (A − μᵢI)xᵢ' = xᵢ (sparse complex LU), then a thin-QR
    re-orthonormalization of the block and a Rayleigh–Ritz extraction on
    the projected p×p matrix QᴴAQ — which keeps the p directions
    independent (inverse subspace iteration), and it stops on a MEASURED
    residual, not a step count.

    X: (n, p) approximate eigenvectors (complex allowed over a real
    operator — conjugate-pair eigenvalues welcome); evals: (p,) complex
    shift estimates (None → Rayleigh quotients of X); iters: safety cap
    (the convection–diffusion baseline needs ~25: linear contraction
    while the shifts cross the pseudospectral cloud, quadratic once
    inside); tol: per-pair residual target relative to max|λ| (default
    1e-11, an order under the 1e-10 baseline certificate).  The iterate
    with the smallest max-residual is the one returned — near the f64
    floor the trajectory flutters, so "last" is not "best".

    Returns (evals (p,) complex128, X (n, p) complex128, residuals f64)."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    A = _coo_scipy64(coo).astype(np.complex128)
    n = A.shape[0]
    X = np.asarray(X, np.complex128)
    X = np.linalg.qr(X, mode="reduced")[0]
    p = X.shape[1]
    if evals is None:
        lam, _ = general_rayleigh_refine(coo, X)
    else:
        lam = np.asarray(evals, np.complex128).copy()
    scale = max(float(np.max(np.abs(lam))), 1.0)
    if tol is None:
        tol = 1e-11
    best = (np.inf, lam, X)
    for _ in range(iters):
        AX = A @ X
        res = np.linalg.norm(AX - X * lam[None, :], axis=0)
        worst = float(np.max(res))
        if worst < best[0]:
            best = (worst, lam, X)
        if worst <= tol * scale:
            break
        Xn = np.empty_like(X)
        for j in range(p):
            mu = complex(lam[j])
            reg = 1e-14 * max(1.0, abs(mu))
            M = (A - (mu + reg) * sp.identity(n, dtype=A.dtype)).tocsc()
            try:
                Xn[:, j] = spla.splu(M).solve(X[:, j])
            except RuntimeError as e:  # singular factorization
                raise EigenexError(f"inverse iteration failed at pair {j}: {e}")
        Q = np.linalg.qr(Xn, mode="reduced")[0]
        # Rayleigh–Ritz on the refined subspace: distinct Ritz pairs even
        # when the shifts crowd one eigenvalue
        H = Q.conj().T @ (A @ Q)
        theta, S = np.linalg.eig(H)
        # match Ritz values to the incoming shifts (stable greedy pairing)
        order = np.full(p, -1)
        taken = np.zeros(p, bool)
        for j in np.argsort(-np.abs(lam)):
            cand = np.where(~taken)[0]
            pick = cand[np.argmin(np.abs(theta[cand] - lam[j]))]
            order[j] = pick
            taken[pick] = True
        lam = theta[order]
        X = Q @ S[:, order]
        X = X / np.linalg.norm(X, axis=0, keepdims=True)
        scale = max(float(np.max(np.abs(lam))), 1.0)
    else:
        AX = A @ X
        res = np.linalg.norm(AX - X * lam[None, :], axis=0)
        worst = float(np.max(res))
        if worst < best[0]:
            best = (worst, lam, X)
    _, lam, X = best
    lam = lam.copy()
    X = X.copy()
    p = X.shape[1]
    # phase fix: largest coefficient made real-positive (deterministic)
    lead = X[np.argmax(np.abs(X), axis=0), np.arange(p)]
    X = X * (np.conj(lead) / np.abs(lead))[None, :]
    _, res = general_rayleigh_refine(coo, X)
    return lam, X, res


def shift_invert_arnoldi_refine(
    coo: COOMatrix,
    sigma,
    k: int = 4,
    m: int = 80,
    v0=None,
    tol: float = 1e-12,
    rounds: int = 3,
    seed: int = 0,
):
    """Host-f64 SHIFT-INVERT ARNOLDI polish — the heavy-duty hybrid
    bridge for large non-normal operators.

    Per-pair inverse iteration (``general_inverse_iteration_refine``)
    factorizes p fresh LUs every step and contracts like a power method
    — on the n=1e5 convection–diffusion baseline it needs >60 rounds
    (~8 s each) and stalls near 1e-8.  This routine instead factorizes
    (A − σI) ONCE and builds an m-step f64 Krylov subspace of
    (A − σI)⁻¹ (m cheap triangular solves, CGS2 orthogonalization) —
    Krylov-optimal convergence to the eigenvalues nearest σ, the same
    mode ARPACK uses for such spectra.  If the k best Ritz pairs are not
    at ``tol`` backward error, σ and the start vector are re-centred on
    the best Ritz pair and the subspace rebuilt (``rounds`` times).

    coo: host-f64 triplets; sigma: complex shift near the wanted
    eigenvalues (e.g. the device iteration's dominant Ritz value);
    v0: optional start vector (e.g. the device eigenvector — seeds the
    subspace with the converged direction).

    Returns (evals (k,) complex128, X (n, k) complex128, residuals f64)
    with pairs sorted by descending |λ|."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    A = _coo_scipy64(coo).astype(np.complex128)
    n = A.shape[0]
    sigma = complex(sigma)
    if v0 is None:
        v = np.random.default_rng(seed).standard_normal(n).astype(np.complex128)
    else:
        v = np.asarray(v0, np.complex128).reshape(n).copy()
    best = None
    for _ in range(rounds):
        M = (A - sigma * sp.identity(n, dtype=A.dtype)).tocsc()
        try:
            lu = spla.splu(M)
        except RuntimeError as e:
            raise EigenexError(f"shift-invert factorization failed at σ={sigma}: {e}")
        V = np.zeros((n, m + 1), np.complex128)
        H = np.zeros((m + 1, m), np.complex128)
        v = v / np.linalg.norm(v)
        V[:, 0] = v
        mm = m
        for j in range(m):
            w = lu.solve(V[:, j])
            # CGS2 (twice-is-enough classical Gram–Schmidt)
            h = V[:, : j + 1].conj().T @ w
            w = w - V[:, : j + 1] @ h
            h2 = V[:, : j + 1].conj().T @ w
            w = w - V[:, : j + 1] @ h2
            H[: j + 1, j] = h + h2
            beta = np.linalg.norm(w)
            H[j + 1, j] = beta
            if beta <= n * np.finfo(np.float64).eps:
                mm = j + 1
                break
            V[:, j + 1] = w / beta
        theta, Y = np.linalg.eig(H[:mm, :mm])
        nz = np.abs(theta) > 0
        lam = np.where(nz, sigma + 1.0 / np.where(nz, theta, 1.0), np.inf)
        X = V[:, :mm] @ Y
        X = X / np.linalg.norm(X, axis=0, keepdims=True)
        resid = np.linalg.norm(A @ X - X * lam[None, :], axis=0)
        # keep the k largest-|λ| pairs among the best-converged half
        good = np.argsort(resid)[: max(k, mm // 2)]
        pick = good[np.argsort(-np.abs(lam[good]))[:k]]
        pick = pick[np.argsort(-np.abs(lam[pick]))]
        cand = (float(resid[pick].max()), lam[pick], X[:, pick], resid[pick])
        if best is None or cand[0] < best[0]:
            best = cand
        scale = max(float(np.abs(lam[pick]).max()), 1.0)
        if best[0] <= tol * scale:
            break
        # re-centre on the best Ritz pair for the next round
        top = pick[0]
        sigma = complex(lam[top]) * (1 + 1e-7) + 1e-7j
        v = X[:, top]
    _, lam, X, resid = best
    p = X.shape[1]
    lead = X[np.argmax(np.abs(X), axis=0), np.arange(p)]
    X = X * (np.conj(lead) / np.abs(lead))[None, :]
    return lam, X, resid
