"""Matrix-free conjugate-gradient solver and shift-invert operators.

The reference has no linear solver, but BASELINE.json config 5 demands
**shift-invert Lanczos** ("10^8-row BSR Hamiltonian ... shift-invert
Lanczos"), whose operator is (A − σI)⁻¹ applied per matvec.  For a
Hermitian A the natural TPU-native inner solver is CG: matrix-free,
static shapes, one ``lax.while_loop``, axis-name aware so the same code
runs row-sharded under ``shard_map`` (inner products complete with
``psum``, exactly like the Lanczos Gram-Schmidt).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..core.operators import LinearOperator, aslinearoperator
from ..utils.exceptions import EigenexError
from ..utils.tolerance import default_tolerance

__all__ = ["cg_solve", "cgls_solve", "shift_invert_operator"]


def _cg_body_factory(axis_name):
    def psum_if(x):
        return lax.psum(x, axis_name) if axis_name is not None else x

    def vdot(a, b):
        return psum_if(jnp.vdot(a, b))

    return psum_if, vdot


@partial(jax.jit, static_argnames=("max_iters", "axis_name"))
def _cg_loop(op: LinearOperator, b, x0, tol, *, max_iters: int, axis_name: str | None):
    psum_if, vdot = _cg_body_factory(axis_name)
    bnorm2 = jnp.real(vdot(b, b))
    target2 = (tol**2) * bnorm2

    def cond(carry):
        i, x, r, p, rs = carry
        # the isfinite guard stops the loop as soon as the recurrence goes
        # non-finite (overflow/NaN operator) instead of iterating garbage
        return (i < max_iters) & (jnp.real(rs) > target2) & jnp.isfinite(jnp.real(rs))

    def body(carry):
        i, x, r, p, rs = carry
        ap = op.matvec(p)
        alpha = rs / vdot(p, ap)
        x = x + alpha * p
        r = r - alpha * ap
        rs_new = vdot(r, r)
        p = r + (rs_new / rs) * p
        return i + 1, x, r, p, rs_new

    r0 = b - op.matvec(x0)
    rs0 = vdot(r0, r0)
    i, x, r, p, rs = lax.while_loop(cond, body, (jnp.zeros((), jnp.int32), x0, r0, r0, rs0))
    return x, jnp.sqrt(jnp.abs(rs)), i


def cg_solve(
    op,
    b: jax.Array,
    x0: jax.Array | None = None,
    *,
    tol: float | None = None,
    max_iters: int = 1000,
    axis_name: str | None = None,
):
    """Solve A x = b for Hermitian positive/negative-definite A.

    Returns (x, residual_norm, iterations).  Under ``shard_map``, pass
    the mesh ``axis_name`` and a local-shard operator."""
    op = aslinearoperator(op) if not isinstance(op, LinearOperator) else op
    if tol is None:
        tol = max(default_tolerance(op.dtype), 1e-14)
    if x0 is None:
        x0 = jnp.zeros_like(b)
    return _cg_loop(op, b, x0, jnp.asarray(tol), max_iters=int(max_iters), axis_name=axis_name)


def _shifted_matvec(p, v):
    return p[0].matvec(v) - p[1] * v


def _shifted_rmatvec(p, v):
    return p[0].rmatvec(v) - jnp.conj(p[1]) * v


def shift_invert_operator(
    op, sigma, *, tol: float = 1e-10, max_iters: int = 2000
) -> LinearOperator:
    """(A − σI)⁻¹ as a matrix-free operator for shift-invert Lanczos:
    eigenvalues near σ become dominant, so interior/targeted eigenpairs
    converge in few outer iterations (BASELINE.json config 5).

    The returned operator's eigenvalues are 1/(λ−σ); recover λ as
    σ + 1/θ.  Note CG requires (A − σI) definite — pick σ outside the
    spectrum (e.g. below the Gershgorin lower bound for the ground
    state)."""
    op = aslinearoperator(op)
    if op.shape[0] != op.shape[1]:
        raise EigenexError("shift-invert requires a square operator")
    sigma = jnp.asarray(sigma, op.dtype)
    max_iters = int(max_iters)  # static, closed over (not a traced leaf)

    def si_matvec(p, x):
        inner_op, sig, tl = p
        shifted = LinearOperator(
            _shifted_matvec, (inner_op, sig), inner_op.shape, inner_op.dtype,
            rmatvec_fn=_shifted_rmatvec,
        )
        y, _, _ = _cg_loop(shifted, x, jnp.zeros_like(x), tl, max_iters=max_iters, axis_name=None)
        # CG is only guaranteed for definite (A − σI); an interior σ makes
        # it indefinite and CG can stagnate or diverge SILENTLY, poisoning
        # every outer Ritz value.  Detect by true residual and fall back to
        # CGLS (CG on the normal equations — SPD for any nonsingular
        # shift, monotone ‖r‖), continuing from the CG iterate.
        rel = jnp.linalg.norm(x - shifted.matvec(y)) / jnp.linalg.norm(x)
        # warm-start CGLS from the CG iterate when it is finite (0*NaN
        # would still be NaN, hence the elementwise where)
        y_safe = jnp.where(jnp.all(jnp.isfinite(y)), y, jnp.zeros_like(y))
        return jax.lax.cond(
            jnp.isfinite(rel) & (rel <= tl),
            lambda: y,
            lambda: _cgls_loop(
                shifted, x, y_safe, tl, max_iters=max_iters, axis_name=None
            )[0],
        )

    return LinearOperator(
        si_matvec, (op, sigma, jnp.asarray(tol)), op.shape, op.dtype
    )


@partial(jax.jit, static_argnames=("max_iters", "axis_name"))
def _cgls_loop(op: LinearOperator, b, x0, tol, *, max_iters: int, axis_name: str | None):
    """CGLS (CG on the normal equations AᴴA x = Aᴴ b, Björck's stable
    recurrence): guaranteed-convergent least-squares/indefinite fallback
    where plain CG (indefinite A) or restarted GMRES (stagnation) fail.
    The adjoint comes from ``op.rmatvec`` — vjp-derived when the operator
    has no explicit one.  Returns (x, ‖r‖, iterations)."""
    psum_if, vdot = _cg_body_factory(axis_name)
    bnorm2 = jnp.real(vdot(b, b))
    target2 = (tol**2) * bnorm2

    r0 = b - op.matvec(x0)
    s0 = op.rmatvec(r0)
    gamma0 = jnp.real(vdot(s0, s0))
    # two-sided stop: true residual (consistent systems) OR normal-equation
    # residual ‖Aᴴr‖ (least-squares optimum of inconsistent systems, where
    # ‖r‖ never gets small — iterating past it makes β = γ'/γ pure noise
    # and DIVERGES the iterate)
    gamma_tgt = (tol**2) * gamma0

    def cond(carry):
        i, x, r, p, gamma, rn2 = carry
        return (
            (i < max_iters)
            & (rn2 > target2)
            & (gamma > gamma_tgt)
            & jnp.isfinite(rn2)
        )

    def body(carry):
        i, x, r, p, gamma, _ = carry
        q = op.matvec(p)
        qq = jnp.real(vdot(q, q))
        alpha = (gamma / jnp.where(qq > 0, qq, 1)).astype(x.dtype)
        x = x + alpha * p
        r = r - alpha * q
        s = op.rmatvec(r)
        gamma_new = jnp.real(vdot(s, s))
        beta = (gamma_new / jnp.where(gamma > 0, gamma, 1)).astype(x.dtype)
        p = s + beta * p
        return i + 1, x, r, p, gamma_new, jnp.real(vdot(r, r))

    i, x, r, p, gamma, rn2 = lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), x0, r0, s0, gamma0, jnp.real(vdot(r0, r0)))
    )
    return x, jnp.sqrt(jnp.abs(rn2)), i


def cgls_solve(
    op,
    b: jax.Array,
    x0: jax.Array | None = None,
    *,
    tol: float | None = None,
    max_iters: int = 2000,
    axis_name: str | None = None,
):
    """Least-squares solve min ‖A x − b‖ via CGLS (works for any A,
    including indefinite Hermitian and rectangular operators).

    Returns (x, residual_norm, iterations)."""
    op = aslinearoperator(op) if not isinstance(op, LinearOperator) else op
    if tol is None:
        tol = max(default_tolerance(op.dtype), 1e-14)
    if x0 is None:
        x0 = jnp.zeros((op.shape[1],), op.dtype)
    return _cgls_loop(op, b, x0, jnp.asarray(tol), max_iters=int(max_iters), axis_name=axis_name)
