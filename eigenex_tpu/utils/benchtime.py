"""Benchmark timing protocol — one tested implementation for every
harness (bench.py and benchmarks/*), per the round-3 verdict: cross-run
comparisons need a repeat-median protocol with spread and physical-
plausibility clamping, not per-script ad-hoc timing.

The axon-tunnel measurement hazards this module encodes:

1. **Dispatch latency** (~25-30 ms/call): single-call timing measures
   the tunnel, not the kernel.  All rates come from the SLOPE between
   two fused in-device chains (k_lo vs k_hi matvecs inside one
   ``lax.fori_loop``), which cancels the constant.
2. **``block_until_ready`` can no-op** through the tunnel (measured
   round 4: a 288-matvec chain "completed" in 0.1 ms).  Synchronization
   is a small forced device→host copy instead.
3. **Tunnel jitter** can exceed the signal for short chains: medians of
   ``reps`` runs per point, and the spread is REPORTED so BASELINE rows
   carry run-count/variance, not bare numbers.
4. **Physical plausibility**: a rate implying more than the chip's HBM
   bandwidth for the bytes the path must stream is a timing artifact
   (readback raced the work) — clamped and flagged, never recorded.
"""

from __future__ import annotations

import time
from functools import partial

import numpy as np

__all__ = [
    "force_sync",
    "timed_median",
    "chain_slope",
    "plausibility_floor",
    "clamp_to_roofline",
    "V5E_PEAK_GBS",
]

#: v5e HBM peak (GB/s) — the plausibility ceiling for HBM-bound paths
V5E_PEAK_GBS = 819.0


def force_sync(y) -> None:
    """Wait for ``y`` by pulling a 16-element slice to host —
    ``block_until_ready`` alone is not reliable through the axon tunnel."""
    arr = y[0] if isinstance(y, (tuple, list)) else y
    np.asarray(arr.reshape(-1)[:16])


def timed_median(fn, reps: int = 5):
    """(median_seconds, all_samples) of ``fn()`` (which must block)."""
    ts = []
    for _ in range(int(reps)):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), ts


def chain_slope(
    matvec_fn,
    params,
    x,
    *,
    k_lo: int = 32,
    k_hi: int = 160,
    reps: int = 5,
    normalize: bool = True,
):
    """Per-application seconds of ``matvec_fn(params, x)`` via the
    two-point fused-chain slope, with medians of ``reps`` runs per point.

    Returns ``(per_seconds, stats)``; ``per_seconds`` is None when the
    slope is not resolvable above the jitter (stats say so).  ``stats``
    carries the medians, spreads, and protocol parameters for BASELINE
    bookkeeping."""
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnums=(2,))
    def chain(p, v, k):
        def body(_, a):
            y = matvec_fn(p, a)
            if normalize:
                y = y / jnp.linalg.norm(y)
            return y.astype(v.dtype)

        return jax.lax.fori_loop(0, k, body, v)

    def run(k):
        force_sync(chain(params, x, k))

    run(k_lo)  # compile + warm both points
    run(k_hi)
    med_lo, ts_lo = timed_median(lambda: run(k_lo), reps)
    med_hi, ts_hi = timed_median(lambda: run(k_hi), reps)
    per = (med_hi - med_lo) / (k_hi - k_lo)
    stats = dict(
        k_lo=k_lo,
        k_hi=k_hi,
        reps=reps,
        median_lo_s=med_lo,
        median_hi_s=med_hi,
        spread_lo_s=float(np.max(ts_lo) - np.min(ts_lo)),
        spread_hi_s=float(np.max(ts_hi) - np.min(ts_hi)),
    )
    if per <= 0:
        stats["unresolvable"] = True
        return None, stats
    return per, stats


def plausibility_floor(bytes_accessed: int, peak_gbs: float = V5E_PEAK_GBS) -> float:
    """Minimum seconds an HBM-bound path streaming ``bytes_accessed``
    can physically take on this chip."""
    return bytes_accessed / (peak_gbs * 1e9)


def clamp_to_roofline(
    per_seconds: float, bytes_accessed: int, peak_gbs: float = V5E_PEAK_GBS
):
    """(clamped_seconds, was_clamped): reject timings faster than the
    HBM roofline allows — they are tunnel-readback artifacts, not
    measurements (a contended round-3 run printed '148% of roofline')."""
    floor = plausibility_floor(bytes_accessed, peak_gbs)
    if per_seconds < floor:
        return floor, True
    return per_seconds, False
