"""Benchmark: block-sparse SpMV throughput (nnz/s) on one TPU chip.

Prints ONE JSON line:
  {"metric": "spmv_nnz_per_s", "value": N, "unit": "nnz/s", "vs_baseline": N}

- Matrix: symmetric block-tridiagonal BSR with dense 128x128 blocks
  (the block-sparse Hamiltonian shape of BASELINE.json), f32.
- TPU paths timed: Pallas BSR-ELL kernel and the XLA gather+einsum
  path; the best sustained rate is reported.
- vs_baseline: ratio against the reference algorithm's cost model — a
  serial COO scatter SpMV (triplets_matrix.hpp:314-318), measured here
  with the same semantics (np.add.at scatter loop) on this host's CPU
  and scaled to the benchmark nnz.
"""

import json
import os
import sys
import time

import numpy as np

import jax

# persistent compilation cache: compiles of the big SpMV programs take
# minutes through the axon remote-compile tunnel; caching them on disk
# makes repeat bench runs start in seconds
try:
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import jax.numpy as jnp


def banded_block_bsr(nbr: int, bm: int, dtype=np.float32, seed: int = 0):
    from eigenex_tpu.sparse.bsr import BSRMatrix

    rng = np.random.default_rng(seed)
    kmax = 3
    data = np.zeros((nbr, kmax, bm, bm), dtype)
    cols = np.zeros((nbr, kmax), np.int32)
    diag = rng.standard_normal((nbr, bm, bm)).astype(dtype)
    off = rng.standard_normal((nbr - 1, bm, bm)).astype(dtype)
    for r in range(nbr):
        data[r, 0] = (diag[r] + diag[r].T) / 2
        cols[r, 0] = r
        slot = 1
        if r > 0:
            data[r, slot] = off[r - 1].T
            cols[r, slot] = r - 1
            slot += 1
        if r + 1 < nbr:
            data[r, slot] = off[r]
            cols[r, slot] = r + 1
    n = nbr * bm
    return BSRMatrix(jnp.asarray(data), jnp.asarray(cols), (n, n))


# Two chain lengths: per-matvec time is the SLOPE between them, which
# cancels the constant host→TPU tunnel dispatch/readback latency (~30 ms
# on this machine — block_until_ready does not reliably wait over the
# tunnel, so each sample forces a scalar readback instead).
CHAIN_SHORT, CHAIN_LONG = 8, 72


def make_chained(matvec):
    """K chained, normalized matvecs in ONE device dispatch (the Lanczos
    access pattern), returning a scalar so readback forces completion."""

    @jax.jit
    def chained(b, x, k):
        def body(_, v):
            y = matvec(b, v)
            return y / jnp.linalg.norm(y)

        out = jax.lax.fori_loop(0, k, body, x)
        return jnp.vdot(out, out)

    return chained


def time_fn(fn, *args, warmup=1, reps=4):
    """Per-matvec seconds via the two-point chain slope."""
    for k in (CHAIN_SHORT, CHAIN_LONG):
        for _ in range(warmup):
            float(fn(*args, k))
    best = {CHAIN_SHORT: np.inf, CHAIN_LONG: np.inf}
    for _ in range(reps):
        for k in (CHAIN_SHORT, CHAIN_LONG):
            t0 = time.perf_counter()
            float(fn(*args, k))
            best[k] = min(best[k], time.perf_counter() - t0)
    return (best[CHAIN_LONG] - best[CHAIN_SHORT]) / (CHAIN_LONG - CHAIN_SHORT)


def time_dispatch_pipeline(matvec, b, x, reps=4):
    """Per-matvec seconds via dataflow-chained ASYNC dispatches.

    Compiles only the small single-matvec program (the fused fori_loop
    chain can take many minutes through the remote-compile tunnel);
    consecutive dispatches pipeline on the device, and the two-point
    slope cancels the constant per-call overhead.  ~5-10% conservative
    vs the in-loop chain."""
    mv = jax.jit(matvec)

    def run(K):
        v = x
        for _ in range(K):
            v = mv(b, v.astype(jnp.float32))
        return float(jnp.vdot(v, v))

    run(3)  # compile + warm
    best = {CHAIN_SHORT: np.inf, CHAIN_LONG: np.inf}
    for _ in range(reps):
        for K in (CHAIN_SHORT, CHAIN_LONG):
            t0 = time.perf_counter()
            run(K)
            best[K] = min(best[K], time.perf_counter() - t0)
    return (best[CHAIN_LONG] - best[CHAIN_SHORT]) / (CHAIN_LONG - CHAIN_SHORT)


#: v5e HBM peak bandwidth (GB/s) — the SpMV roofline denominator.  A
#: matvec is memory-bound at ~1 byte/nnz (bf16 half-traffic storage) to
#: ~4 (f32 full storage), so rate/roofline = bytes_streamed/dt/PEAK.
HBM_PEAK_GBS = 819.0


def roofline_fraction(rate_nnz_s: float, nnz: int, bytes_per_matvec: int) -> float:
    """Fraction of HBM peak the measured rate corresponds to, given the
    minimal bytes the path must stream per matvec (stored blocks + x + y;
    BASELINE.md round-2 weak item: make the efficiency visible, not just
    the absolute rate)."""
    dt = nnz / rate_nnz_s
    return (bytes_per_matvec / dt) / (HBM_PEAK_GBS * 1e9)


def best_plausible_time(matvec, operand, x, bytes_per_matvec, nnz) -> float:
    """Per-matvec seconds from BOTH timing modes, keeping only
    PHYSICALLY PLAUSIBLE samples: the axon tunnel's readback does not
    reliably block, and an under-measured two-point slope can imply
    impossible bandwidth (>100% of HBM peak) — those samples are
    artifacts, not speed.  A rate is accepted only if its implied
    bandwidth stays within 1.05x the HBM roofline; among accepted
    samples the fastest wins (fused chain is usually it)."""
    cands = []
    try:
        cands.append(time_fn(make_chained(matvec), operand, x))
    except Exception as e:  # pragma: no cover - tunnel-compile hiccups
        print(f"# chained timing failed: {type(e).__name__}: {e}", file=sys.stderr)
    try:
        cands.append(time_dispatch_pipeline(matvec, operand, x))
    except Exception as e:  # pragma: no cover
        print(f"# pipelined timing failed: {type(e).__name__}: {e}", file=sys.stderr)
    if not cands:
        raise RuntimeError("no timing sample succeeded")
    floor = bytes_per_matvec / (1.05 * HBM_PEAK_GBS * 1e9)
    ok = [t for t in cands if t >= floor]
    return min(ok) if ok else max(cands)


def serial_scatter_baseline(nnz_sample: int = 2_000_000) -> float:
    """Reference cost model: serial COO scatter out[row] += in[col]*v
    (triplets_matrix.hpp:314-318) on the host CPU.  Returns nnz/s."""
    rng = np.random.default_rng(0)
    n = 1 << 16
    rows = rng.integers(0, n, nnz_sample).astype(np.int64)
    cols = rng.integers(0, n, nnz_sample).astype(np.int64)
    vals = rng.standard_normal(nnz_sample)
    x = rng.standard_normal(n)
    out = np.zeros(n)
    t0 = time.perf_counter()
    np.add.at(out, rows, vals * x[cols])
    dt = time.perf_counter() - t0
    return nnz_sample / dt


def main():
    # --full additionally times the secondary paths (more tunnel
    # compiles; the lean default keeps the driver-run bench robust to
    # slow-compile phases and relies on the persistent compile cache)
    full = "--full" in sys.argv

    # ~100M true nonzeros: 2048 block rows x ~3 dense 128x128 blocks
    # (symmetric block-tridiagonal — the Hermitian Lanczos matvec case)
    nbr, bm = 2048, 128
    bsr = banded_block_bsr(nbr, bm)
    nnz = int(np.count_nonzero(np.asarray(bsr.data)))
    x = jnp.asarray(np.random.default_rng(1).standard_normal(bsr.shape[1]).astype(np.float32))

    # bf16 storage, f32 accumulation: SpMV is HBM-bound, so halving the
    # stored bytes ~doubles nnz/s; output is bit-identical to f32 storage
    # on TPU (XLA multiplies f32 matmuls in bf16 by default)
    bsr16 = bsr.astype(jnp.bfloat16)
    rates = {}  # name -> nnz/s
    path_bytes = {}  # name -> minimal bytes streamed per matvec
    n = bsr.shape[0]

    # flagship: symmetric Pallas kernel (diag + upper storage, each
    # off-diagonal block read once and applied twice — ~1.5x less HBM
    # traffic than any full-storage path; eigenex_tpu/sparse/sym_bsr.py)
    try:
        from eigenex_tpu.ops.pallas_spmv import sym_bsr_matvec_pallas
        from eigenex_tpu.sparse.sym_bsr import sym_bsr_from_bsr

        sym16 = sym_bsr_from_bsr(bsr).astype(jnp.bfloat16)
        y_s = sym_bsr_matvec_pallas(sym16, x)
        # oracle: the SAME bf16-stored operator lifted exactly to f32 and
        # applied via XLA — isolates kernel bugs from precision modes
        # (the bf16 XLA path truncates x to bf16 per pass; the pallas
        # kernels run HIGHEST since round 4 and are more accurate)
        y_x = sym16.astype(jnp.float32)._xla_matvec(x)
        err = float(jnp.linalg.norm(y_s - y_x) / jnp.linalg.norm(y_x))
        if err < 1e-4:
            # streaming-kernel traffic: stored diag+upper blocks bf16,
            # x read twice (cur+next strip windows, f32), y written once
            path_bytes["pallas sym bf16"] = (
                (sym16.diag_data.size + sym16.upper_data.size) * 2 + 3 * n * 4
            )
            t = best_plausible_time(
                sym_bsr_matvec_pallas, sym16, x, path_bytes["pallas sym bf16"], nnz
            )
            rates["pallas sym bf16"] = nnz / t
        else:
            print(f"# sym pallas disagrees (rel err {err:.2e})", file=sys.stderr)
    except Exception as e:
        print(f"# sym pallas unavailable: {type(e).__name__}: {e}", file=sys.stderr)

    path_bytes["xla bf16"] = bsr16.data.size * 2 + 2 * n * 4
    t = best_plausible_time(
        lambda b, v: b.matvec(v), bsr16, x, path_bytes["xla bf16"], nnz
    )
    rates["xla bf16"] = nnz / t

    if full:
        try:
            from eigenex_tpu.ops.pallas_spmv import bsr_matvec_pallas

            y_p = bsr_matvec_pallas(bsr16, x)
            y_x = bsr16.astype(jnp.float32).matvec(x)
            if float(jnp.linalg.norm(y_p - y_x) / jnp.linalg.norm(y_x)) < 1e-4:
                rates["pallas bf16"] = nnz / time_fn(
                    make_chained(bsr_matvec_pallas), bsr16, x
                )
                rates["pallas f32"] = nnz / time_fn(
                    make_chained(bsr_matvec_pallas), bsr, x
                )
        except Exception as e:
            print(f"# pallas path unavailable: {type(e).__name__}: {e}", file=sys.stderr)
        rates["xla f32"] = nnz / time_fn(make_chained(lambda b, v: b.matvec(v)), bsr, x)

    best_name = max(rates, key=rates.get)
    nnz_per_s = rates[best_name]
    baseline = serial_scatter_baseline()

    def fmt(k, v):
        if k in path_bytes:
            rf = roofline_fraction(v, nnz, path_bytes[k])
            return f"{k}: {v/1e9:.2f} Gnnz/s ({rf*100:.0f}% roofline)"
        return f"{k}: {v/1e9:.2f} Gnnz/s"

    print(
        "# "
        + ", ".join(fmt(k, v) for k, v in rates.items())
        + f", serial-scatter baseline: {baseline/1e6:.1f} Mnnz/s",
        file=sys.stderr,
    )
    out = {
        "metric": "spmv_nnz_per_s",
        "value": nnz_per_s,
        "unit": "nnz/s",
        "vs_baseline": nnz_per_s / baseline,
    }
    if best_name in path_bytes:
        out["roofline_frac"] = round(
            roofline_fraction(nnz_per_s, nnz, path_bytes[best_name]), 3
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
