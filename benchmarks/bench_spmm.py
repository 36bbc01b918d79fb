"""SpMM (multi-RHS) benchmark on one TPU chip — the block-Lanczos feed.

Round-2 finding: at p≈8 RHS columns the matmat is still HBM-bound on
block bytes (full-storage XLA einsum runs ~90% of its 2-byte/nnz
roofline), so the symmetric half-traffic layout should win ~2× — but
its XLA scatter-add path loses the advantage to the `.at[].add` pass.
`sym_bsr_matmat_pallas` keeps the X/Y panels VMEM-resident and scatters
in-register, which is the experiment this script measures.

Paths timed (same operator, effective Gnnz/s = full applied nnz / s):
  - xla full bf16/f32: BSRMatrix.matmat einsum (round-2 incumbent)
  - sym xla:           SymBSRMatrix._xla_matmat scatter-add
  - sym pallas:        sym_bsr_matmat_pallas (this round's kernel)
  - pallas full:       bsr_matmat_pallas (known 5.7x off, for the record)

Sizes: nbr=1536 keeps the p=8 resident panels (12.6 MB) inside the
~14 MB scoped-VMEM budget single-chip; larger n rides the mesh
row-partition where each shard is again under the cap.

Prints one JSON line {"metric": "spmm_nnz_per_s", ...} for BASELINE.md.
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


CHAIN_SHORT, CHAIN_LONG = 8, 72


def time_matmat(matmat, A, X, min_bytes, reps=5):
    """Per-matmat seconds via dispatch-pipelined two-point chain slope
    with the shared protocol discipline (utils/benchtime): medians of
    ``reps`` per point (min-of-reps biased low under tunnel jitter) and
    a physical-plausibility clamp on the result — round-3 recorded this
    harness swinging unchanged XLA paths ±50% across runs; the median +
    clamp + reported spread replace cross-run eyeballing."""
    from eigenex_tpu.utils.benchtime import clamp_to_roofline, timed_median

    mm = jax.jit(matmat)

    def run(K):
        V = X
        for _ in range(K):
            V = mm(A, V.astype(jnp.float32))
            V = V / jnp.linalg.norm(V)
        return float(jnp.vdot(V[:, 0], V[:, 0]))

    run(3)
    med_s, ts_s = timed_median(lambda: run(CHAIN_SHORT), reps)
    med_l, ts_l = timed_median(lambda: run(CHAIN_LONG), reps)
    per = (med_l - med_s) / (CHAIN_LONG - CHAIN_SHORT)
    per, clamped = clamp_to_roofline(max(per, 1e-12), min_bytes)
    spread = (np.max(ts_l) - np.min(ts_l)) / (CHAIN_LONG - CHAIN_SHORT)
    return per, dict(reps=reps, spread_per_s=float(spread), clamped=clamped)


def main():
    sys.path.insert(0, ".")
    from bench import banded_block_bsr
    from eigenex_tpu.ops.pallas_spmv import bsr_matmat_pallas, sym_bsr_matmat_pallas
    from eigenex_tpu.sparse.sym_bsr import sym_bsr_from_bsr

    nbr, bm, p = 1536, 128, 8
    bsr = banded_block_bsr(nbr, bm)
    nnz = int(np.count_nonzero(np.asarray(bsr.data)))
    sym = sym_bsr_from_bsr(bsr)
    bsr16, sym16 = bsr.astype(jnp.bfloat16), sym.astype(jnp.bfloat16)
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((bsr.shape[0], p)).astype(np.float32))

    # correctness gate before timing
    print("# building/correctness gate...", file=sys.stderr, flush=True)
    ref = np.asarray(bsr.matmat(X))
    got = np.asarray(sym_bsr_matmat_pallas(sym16, X))
    err = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    print(f"# sym pallas vs xla rel err {err:.2e}", file=sys.stderr, flush=True)
    if err > 2e-2:
        print(f"# sym pallas SpMM disagrees (rel err {err:.2e})", file=sys.stderr)

    paths = {
        "sym pallas bf16": (sym_bsr_matmat_pallas, sym16),
        "sym pallas f32": (sym_bsr_matmat_pallas, sym),
        "xla full bf16": (lambda b, v: b.matmat(v), bsr16),
        "xla full f32": (lambda b, v: b.matmat(v), bsr),
        "sym xla bf16": (lambda s, v: s._xla_matmat(v), sym16),
        "pallas full bf16": (bsr_matmat_pallas, bsr16),
    }
    def path_bytes(label, A):
        # minimal HBM bytes per matmat: stored blocks + X in + Y out
        if label.startswith("sym"):
            blocks = (A.diag_data.size + A.upper_data.size) * A.diag_data.dtype.itemsize
        else:
            blocks = A.data.size * A.data.dtype.itemsize
        return blocks + 2 * X.size * 4

    rates = {}
    protocol = {}
    for label, (fn, A) in paths.items():
        t0 = time.perf_counter()
        try:
            per, stats = time_matmat(fn, A, X, path_bytes(label, A))
            rates[label] = nnz / per
            protocol[label] = stats
            print(
                f"# {label}: {rates[label] / 1e9:.1f} Gnnz/s"
                f" (median of {stats['reps']}, spread {stats['spread_per_s']*1e6:.0f} us/mv"
                f"{', CLAMPED to roofline' if stats['clamped'] else ''};"
                f" {time.perf_counter() - t0:.0f}s incl. compile)",
                file=sys.stderr,
                flush=True,
            )
        except Exception as e:  # keep the matrix honest even if one path dies
            print(f"# {label} failed: {type(e).__name__}", file=sys.stderr, flush=True)

    for k, v in sorted(rates.items(), key=lambda kv: -kv[1]):
        print(f"# {k}: {v / 1e9:.1f} Gnnz/s", file=sys.stderr)
    best = max(rates, key=rates.get)
    print(
        json.dumps(
            {
                "metric": "spmm_nnz_per_s",
                "value": rates[best],
                "unit": "nnz/s",
                "p": p,
                "n": bsr.shape[0],
                "best_path": best,
                "vs_xla_full": rates[best] / rates["xla full bf16"],
                "protocol": protocol.get(best),
            }
        )
    )


if __name__ == "__main__":
    main()
