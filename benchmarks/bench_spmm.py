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


def time_matmat(matmat, A, X, reps=4):
    """Per-matmat seconds via dispatch-pipelined two-point chain slope
    (see bench.py: cancels the ~30 ms axon tunnel dispatch latency)."""
    mm = jax.jit(matmat)

    def run(K):
        V = X
        for _ in range(K):
            V = mm(A, V.astype(jnp.float32))
            V = V / jnp.linalg.norm(V)
        return float(jnp.vdot(V[:, 0], V[:, 0]))

    run(3)
    best = {CHAIN_SHORT: np.inf, CHAIN_LONG: np.inf}
    for _ in range(reps):
        for K in (CHAIN_SHORT, CHAIN_LONG):
            t0 = time.perf_counter()
            run(K)
            best[K] = min(best[K], time.perf_counter() - t0)
    return (best[CHAIN_LONG] - best[CHAIN_SHORT]) / (CHAIN_LONG - CHAIN_SHORT)


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
    rates = {}
    for label, (fn, A) in paths.items():
        t0 = time.perf_counter()
        try:
            rates[label] = nnz / time_matmat(fn, A, X)
            print(
                f"# {label}: {rates[label] / 1e9:.1f} Gnnz/s"
                f" ({time.perf_counter() - t0:.0f}s incl. compile)",
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
            }
        )
    )


if __name__ == "__main__":
    main()
