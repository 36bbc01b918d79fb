"""Lanczos iteration-rate benchmark on one TPU chip.

Second headline metric of BASELINE.json ("Lanczos iterations/sec").
Measures full Lanczos steps — SpMV + three-term recurrence + masked-CGS2
full reorthogonalization against the whole preallocated basis — via the
two-point chain slope (see bench.py for why: the axon tunnel adds ~30 ms
per dispatch and block_until_ready does not reliably wait).

Prints one JSON line {"metric": "lanczos_iters_per_s", ...}; numbers
are recorded in BASELINE.md.
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    sys.path.insert(0, ".")
    from bench import banded_block_bsr
    from eigenex_tpu.solvers.lanczos import init_lanczos_state, lanczos_steps

    from eigenex_tpu.sparse.sym_bsr import sym_bsr_from_bsr

    nbr, bm, m = 2048, 128, 64  # n = 262144, 64-dim subspace
    bsr = banded_block_bsr(nbr, bm)
    nnz = int(np.count_nonzero(np.asarray(bsr.data)))
    ops = {
        "xla_f32": bsr.as_linear_operator(use_pallas=False),
        # flagship: symmetric half-traffic Pallas kernel on bf16 storage
        "sym_pallas_bf16": sym_bsr_from_bsr(bsr).astype(jnp.bfloat16).as_linear_operator(),
    }

    def run(op, num_steps, reorth):
        s0 = init_lanczos_state(op, m, seed=0)
        s = lanczos_steps(op, s0, num_steps, reorthogonalize_interval=reorth)
        return float(s.beta[num_steps - 1])  # forces readback

    results = {}
    for op_label, op in ops.items():
        for reorth, label in ((1, "full_reorth"), (0, "no_reorth")):
            k1, k2 = 8, 40
            for k in (k1, k2):
                run(op, k, reorth)  # compile + warm
            best = {k1: np.inf, k2: np.inf}
            for _ in range(3):
                for k in (k1, k2):
                    t0 = time.perf_counter()
                    run(op, k, reorth)
                    best[k] = min(best[k], time.perf_counter() - t0)
            per_iter = (best[k2] - best[k1]) / (k2 - k1)
            results[f"{op_label}/{label}"] = 1.0 / per_iter
            print(
                f"# {op_label}/{label}: {1.0/per_iter:.1f} iters/s "
                f"({per_iter*1e3:.3f} ms/iter, SpMV share "
                f"{nnz*4/0.775e12/per_iter*100:.0f}% of f32 HBM-limit time)",
                file=sys.stderr,
            )

    print(
        json.dumps(
            {
                "metric": "lanczos_iters_per_s",
                "value": max(
                    results["xla_f32/full_reorth"],
                    results["sym_pallas_bf16/full_reorth"],
                ),
                "unit": "iters/s",
                "vs_baseline": None,
                "detail": results,
                "n": bsr.shape[0],
                "subspace": m,
            }
        )
    )


if __name__ == "__main__":
    main()
