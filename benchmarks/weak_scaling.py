"""Weak-scaling harness: distributed Lanczos nnz/s vs device count.

BASELINE.json north star: ">70% weak-scaling nnz/s efficiency on a
10^8-row block-sparse Hamiltonian".  Per-device problem size is held
constant while the mesh grows; efficiency = (nnz/s at d devices) /
(d × nnz/s at 1 device).

On this box only one TPU chip is reachable, so real-ICI numbers need a
pod slice; run with ``--cpu`` to exercise the full code path on 8
virtual CPU devices (functional check, not a perf claim).  The same
script is the measurement harness on real multi-chip hardware.

Usage:  python benchmarks/weak_scaling.py [--cpu] [--devices 1 2 4 8]
"""

import argparse
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="use 8 virtual CPU devices")
    ap.add_argument("--devices", type=int, nargs="*", default=None)
    ap.add_argument("--block-rows-per-device", type=int, default=256)
    ap.add_argument("--bm", type=int, default=128)
    ap.add_argument("--mode", choices=["allgather", "halo", "colsplit", "sym_halo"], default="halo")
    args = ap.parse_args()

    if args.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
        ).strip()
        sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
        os.environ["JAX_PLATFORMS"] = "cpu"

    import numpy as np
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import banded_block_bsr
    from eigenex_tpu.parallel import make_mesh, pad_bsr_for_mesh
    from eigenex_tpu.parallel.distributed import distributed_lanczos_steps
    from eigenex_tpu.solvers.lanczos import init_lanczos_state

    # the axon plugin overrides JAX_PLATFORMS, so select the platform
    # explicitly (jax.devices() would return the single TPU regardless)
    devices = jax.devices("cpu") if args.cpu else jax.devices()
    if args.cpu:
        jax.config.update("jax_default_device", devices[0])
    counts = args.devices or sorted({d for d in (1, 2, 4, 8) if d <= len(devices)})
    m = 32  # Krylov subspace for the step benchmark
    results = {}
    for d in counts:
        nbr = args.block_rows_per_device * d
        bsr = pad_bsr_for_mesh(banded_block_bsr(nbr, args.bm), d)
        nnz = int(np.count_nonzero(np.asarray(bsr.data)))
        mesh = make_mesh(d, devices=devices[:d])
        op = bsr.as_linear_operator(use_pallas=False)
        s0 = init_lanczos_state(op, m, seed=0)

        def run(k):
            s = distributed_lanczos_steps(bsr, s0, k, mesh, matvec_mode=args.mode)
            return float(s.beta[k - 1])

        k1, k2 = 4, 20
        for k in (k1, k2):
            run(k)
        best = {k1: np.inf, k2: np.inf}
        for _ in range(3):
            for k in (k1, k2):
                t0 = time.perf_counter()
                run(k)
                best[k] = min(best[k], time.perf_counter() - t0)
        per_iter = (best[k2] - best[k1]) / (k2 - k1)
        nnz_rate = nnz / per_iter
        results[d] = nnz_rate
        eff = nnz_rate / (d * results[counts[0]] / counts[0]) if counts[0] in results else 1.0
        print(
            json.dumps(
                {
                    "devices": d,
                    "n": bsr.shape[0],
                    "nnz": nnz,
                    "lanczos_iter_ms": per_iter * 1e3,
                    "nnz_per_s": nnz_rate,
                    "weak_scaling_efficiency": eff,
                    "mode": args.mode,
                }
            )
        )


if __name__ == "__main__":
    main()
