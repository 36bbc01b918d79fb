"""BASELINE config 3 at scale: Heisenberg spin-chain ground state.

Builds the total-Sz=0 sector of an L-site XXZ chain with the native C++
enumerator (dim C(L, L/2); L=24 → 2.7M states, ~35M nonzeros), runs f32
Lanczos on the TPU (COO segment-sum SpMV), then polishes the energy on
host in f64 — the full symmetry-sector pipeline end-to-end.

For L ≤ 14 the energy is cross-checked against dense diagonalization;
at L=24 correctness is certified by the f64 residual of the refined
pair.

Usage: python benchmarks/bench_heisenberg.py [--L 24]
"""

import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--L", type=int, default=24)
    args = ap.parse_args()
    L = args.L

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from eigenex_tpu import native
    from eigenex_tpu.solvers.lanczos import LanczosEigenSolver, LanczosOptions
    from eigenex_tpu.solvers.refine import rayleigh_refine
    from eigenex_tpu.sparse.coo import COOMatrix

    t0 = time.time()
    r, c, v, dim = native.heisenberg_sector(L, L // 2, 1.0, 1.0, False)
    order = np.lexsort((c, r))
    r, c, v = r[order], c[order], v[order]
    t_build = time.time() - t0
    print(
        f"# L={L} sector dim={dim:,} nnz={len(v):,} built in {t_build:.1f}s (native)",
        file=sys.stderr,
    )

    # f32 device operator; f64 triplets stay on host for refinement
    coo32 = COOMatrix(
        jnp.asarray(r.astype(np.int32)),
        jnp.asarray(c.astype(np.int32)),
        jnp.asarray(v.astype(np.float32)),
        (dim, dim),
    )
    coo64 = COOMatrix(r.astype(np.int32), c.astype(np.int32), v, (dim, dim))

    t0 = time.time()
    res = LanczosEigenSolver(
        coo32.as_linear_operator(),
        LanczosOptions(max_eigenvalues=1, tolerance=1e-8, max_subspace=160, check_every=16),
    ).compute()
    t_solve = time.time() - t0
    e32 = float(res.eigenvalues[0])
    print(
        f"# f32 Lanczos on {jax.default_backend()}: {res.iterations} iters in "
        f"{t_solve:.1f}s -> E0={e32:.8f} ({res.termination})",
        file=sys.stderr,
    )

    t0 = time.time()
    lam, resid = rayleigh_refine(coo64, res.eigenvectors)
    t_ref = time.time() - t0
    print(
        f"# f64 Rayleigh: E0={lam[0]:.12f} (residual {resid[0]:.2e}) in {t_ref:.1f}s",
        file=sys.stderr,
    )

    if L <= 14:
        ref = float(np.linalg.eigvalsh(coo64.to_dense()).min())
        print(f"# dense oracle: {ref:.12f} |err|={abs(lam[0]-ref):.2e}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "heisenberg_ground_state",
                "L": L,
                "sector_dim": dim,
                "nnz": len(v),
                "energy_f64": lam[0],
                "residual": float(resid[0]),
                "iterations": res.iterations,
                "solve_seconds": t_solve,
                "iters_per_s": res.iterations / t_solve,
            }
        )
    )


if __name__ == "__main__":
    main()
