"""Large-scale single-chip run: multi-GB block-sparse operator.

Validates the HBM-scale regime of BASELINE config 5 on one chip: an
n ≈ 8.4M-row block-tridiagonal operator (~1.2G true nonzeros) stored
bf16 (6.4 GB in HBM of 16 GB), SpMV + full Lanczos steps timed with the
two-point chain slope.  The same operator row-partitions over a pod
slice via eigenex_tpu.parallel for the 10^8-row multi-host target.
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    sys.path.insert(0, ".")
    from eigenex_tpu.sparse.bsr import BSRMatrix
    from eigenex_tpu.solvers.lanczos import init_lanczos_state, lanczos_steps

    nbr, bm, kmax = 65536, 128, 3
    n = nbr * bm
    print(f"# building n={n:,} rows, {nbr*kmax*bm*bm/1e9:.2f}G padded nnz (bf16)", file=sys.stderr)
    # build on device directly to avoid a 12 GB host array
    key = jax.random.PRNGKey(0)
    data = jax.random.normal(key, (nbr, kmax, bm, bm), jnp.bfloat16)
    r = jnp.arange(nbr, dtype=jnp.int32)
    cols = jnp.stack([r, jnp.maximum(r - 1, 0), jnp.minimum(r + 1, nbr - 1)], axis=1)
    bsr = BSRMatrix(data, cols, (n, n))
    nnz = nbr * kmax * bm * bm  # fully dense blocks

    x = jax.random.normal(jax.random.PRNGKey(1), (n,), jnp.float32)

    @jax.jit
    def chain(b, v, k):
        def body(_, v):
            y = b.matvec(v)
            return (y / jnp.linalg.norm(y)).astype(jnp.float32)

        out = jax.lax.fori_loop(0, k, body, v)
        return jnp.vdot(out, out)

    k1, k2 = 4, 20
    for k in (k1, k2):
        float(chain(bsr, x, k))
    best = {k1: np.inf, k2: np.inf}
    for _ in range(3):
        for k in (k1, k2):
            t0 = time.perf_counter()
            float(chain(bsr, x, k))
            best[k] = min(best[k], time.perf_counter() - t0)
    per = (best[k2] - best[k1]) / (k2 - k1)
    print(
        f"# SpMV: {per*1e3:.2f} ms ({nnz/per/1e9:.1f} Gnnz/s, "
        f"{nnz*2/per/1e9:.0f} GB/s)",
        file=sys.stderr,
    )

    # full Lanczos step at this scale (subspace 32: basis = 1.1 GB f32)
    op = bsr.as_linear_operator(use_pallas=False)
    s0 = init_lanczos_state(op, 32, seed=0)

    def run(k):
        s = lanczos_steps(op, s0, k)
        return float(s.beta[k - 1])

    for k in (2, 10):
        run(k)
    b2 = {2: np.inf, 10: np.inf}
    for _ in range(2):
        for k in (2, 10):
            t0 = time.perf_counter()
            run(k)
            b2[k] = min(b2[k], time.perf_counter() - t0)
    per_it = (b2[10] - b2[2]) / 8
    print(f"# Lanczos (full reorth, m=32): {per_it*1e3:.2f} ms/iter", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "large_scale_spmv_nnz_per_s",
                "value": nnz / per,
                "unit": "nnz/s",
                "n_rows": n,
                "hbm_gb": nnz * 2 / 1e9,
                "lanczos_iter_ms": per_it * 1e3,
            }
        )
    )


if __name__ == "__main__":
    main()
