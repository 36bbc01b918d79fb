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



def slope_median(run, k1, k2, min_bytes, reps=5):
    """Two-point chain slope with the shared protocol discipline:
    medians of ``reps`` per point + the HBM plausibility clamp
    (utils/benchtime) — min-of-reps under tunnel jitter biased low and
    round-3 recorded a slope "even going negative once"."""
    from eigenex_tpu.utils.benchtime import clamp_to_roofline, timed_median

    med1, ts1 = timed_median(lambda: run(k1), reps)
    med2, ts2 = timed_median(lambda: run(k2), reps)
    per = (med2 - med1) / (k2 - k1)
    per, clamped = clamp_to_roofline(max(per, 1e-12), min_bytes)
    spread = (np.max(ts2) - np.min(ts2)) / (k2 - k1)
    return per, dict(reps=reps, spread_per_s=float(spread), clamped=clamped)


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
    per, st = slope_median(lambda k: float(chain(bsr, x, k)), k1, k2, nnz * 2 + 2 * n * 4)
    print(
        f"# SpMV: {per*1e3:.2f} ms ({nnz/per/1e9:.1f} Gnnz/s, "
        f"{nnz*2/per/1e9:.0f} GB/s; median of {st['reps']}, spread "
        f"{st['spread_per_s']*1e3:.2f} ms/mv{', CLAMPED' if st['clamped'] else ''})",
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

    # --- symmetric storage: 2x the rows in the SAME HBM footprint ------
    # (diag + single upper off-diagonal per block row, built on device;
    # each upper block applies to both triangles).  At this n the Pallas
    # sym kernel's VMEM-resident x/y no longer fit; the matvec runs the
    # round-3 STREAMING sym kernel (strip-windowed x, carried y scatter),
    # which keeps the half-traffic layout on the fast path at ANY size.
    del bsr, data, cols, op, s0
    from eigenex_tpu.sparse.sym_bsr import SymBSRMatrix

    nbr_s = 2 * nbr  # 131072 block rows -> n = 16.8M
    n_s = nbr_s * bm
    diag = jax.random.normal(jax.random.PRNGKey(2), (nbr_s, bm, bm), jnp.bfloat16)
    upper = jax.random.normal(jax.random.PRNGKey(3), (nbr_s, 1, bm, bm), jnp.bfloat16)
    # last block row has no upper neighbor: zero block at padding col 0
    upper = upper.at[-1].set(0)
    ucols = jnp.minimum(jnp.arange(nbr_s, dtype=jnp.int32), nbr_s - 1)[:, None]
    ucols = ucols.at[:-1, 0].set(jnp.arange(1, nbr_s, dtype=jnp.int32))
    ucols = ucols.at[-1, 0].set(0)
    # band_reach=1 (block-tridiagonal upper): routes matvec to the
    # STREAMING Pallas kernel — no VMEM size cap (round-3 kernel)
    sym = SymBSRMatrix(diag, upper, ucols, (n_s, n_s), band_reach=1)
    nnz_eff = sym.nnz_applied  # both triangles
    xs = jax.random.normal(jax.random.PRNGKey(4), (n_s,), jnp.float32)
    print(
        f"# sym: n={n_s:,} rows, {sym.nnz_stored*2/1e9:.1f} GB stored bf16, "
        f"{nnz_eff/1e9:.2f}G effective nnz",
        file=sys.stderr,
    )

    @jax.jit
    def chain_s(s, v, k):
        def body(_, v):
            y = s.matvec(v)
            return (y / jnp.linalg.norm(y)).astype(jnp.float32)

        out = jax.lax.fori_loop(0, k, body, v)
        return jnp.vdot(out, out)

    for k in (k1, k2):
        float(chain_s(sym, xs, k))
    per_s, st_s = slope_median(
        lambda k: float(chain_s(sym, xs, k)), k1, k2,
        sym.nnz_stored * 2 + 3 * n_s * 4,
    )
    print(
        f"# sym SpMV: {per_s*1e3:.2f} ms ({nnz_eff/per_s/1e9:.1f} effective Gnnz/s; "
        f"median of {st_s['reps']}, spread {st_s['spread_per_s']*1e3:.2f} ms/mv"
        f"{', CLAMPED' if st_s['clamped'] else ''})",
        file=sys.stderr,
    )

    ops = sym.as_linear_operator()
    s0s = init_lanczos_state(ops, 32, seed=0)

    def run_s(k):
        s = lanczos_steps(ops, s0s, k)
        return float(s.beta[k - 1])

    for k in (2, 10):
        run_s(k)
    b3 = {2: np.inf, 10: np.inf}
    for _ in range(2):
        for k in (2, 10):
            t0 = time.perf_counter()
            run_s(k)
            b3[k] = min(b3[k], time.perf_counter() - t0)
    per_it_s = (b3[10] - b3[2]) / 8
    print(
        f"# sym Lanczos (full reorth, m=32, n=16.8M): {per_it_s*1e3:.2f} ms/iter",
        file=sys.stderr,
    )

    # streaming sym SpMM at full scale (p=8 RHS columns): the block-
    # filter feed (Chebyshev/KPM/block Lanczos) past the resident cap
    p = 8
    Xs = jax.random.normal(jax.random.PRNGKey(5), (n_s, p), jnp.float32)

    @jax.jit
    def chain_mm(s, V, k):
        def body(_, V):
            Y = s.matmat(V)
            return (Y / jnp.linalg.norm(Y)).astype(jnp.float32)

        out = jax.lax.fori_loop(0, k, body, V)
        return jnp.vdot(out[:, 0], out[:, 0])

    k1m, k2m = 2, 8
    for k in (k1m, k2m):
        float(chain_mm(sym, Xs, k))
    per_mm, st_mm = slope_median(
        lambda k: float(chain_mm(sym, Xs, k)), k1m, k2m,
        sym.nnz_stored * 2 + 3 * n_s * p * 4,
    )
    print(
        f"# sym SpMM (p=8, streaming kernel): {per_mm*1e3:.2f} ms "
        f"({nnz_eff/per_mm/1e9:.1f} eff Gnnz/s per col, "
        f"{nnz_eff*p/per_mm/1e12:.2f} Tnnz·p/s; median of {st_mm['reps']}, "
        f"spread {st_mm['spread_per_s']*1e3:.2f} ms{', CLAMPED' if st_mm['clamped'] else ''})",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "large_scale_spmv_nnz_per_s",
                "value": nnz / per,
                "unit": "nnz/s",
                "n_rows": n,
                "hbm_gb": nnz * 2 / 1e9,
                "lanczos_iter_ms": per_it * 1e3,
                "sym_n_rows": n_s,
                "sym_effective_nnz_per_s": nnz_eff / per_s,
                "sym_lanczos_iter_ms": per_it_s * 1e3,
                "sym_spmm_p8_eff_nnz_per_s": nnz_eff / per_mm,
            }
        )
    )


if __name__ == "__main__":
    main()
