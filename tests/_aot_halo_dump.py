"""Subprocess helper: AOT-compile the halo / sym_halo matvec for an
8-chip TPU v5e topology (deviceless, via libtpu's topology API) and dump
the post-scheduling HLO to stdout.

Run by tests/test_hlo_overlap.py in a clean subprocess (axon plugin
disabled via PALLAS_AXON_POOL_IPS="") so the compile never touches the
live TPU tunnel.  The printed module's ENTRY instruction order IS the
compiled schedule — the latency-hiding scheduler has already run — so
the parent test can assert that collective-permute-start/-done bracket
the local diagonal-block SpMV fusion (SURVEY.md §5's halo/compute
overlap mandate, recorded as an unverified hypothesis through round 2).

Round 4 extends the dump to every shipped distributed mode: the matmat
twins (same bracket assertion as the matvecs), the colsplit
``psum_scatter`` path, and the 2-D R x C panel-grid operator (whose
gather -> compute -> reduce-scatter chain is a DOCUMENTED serial floor
within one application — the parent test asserts the schedule shows
exactly that structure).

Usage: python tests/_aot_halo_dump.py
    {halo|sym_halo|halo_matmat|sym_halo_matmat|colsplit|grid2d}
Prints "TOPOLOGY_UNAVAILABLE: <err>" (exit 3) when deviceless AOT is not
supported in this environment.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(mode: str) -> int:
    import jax
    import jax.numpy as jnp
    from functools import partial
    from jax import shard_map
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    try:
        from jax.experimental import topologies

        topo = topologies.get_topology_desc(platform="tpu", topology_name="v5e:2x4")
    except Exception as e:  # noqa: BLE001 — any failure means "no AOT here"
        print(f"TOPOLOGY_UNAVAILABLE: {type(e).__name__}: {e}")
        return 3

    from eigenex_tpu.parallel.distributed import (
        _local_colsplit_matvec,
        _local_grid2d_matvec,
        halo_matmat,
        halo_matvec,
        pad_bsr_for_mesh,
        split_bsr_colpanels,
        split_bsr_grid,
        split_bsr_halo,
        split_sym_bsr_halo,
        sym_halo_matmat,
        sym_halo_matvec,
    )
    from eigenex_tpu.sparse.bsr import BSRMatrix

    # symmetric block-tridiagonal operator, 64 block rows of 128
    rng = np.random.default_rng(0)
    nbr, bm = 64, 128
    diag_blocks = rng.standard_normal((nbr, bm, bm)).astype(np.float32)
    diag_blocks = (diag_blocks + diag_blocks.transpose(0, 2, 1)) / 2
    off = rng.standard_normal((nbr - 1, bm, bm)).astype(np.float32)
    data = np.zeros((nbr, 3, bm, bm), np.float32)
    cols = np.zeros((nbr, 3), np.int32)
    for r in range(nbr):
        data[r, 0], cols[r, 0] = diag_blocks[r], r
        slot = 1
        if r > 0:
            data[r, slot], cols[r, slot] = off[r - 1].T, r - 1
            slot += 1
        if r + 1 < nbr:
            data[r, slot], cols[r, slot] = off[r], r + 1
    n = nbr * bm
    bsr = pad_bsr_for_mesh(BSRMatrix(jnp.asarray(data), jnp.asarray(cols), (n, n)), 8)

    if mode == "grid2d":
        mesh = Mesh(np.array(topo.devices).reshape(2, 4), ("r", "c"))
    else:
        mesh = Mesh(np.array(topo.devices), ("rows",))

    def sds(a, spec=P("rows")):
        return jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=NamedSharding(mesh, spec))

    if mode != "grid2d":  # the 2-D mesh has no "rows" axis
        x_s = sds(jnp.zeros((bsr.shape[0],), jnp.float32))
        X_s = sds(jnp.zeros((bsr.shape[0], 8), jnp.float32), P("rows", None))
    if mode == "halo":
        d, l, r = split_bsr_halo(bsr, 8)
        fn = shard_map(
            partial(halo_matvec, axis_name="rows", bn=bm),
            mesh=mesh,
            in_specs=(P("rows"),) * 7,
            out_specs=P("rows"),
        )
        args = [sds(a) for a in (d[0], d[1], l[0], l[1], r[0], r[1])] + [x_s]
    elif mode == "halo_matmat":
        d, l, r = split_bsr_halo(bsr, 8)
        fn = shard_map(
            partial(halo_matmat, axis_name="rows", bn=bm),
            mesh=mesh,
            in_specs=(P("rows"),) * 6 + (P("rows", None),),
            out_specs=P("rows", None),
        )
        args = [sds(a) for a in (d[0], d[1], l[0], l[1], r[0], r[1])] + [X_s]
    elif mode == "colsplit":
        pd, pc = split_bsr_colpanels(bsr, 8)
        fn = shard_map(
            partial(_local_colsplit_matvec, axis_name="rows", bn=bm),
            mesh=mesh,
            in_specs=((P("rows"), P("rows")), P("rows")),
            out_specs=P("rows"),
        )
        compiled = jax.jit(fn).lower((sds(pd), sds(pc)), x_s).compile()
        print(compiled.as_text())
        return 0
    elif mode == "grid2d":
        pd, pc = split_bsr_grid(bsr, 2, 4)
        fn = shard_map(
            partial(_local_grid2d_matvec, row_axis="r", col_axis="c", bn=bm),
            mesh=mesh,
            in_specs=((P(("r", "c")), P(("r", "c"))), P(("c", "r"))),
            out_specs=P(("r", "c")),
        )
        pd_s = sds(pd, P(("r", "c")))
        pc_s = sds(pc, P(("r", "c")))
        xg_s = sds(jnp.zeros((bsr.shape[0],), jnp.float32), P(("c", "r")))
        compiled = jax.jit(fn).lower((pd_s, pc_s), xg_s).compile()
        print(compiled.as_text())
        return 0
    elif mode == "sym_halo_matmat":
        from eigenex_tpu.sparse.sym_bsr import sym_bsr_from_bsr

        sym = sym_bsr_from_bsr(bsr)
        dg, inp, rt = split_sym_bsr_halo(sym, 8)
        fn = shard_map(
            partial(sym_halo_matmat, axis_name="rows", bn=bm),
            mesh=mesh,
            in_specs=(P("rows"),) * 5 + (P("rows", None),),
            out_specs=P("rows", None),
        )
        args = [sds(a) for a in (dg, inp[0], inp[1], rt[0], rt[1])] + [X_s]
    else:
        from eigenex_tpu.sparse.sym_bsr import sym_bsr_from_bsr

        sym = sym_bsr_from_bsr(bsr)
        dg, inp, rt = split_sym_bsr_halo(sym, 8)
        fn = shard_map(
            partial(sym_halo_matvec, axis_name="rows", bn=bm),
            mesh=mesh,
            in_specs=(P("rows"),) * 6,
            out_specs=P("rows"),
        )
        args = [sds(a) for a in (dg, inp[0], inp[1], rt[0], rt[1])] + [x_s]

    compiled = jax.jit(fn).lower(*args).compile()
    print(compiled.as_text())
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "halo"))
