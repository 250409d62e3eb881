#!/usr/bin/env python
"""In-situ probe: manual software pipelining of the tiled SpMM scan.

The roofline's ideal-overlap floor is ~2x under the serial model because
each scan step's phases serialize: the big HBM gather must complete
before the sub-tile matmuls start, and nothing overlaps step i+1's
gather with step i's matmuls (unrolling alone didn't — the accumulator
DUS chain serializes the unrolled bodies, tools/probe_unroll.py).

This probe breaks the dependence *by hand*:

  B  shifted-scan pipeline: the scan carry holds the PREVIOUS step's
     gathered block; step i issues group i's gather (depends only on
     tile metadata) and reduces group i-1 from the carry. The gather
     and the matmul chain are data-independent inside one step body, so
     the TPU latency-hiding scheduler may overlap the DMA with compute.
     Risk: the gather's consumer moves to the next iteration, so it
     materializes to HBM instead of fusing into the matmul (the in-situ
     fusion is where the 2.7 ns/slot rate comes from).
  C  dual accumulators: even/odd sub-tiles accumulate into separate
     output buffers (one final add), breaking the within-step DUS chain
     so independent sub-tile matmuls can interleave.
  D  B + C combined.

Run from /root/repo, one TPU process at a time; CPU-smoke with
JAX_PLATFORMS=cpu and a tiny --v first.
"""

from __future__ import annotations

import argparse
import json
import sys
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--v", type=int, default=131072)
    ap.add_argument("--avg-degree", type=float, default=100.0)
    ap.add_argument("--dim", type=int, default=256)
    args = ap.parse_args()

    import os
    import jax
    from maxk_tpu.platform import honor_env_platforms
    honor_env_platforms()
    import jax.numpy as jnp
    from maxk_tpu.data.loaders import synthetic_graph
    from maxk_tpu.ops.graph import build_tiled_graph
    from maxk_tpu.ops.spmm import (_pack_x, _split_tables, _chunk_operands,
                                   _tile_reduce, _group_count, spmm)
    from maxk_tpu.bench.timing import time_fn

    print(f"# backend={jax.default_backend()}", file=sys.stderr)
    csr = synthetic_graph(args.v, args.avg_degree, seed=123)
    rng = np.random.default_rng(123)
    csr = csr.with_values(rng.uniform(0, 1, csr.n_edges).astype(np.float32))
    g = build_tiled_graph(csr)
    if not hasattr(g, "cols"):
        print("parted graph; probe targets the unparted scan", file=sys.stderr)
        return
    x = jnp.asarray(rng.uniform(0, 1, (csr.n_nodes, args.dim))
                    .astype(np.float32))
    nnz = csr.n_edges
    d = args.dim
    R = g.row_block
    group = _group_count(g.n_tiles, g.edge_tile)
    print(f"# V={csr.n_nodes} E={nnz} R={R} C={g.edge_tile} group={group} "
          f"n_tiles={g.n_tiles}", file=sys.stderr)

    @partial(jax.jit, static_argnames=("pipe", "dual"))
    def spmm_variant(cols, vals, lrow, block, x, pipe: bool, dual: bool):
        xp, scale, unpack, cd = _pack_x(x, "bfloat16")
        tables = _split_tables(xp)
        t_tiles, c = cols.shape
        gcols = cols.reshape(t_tiles // group, group * c)
        gvals = vals.reshape(t_tiles // group, group, c)
        glrow = lrow.reshape(t_tiles // group, group, c)
        gblock = block.reshape(t_tiles // group, group)
        n_pad = g.n_rows_padded

        def gather(tc):
            return tuple(jnp.take(t, tc, axis=0, mode="clip")
                         .reshape(group, c, -1) for t in tables)

        def reduce_into(out, xgs, tvals, tlrow, tblk, out2=None):
            outs = [out, out2] if out2 is not None else [out]
            for j in range(group):
                xj = _chunk_operands([xg[j] for xg in xgs], unpack, cd)
                t = _tile_reduce(xj, tvals[j], tlrow[j], R, cd)
                off = tblk[j] * R
                o = outs[j % len(outs)]
                cur = jax.lax.dynamic_slice(o, (off, 0), (R, d))
                outs[j % len(outs)] = jax.lax.dynamic_update_slice(
                    o, cur + t, (off, 0))
            return outs[0] if out2 is None else (outs[0], outs[1])

        out = jnp.zeros((n_pad, d), dtype=jnp.float32)
        out2 = jnp.zeros((n_pad, d), dtype=jnp.float32) if dual else None

        if not pipe:
            def step(carry, tile):
                tcols, tvals, tlrow, tblk = tile
                if dual:
                    o, o2 = reduce_into(carry[0], gather(tcols), tvals,
                                        tlrow, tblk, carry[1])
                    return (o, o2), None
                return reduce_into(carry, gather(tcols), tvals, tlrow,
                                   tblk), None
            init = (out, out2) if dual else out
            fin, _ = jax.lax.scan(step, init,
                                  (gcols, gvals, glrow, gblock))
            return (fin[0] + fin[1] if dual else fin)[:csr.n_nodes]

        # Shifted-scan pipeline: step i gathers group i+1, reduces group i
        # from the carried gather.
        xg0 = gather(gcols[0])

        def step(carry, tile):
            tcols_next, tvals, tlrow, tblk = tile
            if dual:
                o, o2, xg_prev = carry
            else:
                o, xg_prev = carry
            xg_next = gather(tcols_next)
            if dual:
                o, o2 = reduce_into(o, xg_prev, tvals, tlrow, tblk, o2)
                return (o, o2, xg_next), None
            o = reduce_into(o, xg_prev, tvals, tlrow, tblk)
            return (o, xg_next), None

        xs = (gcols[1:], gvals[:-1], glrow[:-1], gblock[:-1])
        init = (out, out2, xg0) if dual else (out, xg0)
        carry, _ = jax.lax.scan(step, init, xs)
        if dual:
            o, o2, xg_last = carry
            o, o2 = reduce_into(o, xg_last, gvals[-1], glrow[-1],
                                gblock[-1], o2)
            return (o + o2)[:csr.n_nodes]
        o, xg_last = carry
        o = reduce_into(o, xg_last, gvals[-1], glrow[-1], gblock[-1])
        return o[:csr.n_nodes]

    ref = np.asarray(spmm(g, x))
    results = {}
    variants = [("A_prod", None),
                ("B_pipe", (True, False)),
                ("C_dual", (False, True)),
                ("D_pipe_dual", (True, True))]
    for name, flags in variants:
        if flags is None:
            fn = lambda: spmm(g, x)
        else:
            pipe, dual = flags
            fn = lambda p=pipe, du=dual: spmm_variant(
                g.cols, g.vals, g.lrow, g.block, x, p, du)
        got = np.asarray(fn())
        err = float(np.max(np.abs(got - ref)) /
                    (np.max(np.abs(ref)) + 1e-12))
        t = time_fn(fn)
        results[name] = {"ms": t.mean_ms, "min_ms": t.min_ms,
                         "ns_per_edge": t.mean_ms * 1e6 / nnz,
                         "rel_err": err}
        print(f"{name}: {t.mean_ms:.3f} ms ({t.mean_ms*1e6/nnz:.2f} "
              f"ns/edge) rel_err={err:.2e}", file=sys.stderr)

    print(json.dumps({"V": csr.n_nodes, "E": nnz, "dim": d,
                      "results": results}))


if __name__ == "__main__":
    main()
