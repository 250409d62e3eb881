#!/usr/bin/env python
"""Surgical phase attribution for the parted low-degree SpMM gap.

probe_lowfill round 4 established: the weak-graph residual over the
serial model (~45 ms at s24_dd) is NOT per-tile-count overhead (residual
roughly constant while tiles vary 6x), NOT gather width (split64 and
int8 both measure SLOWER). This probe ablates one phase at a time inside
the production scan — numerically wrong outputs, structurally identical
programs — to attribute the time directly:

  prod        full production scan
  seq_gather  tcols -> arange (sequential rows, no random access):
              isolates the random-access part of the gather
  zero_gather tcols -> zeros (all rows hit row 0, cache-resident):
              descriptor issue cost only
  no_matmul   skip one-hot build+matmul; reduce gathered halves by
              slicing: isolates MXU + P-build cost
  no_rmw      accumulate tiles into a single (R, D) carry instead of
              DS/DUS on the (V, D) output: isolates output RMW
  no_unpack   feed the raw packed int32 chunk to the matmul as bf16
              (garbage values): isolates the unpack shift/bitcast cost

Run from /root/repo, one TPU process at a time:
  python tools/probe_attrib.py --graph s24_dd
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--graph", default="s24_dd")
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--variants",
                    default="prod,seq_gather,zero_gather,no_matmul,"
                            "no_rmw,no_unpack")
    args = ap.parse_args()

    import os
    import jax
    from maxk_tpu.platform import honor_env_platforms
    honor_env_platforms()
    import jax.numpy as jnp
    import importlib
    spmm_mod = importlib.import_module("maxk_tpu.ops.spmm")
    from maxk_tpu.bench.harness import synthetic_by_name
    from maxk_tpu.ops.graph import build_tiled_graph
    from maxk_tpu.bench.timing import time_fn

    print(f"# backend={jax.default_backend()}", file=sys.stderr)
    csr = synthetic_by_name(args.graph)
    if csr is None:
        sys.exit(f"unknown graph {args.graph}")
    rng = np.random.default_rng(123)
    csr = csr.with_values(rng.uniform(0, 1, csr.n_edges).astype(np.float32))
    x_np = rng.uniform(0, 1, (csr.n_nodes, args.dim)).astype(np.float32)
    nnz = csr.n_edges
    print(f"# {args.graph}: V={csr.n_nodes} E={nnz} "
          f"deg={nnz/csr.n_nodes:.1f}", file=sys.stderr)

    g = build_tiled_graph(csr)
    x = jnp.asarray(x_np)
    prod_scan = spmm_mod._scan_tiles
    prod_reduce = spmm_mod._tile_reduce

    def make_scan(variant):
        def scan(cols, vals, lrow, block, tables, out, compute_dtype,
                 row_block, group, operands_fn, scale=None):
            t_tiles, c = cols.shape
            d = out.shape[1]
            if variant == "seq_gather":
                # Same tile/slot structure, sequential row ids.
                cols = jnp.broadcast_to(
                    jnp.arange(c, dtype=cols.dtype)[None, :] %
                    jnp.int32(tables[0].shape[0]), cols.shape)
            elif variant == "zero_gather":
                cols = jnp.zeros_like(cols)
            gcols = cols.reshape(t_tiles // group, group * c)
            gvals = vals.reshape(t_tiles // group, group, c)
            glrow = lrow.reshape(t_tiles // group, group, c)
            gblock = block.reshape(t_tiles // group, group)
            acc0 = jnp.zeros((row_block, d), jnp.float32)

            def step(carry, tile):
                out, acc = carry
                tcols, tvals, tlrow, tblk = tile
                xgs = [jnp.take(t, tcols, axis=0, mode="clip")
                       .reshape(group, c, -1) for t in tables]
                for j in range(group):
                    if variant == "no_unpack":
                        xj = tuple(x[j].astype(jnp.bfloat16)
                                   .astype(jnp.float32) for x in xgs)
                    else:
                        xj = operands_fn([x[j] for x in xgs])
                    if variant == "no_matmul":
                        h = xj[0] if isinstance(xj, tuple) else xj
                        t = jnp.broadcast_to(
                            h[:row_block, :1], (row_block, d)) \
                            .astype(jnp.float32)
                    else:
                        t = prod_reduce(xj, tvals[j], tlrow[j], row_block,
                                        compute_dtype)
                    if scale is not None:
                        t = t * scale[None, :]
                    if variant == "no_rmw":
                        acc = acc + t
                    else:
                        off = tblk[j] * row_block
                        cur = jax.lax.dynamic_slice(out, (off, 0),
                                                    (row_block, d))
                        out = jax.lax.dynamic_update_slice(
                            out, cur + t, (off, 0))
                return (out, acc), None

            (out, acc), _ = jax.lax.scan(
                step, (out, acc0), (gcols, gvals, glrow, gblock))
            if variant == "no_rmw":
                out = jax.lax.dynamic_update_slice(out, acc, (0, 0))
            return out
        return scan

    for variant in args.variants.split(","):
        spmm_mod._scan_tiles = (prod_scan if variant == "prod"
                                else make_scan(variant))
        jax.clear_caches()
        try:
            t = time_fn(lambda: spmm_mod.spmm(g, x), warmup=4, runs=4)
            print(json.dumps(dict(
                variant=variant, ms=round(t.mean_ms, 2),
                ns_per_edge=round(t.mean_ms * 1e6 / nnz, 2))), flush=True)
        except Exception as e:  # noqa: BLE001 — sweep must continue
            print(json.dumps(dict(variant=variant, error=str(e)[:300])),
                  flush=True)
    spmm_mod._scan_tiles = prod_scan


if __name__ == "__main__":
    main()
