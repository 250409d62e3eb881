#!/usr/bin/env python
"""Attribution probe for the parted low-degree regime (VERDICT round-3
Weak #1: suite graphs at 0.18-0.43 of the serial machine model).

Hypothesis under test: the unmodeled cost is FIXED PER-TILE overhead —
each sub-tile in the unrolled group loop issues 2 small matmuls plus a
dynamic-slice/update pair, and at the exact chooser's small edge tiles
(C=256/512) the weak graphs run 15-30k sub-tiles, so a ~1-2 us fixed
cost per sub-tile would exactly produce the observed 3.5-4x gap.

Method: sweep (row_block, edge_tile) on the PRODUCTION parted path for a
suite shape; regress measured time against the corrected serial model
(per-part slots) + n_tiles * t_tile. If t_tile comes out stable across
configs, the model is validated and the tile chooser should charge it.

Run from /root/repo, one TPU process at a time:
  python tools/probe_lowfill.py --graph s24_dd
  python tools/probe_lowfill.py --graph s24_amazon0505 --configs auto,128x1024
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def part_model(csr, row_block, edge_tile, col_part_rows=131072):
    """Corrected serial model: per-part slots/tiles at the ACTUAL per-part
    (R, C) (the recorded suite rooflines used part 0's sizes for every
    part, which misstates slots for heterogeneous parts)."""
    from maxk_tpu.ops.tiling import (split_csr_columns, choose_tile_sizes,
                                     choose_tile_sizes_exact, gather_group,
                                     low_fill_part)
    from maxk_tpu.bench.roofline import V5E

    n = csr.n_nodes
    parts = []
    gather_ms = stream_ms = mxu_ms = 0.0
    tot_tiles = tot_slots = n_steps = 0
    for ip, ix, _ in split_csr_columns(csr.indptr, csr.indices,
                                       csr.values, col_part_rows):
        e_p = len(ix)
        rb, et = row_block, edge_tile
        if rb is None or et is None:
            # Mirror ops.graph.build_tiled_graph: fill-gated chooser
            # (exact model for low-fill parts, measured heuristic
            # otherwise).
            if low_fill_part(n, e_p):
                rb, et = choose_tile_sizes_exact(ip)
            else:
                rb, et = choose_tile_sizes(n, max(1, e_p))
        bounds = ip[np.minimum(np.arange(0, n + rb, rb), n)]
        tiles = int(np.sum(-(-np.diff(bounds) // et)))
        grp = gather_group(et)
        tiles = -(-max(1, tiles) // grp) * grp
        slots = tiles * et
        gather_ms += slots * 128 / V5E["gather_elem_per_s"] * 1e3
        stream_ms += (slots * 12 + n * 256 * 6 + tiles * rb * 256 * 8) \
            / (V5E["hbm_gbps"] * 1e9) * 1e3
        mxu_ms += 2 * tiles * (rb + 1) * et * 256 \
            / (V5E["mxu_tflops"] * 1e12) * 1e3
        tot_tiles += tiles
        tot_slots += slots
        n_steps += tiles // grp
        parts.append((rb, et, tiles, slots))
    return dict(parts=parts, n_tiles=tot_tiles, n_slots=tot_slots,
                n_steps=n_steps, gather_ms=round(gather_ms, 2),
                stream_ms=round(stream_ms, 2), mxu_ms=round(mxu_ms, 2),
                serial_ms=round(gather_ms + stream_ms + mxu_ms, 2))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--graph", default="s24_dd")
    ap.add_argument("--dim", type=int, default=256, choices=[256],
                    help="fixed at 256: part_model's gather/stream/mxu "
                         "constants are calibrated for dim 256 lanes")
    ap.add_argument("--configs", default="auto,128x512,128x1024,128x2048,"
                                         "256x1024,256x2048,512x2048,"
                                         "512x4096,256x4096")
    args = ap.parse_args()

    import os
    import jax
    from maxk_tpu.platform import honor_env_platforms
    honor_env_platforms()
    import jax.numpy as jnp
    from maxk_tpu.bench.harness import synthetic_by_name
    from maxk_tpu.ops.graph import build_tiled_graph
    from maxk_tpu.ops.spmm import spmm
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

    x = jnp.asarray(x_np)
    for cfg in args.configs.split(","):
        if cfg == "auto":
            rb = et = None
        else:
            rb, et = (int(t) for t in cfg.split("x"))
        model = part_model(csr, rb, et)
        g = build_tiled_graph(csr, row_block=rb, edge_tile=et)
        try:
            t = time_fn(lambda: spmm(g, x), warmup=4, runs=4)
            ms = t.mean_ms
            # implied fixed per-tile overhead if the residual is all tiles
            resid = ms - model["serial_ms"]
            row = dict(config=cfg, ms=round(ms, 2),
                       ns_per_edge=round(ms * 1e6 / nnz, 2),
                       serial_ms=model["serial_ms"],
                       eff=round(model["serial_ms"] / ms, 2),
                       n_tiles=model["n_tiles"], n_steps=model["n_steps"],
                       resid_ms=round(resid, 2),
                       us_per_tile=round(resid * 1e3 / model["n_tiles"], 2),
                       us_per_step=round(resid * 1e3 / model["n_steps"], 1),
                       parts=model["parts"])
        except Exception as e:  # noqa: BLE001 — sweep must continue
            row = dict(config=cfg, error=str(e)[:200])
        print(json.dumps(row), flush=True)
        del g


if __name__ == "__main__":
    main()
