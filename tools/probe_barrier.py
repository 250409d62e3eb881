#!/usr/bin/env python
"""Disambiguate the in-kernel gather regimes at a FIXED 131072-row table.

Round-2 observations to reconcile (BASELINE.md):
  - unparted V=131k, deg 100: 2.8 ns/slot (XLA fuses the take into the
    unpack+one-hot dot);
  - column parts (barrier-materialized 131072-row slices): ~6-9 ns/slot
    — consistent with the ISOLATED 128-lane rate (~117 M rows/s), i.e.
    the optimization_barrier seems to break the gather-into-dot fusion;
  - split 2x64-lane at V=131k: 16.7 ns/slot — matches NEITHER the
    isolated 64-lane floor (2x1.75) nor two 128-lane-rate gathers.

Variants (each at degree 20 and 100 to separate fill effects):
  plain      — production path (fusion baseline)
  barrier    — table passed through optimization_barrier (simulates the
               parted slice without any parting machinery)
  split64    — 2x64-lane split gathers (MAXK_GATHER_MAX_LANES=64)
  barrier+split64
  int8       — 64-lane int8-quad table (quantized mode)

Run from /root/repo, one TPU process at a time.
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
    ap.add_argument("--v", type=int, default=131072)
    ap.add_argument("--degrees", default="10,50")
    ap.add_argument("--dim", type=int, default=256)
    args = ap.parse_args()

    import os
    import jax
    # The axon sitecustomize overwrites JAX_PLATFORMS at import time;
    # honor an explicit env choice (CPU smoke runs) like train.py.
    from maxk_tpu.platform import honor_env_platforms
    honor_env_platforms()
    import jax.numpy as jnp
    from maxk_tpu.data.loaders import synthetic_graph
    from maxk_tpu.ops.graph import build_tiled_graph
    import importlib
    spmm_mod = importlib.import_module("maxk_tpu.ops.spmm")
    from maxk_tpu.bench.timing import time_fn

    print(f"# backend={jax.default_backend()}", file=sys.stderr)

    orig_split = spmm_mod._split_tables

    def barrier_split(xp):
        return tuple(jax.lax.optimization_barrier(t) for t in orig_split(xp))

    # (name, barrier, lanes, compute_dtype)
    variants = [
        ("plain", False, 128, None),
        ("barrier", True, 128, None),
        ("split64", False, 64, None),
        ("barrier_split64", True, 64, None),
        ("int8", False, 128, "int8"),
        ("barrier_int8", True, 128, "int8"),
    ]

    for deg in [float(s) for s in args.degrees.split(",")]:
        csr = synthetic_graph(args.v, deg, seed=123)
        rng = np.random.default_rng(123)
        csr = csr.with_values(
            rng.uniform(0, 1, csr.n_edges).astype(np.float32))
        g = build_tiled_graph(csr, col_part_rows=0)
        x_np = rng.uniform(0, 1, (csr.n_nodes, args.dim)).astype(np.float32)
        nnz = csr.n_edges
        slots = g.cols.size
        print(f"# deg={deg} V={csr.n_nodes} E={nnz} R={g.row_block} "
              f"C={g.edge_tile} pad={1 - nnz / slots:.2f}", file=sys.stderr)
        for name, barrier, lanes, cd in variants:
            spmm_mod._GATHER_MAX_LANES = lanes
            spmm_mod._split_tables = barrier_split if barrier else orig_split
            jax.clear_caches()
            x = jnp.asarray(x_np)
            fn = jax.jit(
                lambda gg, xx: spmm_mod.spmm(gg, xx, compute_dtype=cd))
            try:
                t = time_fn(lambda: fn(g, x), warmup=4, runs=4)
                print(json.dumps(dict(
                    kernel=name, deg=deg, ms=round(t.mean_ms, 3),
                    ns_per_edge=round(t.mean_ms * 1e6 / nnz, 3),
                    ns_per_slot=round(t.mean_ms * 1e6 / slots, 3))),
                    flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps(dict(kernel=name, deg=deg,
                                      error=str(e)[:200])), flush=True)
        spmm_mod._GATHER_MAX_LANES = 128
        spmm_mod._split_tables = orig_split


if __name__ == "__main__":
    main()
