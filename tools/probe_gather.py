#!/usr/bin/env python
"""Machine-model probe: random row-gather rate vs row width, index order,
and the tile-level CBSR expand cost.

Decides the viability of a CBSR-operand fused forward (gathering (V, ~3k/4)
packed lanes per edge instead of the expanded dense (V, D/2) rows — VERDICT
round-1 task 1): if narrow-row gathers are descriptor-floor-bound (~530 M
rows/s measured round 1 for <=256 B rows), shrinking rows below ~48 lanes
buys nothing and the expand cost decides; if they stay element-bound, the
CBSR gather is a direct win at small k.

Run from /root/repo (axon plugin discovery), one TPU process at a time.
Emits one JSON line per measurement and a summary blob at the end.
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
    ap.add_argument("--v", type=int, default=131072, help="table rows")
    ap.add_argument("--edges", type=int, default=13_107_200)
    ap.add_argument("--group", type=int, default=65536,
                    help="gather indices per scan step")
    ap.add_argument("--widths", default="2,4,6,8,12,16,24,32,48,64,96,128")
    ap.add_argument("--sorted-probe", action="store_true", default=True)
    ap.add_argument("--expand-probe", action="store_true", default=True)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from functools import partial
    from maxk_tpu.bench.timing import time_fn

    print(f"# backend={jax.default_backend()} devices={jax.devices()}",
          file=sys.stderr)

    rng = np.random.default_rng(123)
    e = args.edges - args.edges % args.group
    groups = e // args.group
    idx = rng.integers(0, args.v, size=(groups, args.group)).astype(np.int32)
    idx_sorted = np.sort(idx, axis=1)

    @partial(jax.jit, static_argnames=())
    def gather_sum(table, idxs):
        def step(acc, i):
            g = jnp.take(table, i, axis=0, mode="clip")
            return acc + g.sum(axis=0), None
        acc, _ = jax.lax.scan(
            step, jnp.zeros((table.shape[1],), jnp.int32), idxs)
        return acc

    results = {"gather": [], "gather_sorted": [], "expand": []}
    idx_j = jnp.asarray(idx)
    idx_s = jnp.asarray(idx_sorted)
    for w in [int(x) for x in args.widths.split(",")]:
        table = jnp.asarray(
            rng.integers(-100, 100, size=(args.v, w)).astype(np.int32))
        t = time_fn(lambda: gather_sum(table, idx_j), warmup=3, runs=3)
        rows_per_s = e / (t.mean_ms * 1e-3)
        lanes_per_s = rows_per_s * w
        rec = dict(kind="gather", width_lanes=w, bytes_per_row=4 * w,
                   table_mib=round(args.v * w * 4 / 2**20, 1),
                   ms=round(t.mean_ms, 3),
                   m_rows_per_s=round(rows_per_s / 1e6, 1),
                   g_lanes_per_s=round(lanes_per_s / 1e9, 2),
                   ns_per_row=round(1e9 / rows_per_s, 3))
        results["gather"].append(rec)
        print(json.dumps(rec))
        if args.sorted_probe:
            t2 = time_fn(lambda: gather_sum(table, idx_s), warmup=3, runs=3)
            rec2 = dict(kind="gather_sorted", width_lanes=w,
                        ms=round(t2.mean_ms, 3),
                        m_rows_per_s=round(e / (t2.mean_ms * 1e-3) / 1e6, 1),
                        vs_unsorted=round(t.mean_ms / t2.mean_ms, 3))
            results["gather_sorted"].append(rec2)
            print(json.dumps(rec2))

    if args.expand_probe:
        # Tile-level CBSR expand: (S, k) values + selectors -> (S, D) dense,
        # k-step compare-select-add chain (the cbsr_expand formulation),
        # feeding a sum so nothing is DCE'd. S = one scan step's edge slots.
        d = 256
        s_slots = args.group

        def expand_cost(vals, sels, nsteps):
            def step(acc, _):
                out = jnp.zeros((s_slots, d), jnp.float32)
                for l in range(vals.shape[1]):
                    out = out + jnp.where(
                        sels[:, l:l + 1] == jnp.arange(d, dtype=jnp.int32)[None, :],
                        vals[:, l:l + 1], 0.0)
                return acc + out.sum(axis=0), None
            acc, _ = jax.lax.scan(
                step, jnp.zeros((d,), jnp.float32), None, length=nsteps)
            return acc

        nsteps = groups
        for k in (8, 16, 32, 64):
            vals = jnp.asarray(rng.uniform(size=(s_slots, k))
                               .astype(np.float32))
            sels = jnp.asarray(np.sort(rng.integers(
                0, d, size=(s_slots, k)).astype(np.int32), axis=1))
            f = jax.jit(lambda v, s: expand_cost(v, s, nsteps))
            t = time_fn(lambda: f(vals, sels), warmup=2, runs=3)
            per_edge_ns = t.mean_ms * 1e6 / (nsteps * s_slots)
            rec = dict(kind="expand", k=k, d=d, ms=round(t.mean_ms, 3),
                       ns_per_edge=round(per_edge_ns, 3))
            results["expand"].append(rec)
            print(json.dumps(rec))

    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
