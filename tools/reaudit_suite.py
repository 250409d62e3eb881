#!/usr/bin/env python
"""Recompute the roofline audits of a BENCH_SUITE24.json record in place.

The measured times are untouched — this re-derives each graph's tile
layouts on host (deterministic: same seed-123 generator and the same
fill-gated chooser as ops.graph.build_tiled_graph) and re-runs
bench.roofline.audit_spmm_layouts with the CURRENT model. Use after an
audit-model fix so recorded efficiencies reflect the corrected model
without re-measuring hours of TPU time.

Usage: python tools/reaudit_suite.py BENCH_SUITE24.json
"""

import dataclasses
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def host_layouts(csr):
    """Replicate build_tiled_graph's layout decisions host-side: column
    parting above the fast-gather footprint, fill-gated per-part chooser,
    tile counts rounded to gather-group multiples (ops.tiling)."""
    from maxk_tpu.ops.graph import COL_PART_ROWS, _PART_THRESHOLD
    from maxk_tpu.ops.tiling import (split_csr_columns, choose_tile_sizes,
                                     choose_tile_sizes_exact, gather_group,
                                     low_fill_part)
    n = csr.n_nodes

    def tiles_for(indptr, rb, et):
        bounds = np.asarray(indptr)[np.minimum(np.arange(0, n + rb, rb), n)]
        t = int(np.sum(-(-np.diff(bounds) // et)))
        grp = gather_group(et)
        return -(-max(1, t) // grp) * grp

    if n <= _PART_THRESHOLD:
        rb, et = choose_tile_sizes(n, csr.n_edges)
        return [(rb, et, tiles_for(csr.indptr, rb, et), csr.n_edges)], False
    layouts = []
    for ip, ix, _ in split_csr_columns(csr.indptr, csr.indices,
                                       csr.values, COL_PART_ROWS):
        e_p = len(ix)
        if low_fill_part(n, e_p):
            rb, et = choose_tile_sizes_exact(ip)
        else:
            rb, et = choose_tile_sizes(n, max(1, e_p))
        layouts.append((rb, et, tiles_for(ip, rb, et), e_p))
    return layouts, True


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_SUITE24.json"
    from maxk_tpu.bench.harness import synthetic_by_name
    from maxk_tpu.bench.roofline import audit_spmm_layouts

    with open(path) as f:
        d = json.load(f)
    for r in d["results"]:
        name = r["graph"]
        gen = "power"
        if "@" in name:
            name, gen = name.rsplit("@", 1)
        csr = synthetic_by_name(name, generator=gen)
        if csr is None:
            print(f"# {r['graph']}: not a synthetic suite graph, skipped",
                  file=sys.stderr)
            continue
        rng = np.random.default_rng(123)
        csr = csr.with_values(
            rng.uniform(0, 1, csr.n_edges).astype(np.float32))
        layouts, parted = host_layouts(csr)
        audit = audit_spmm_layouts(csr.n_nodes, csr.n_edges, r["dim"],
                                   r["baseline_ms"], layouts, parted=parted)
        old = (r.get("roofline") or {}).get("efficiency")
        r["roofline"] = dataclasses.asdict(audit)
        print(f"{r['graph']}: eff {old if old is None else round(old, 2)}"
              f" -> {audit.efficiency:.2f} ({audit.summary()})")
    with open(path, "w") as f:
        json.dump(d, f, indent=2)
    print(f"# rewrote {path}")


if __name__ == "__main__":
    main()
