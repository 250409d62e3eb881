#!/usr/bin/env python
"""Multi-chip scaling projection at realistic shapes (no devices needed).

Only one physical TPU chip is reachable in this environment, so the
BASELINE.md north-star "scaling efficiency at 1 chip / 1 host / N hosts"
cannot be measured. This probe produces the defensible stand-in: it runs
the REAL shard planner (parallel.partition.shard_graph — per-peer halo
send lists, local-first tile reorder, column parting) on a
reddit/products-shaped graph for each mesh size, then feeds the planned
halo payload and padded gather slots into the first-order machine model
(bench.roofline.project_multichip: measured per-slot rate + public v5e
ICI bandwidth).

Run: JAX_PLATFORMS=cpu python tools/probe_scaling_projection.py \
        [--n-nodes 232965] [--avg-degree 492] [--devices 2 4 8 16]
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-nodes", type=int, default=232965)
    ap.add_argument("--avg-degree", type=float, default=246.0,
                    help="pre-symmetrization degree, train_bench.py "
                         "convention: 246 -> E=114.6M, the reddit shape")
    ap.add_argument("--devices", type=int, nargs="+", default=[2, 4, 8, 16])
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--maxk", type=int, default=32)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--ici-gbps", type=float, default=None)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import os
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from maxk_tpu.data.loaders import synthetic_graph
    from maxk_tpu.ops.graph import build_tiled_graph
    from maxk_tpu.parallel.partition import shard_graph
    from maxk_tpu.bench.roofline import (project_multichip,
                                         sharded_gather_slots,
                                         V5E_ICI_GBPS)

    print(f"# building V={args.n_nodes} avg_deg={args.avg_degree} graph",
          file=sys.stderr)
    csr = synthetic_graph(args.n_nodes, args.avg_degree, seed=123,
                          power_law=True).normalize("mean")

    # Single-chip slot count from the production single-device build
    # (PartedGraph when the table is large, same as the trainer uses).
    g1 = build_tiled_graph(csr)
    if getattr(g1, "parts", None) is not None:
        slots_single = sum(int(p.cols.shape[0] * p.cols.shape[1])
                           for p in g1.parts)
    else:
        slots_single = int(g1.cols.shape[0] * g1.cols.shape[1])
    print(f"# single-chip gather slots: {slots_single/1e6:.1f} M "
          f"(E={csr.n_edges/1e6:.1f} M real edges)", file=sys.stderr)

    rows = []
    for n in args.devices:
        st = shard_graph(csr, n)
        proj = project_multichip(
            n_shards=n,
            slots_per_shard=sharded_gather_slots(st),
            slots_single=slots_single,
            halo_rows=st.halo_rows,
            dim=args.hidden, k=args.maxk,
            n_aggregations=2 * args.layers,
            ici_gbps=args.ici_gbps or V5E_ICI_GBPS)
        proj["halo_rows"] = st.halo_rows
        proj["parted"] = getattr(st, "parts_local", None) is not None
        rows.append(proj)
        print(json.dumps(proj))
        del st

    if args.json:
        with open(args.json, "w") as f:
            json.dump(dict(n_nodes=args.n_nodes, avg_degree=args.avg_degree,
                           n_edges=csr.n_edges, hidden=args.hidden,
                           maxk=args.maxk, layers=args.layers,
                           slots_single=slots_single, rows=rows), f,
                      indent=2)
        print(f"# wrote {args.json}", file=sys.stderr)


if __name__ == "__main__":
    main()
