#!/usr/bin/env python
"""Products-scale training through the multi-chip path: HBM budget +
step projection (VERDICT r4 #6).

The single-chip record stops at the products-shape FORWARD
(BENCH_PRODUCTS_SHAPE.json: 1979 ms at k=32): graph + transpose + both
dense operands exceed one v5e's 16 GB HBM for the backward. The
multi-chip machinery (parallel.partition row sharding + halo exchange)
exists and is execution-validated on the 8-device CPU mesh at parted
shapes (tests/test_parallel.py::test_parted_dist_trainer_step); a
FULL-scale emulated step is impossible here (XLA's CPU collective
rendezvous aborts when any participant is >40 s late — crossed at
~4k nodes, see scaling_bench.py), so this probe produces the
HBM-budgeted record the verdict accepts in its place:

  - runs the REAL shard planner (shard_graph: halo send lists, column
    parting, local-first order) on the products shape (V=2.45M,
    E~125M) for each mesh size;
  - counts per-shard device bytes from the ACTUAL planned arrays
    (forward + transpose tile sets, send lists, node arrays) plus a
    stated first-order activation model for the SAGE recipe
    (reference scripts_train/ogbn_products_maxk.sh: 3x256 hidden);
  - checks the 16 GiB v5e bound per shard and emits the step-time
    projection (bench.roofline.project_multichip — measured per-slot
    rate + planned halo payload + public ICI bandwidth).

Run: JAX_PLATFORMS=cpu python tools/probe_products_scale.py \
        [--devices 2 4 8] [--json PRODUCTS_SCALE.json]
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

V5E_HBM_GIB = 16.0


def tiles_bytes(st) -> int:
    """Per-shard device bytes of one ShardedTiles / ShardedPartedTiles
    (leading axis = shard; cols/lrow int32 + vals f32 = 12 B/slot)."""
    if getattr(st, "parts_local", None) is not None:
        total = 0
        for arrs in list(st.parts_local) + list(st.parts_halo):
            cols, vals, lrow, block = arrs
            total += int(cols.shape[1] * cols.shape[2]) * 12 \
                + int(block.shape[1]) * 4
        return total
    t, c = int(st.cols.shape[1]), int(st.cols.shape[2])
    return t * c * 12 + t * 4


def send_idx_bytes(st) -> int:
    if st.send_idx is None:
        return 0
    # (S, S, H) int32: each shard holds its own (S, H) slice.
    return int(st.send_idx.shape[1] * st.send_idx.shape[2]) * 4


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-nodes", type=int, default=2449029)
    ap.add_argument("--avg-degree", type=float, default=25.5,
                    help="pre-symmetrization; 25.5 -> E~124.9M (the "
                         "products shape, kernel_bench SUITE24_SPECS)")
    ap.add_argument("--devices", type=int, nargs="+", default=[2, 4, 8])
    ap.add_argument("--in-size", type=int, default=100)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--classes", type=int, default=47)
    ap.add_argument("--layers", type=int, default=3)
    ap.add_argument("--maxk", type=int, default=32)
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

    print(f"# building V={args.n_nodes} deg={args.avg_degree} graph",
          file=sys.stderr)
    csr = synthetic_graph(args.n_nodes, args.avg_degree, seed=123) \
        .normalize("mean")
    csr_t = csr.transpose()

    # Single-chip slot count (for projection baselines).
    g1 = build_tiled_graph(csr)
    if getattr(g1, "parts", None) is not None:
        slots_single = sum(int(p.cols.shape[0] * p.cols.shape[1])
                           for p in g1.parts)
    else:
        slots_single = int(g1.cols.shape[0] * g1.cols.shape[1])
    del g1

    def activation_bytes(rows: int) -> dict:
        """First-order SAGE-fused training residuals per shard, f32:
        per layer the fused VJP saves the MaxK mask ((rows, hid) bf16)
        and the aggregation output; each Dense (fc_self, fc_neigh)
        saves its input; plus lin_in/lin_out boundaries and the live
        activation. ~6 hid-wide arrays per layer is the working
        estimate (validated against the reddit-shape single-chip
        footprint, BASELINE.md large-shapes note)."""
        per_layer = rows * args.hidden * (4 * 5 + 2)   # 5 f32 + 1 bf16 mask
        fixed = rows * (args.in_size + args.classes) * 4
        return per_layer * args.layers + fixed

    hbm = []
    for n in args.devices:
        st = shard_graph(csr, n)
        st_t = shard_graph(csr_t, n)
        rows = st.rows_per_shard
        graph_b = tiles_bytes(st) + tiles_bytes(st_t) \
            + send_idx_bytes(st) + send_idx_bytes(st_t)
        feat_b = rows * args.in_size * 4
        node_b = rows * 16            # labels i32 + 3 masks + slack
        act_b = activation_bytes(rows)
        halo_rows = st.halo_rows
        halo_b = (n - 1) * halo_rows * args.hidden * 4  # transient buffer
        params_b = 3 * 4 * (args.in_size * args.hidden
                            + 2 * args.layers * args.hidden * args.hidden
                            + args.hidden * args.classes)
        total = graph_b + feat_b + node_b + act_b + halo_b + params_b
        proj = project_multichip(
            n_shards=n, slots_per_shard=sharded_gather_slots(st),
            slots_single=slots_single, halo_rows=halo_rows,
            dim=args.hidden, k=args.maxk,
            n_aggregations=2 * args.layers, ici_gbps=V5E_ICI_GBPS)
        row = dict(
            n_shards=n, rows_per_shard=rows, halo_rows=halo_rows,
            parted=getattr(st, "parts_local", None) is not None,
            graph_gib=round(graph_b / 2**30, 3),
            features_gib=round(feat_b / 2**30, 3),
            activations_gib=round(act_b / 2**30, 3),
            halo_buffers_gib=round(halo_b / 2**30, 3),
            params_opt_gib=round(params_b / 2**30, 4),
            total_gib=round(total / 2**30, 3),
            fits_v5e=bool(total / 2**30 < V5E_HBM_GIB * 0.9),
            projection=proj)
        hbm.append(row)
        print(json.dumps(row))
        del st, st_t

    if args.json:
        with open(args.json, "w") as f:
            json.dump(dict(n_nodes=args.n_nodes,
                           avg_degree=args.avg_degree,
                           n_edges=csr.n_edges,
                           recipe=dict(model="sage_fused",
                                       layers=args.layers,
                                       hidden=args.hidden,
                                       in_size=args.in_size,
                                       classes=args.classes,
                                       maxk=args.maxk),
                           slots_single=slots_single,
                           hbm_gib_bound=V5E_HBM_GIB,
                           rows=hbm), f, indent=2)
        print(f"# wrote {args.json}", file=sys.stderr)


if __name__ == "__main__":
    main()
