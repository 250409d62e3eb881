#!/usr/bin/env python
"""Multi-chip scaling benchmark for the row-partitioned trainer.

On real multi-chip hardware this measures true scaling efficiency
(1 chip / 1 host / N hosts — the BASELINE.md north-star metric). Without
it, --force-cpu runs the identical shard_map program on N virtual CPU
devices: the collectives, sharding layout, and numerics are exercised
end-to-end (wall-clock then reflects host emulation, not ICI).

Also reports the CBSR halo-traffic model: bytes all-gathered per
aggregation with dense rows vs CBSR-compressed rows — the distributed
payoff of MaxK (SURVEY.md section 2.4).

Usage:
  python scaling_bench.py --devices 1 2 4 8 --force-cpu
  python scaling_bench.py                      # all local devices

CPU-emulation limit: XLA's CPU collective rendezvous hard-aborts when
any participant is >40 s late; emulated full-graph steps cross that at
roughly --n-nodes 4096 (the default, sized for real devices) on this
host. For CPU smoke runs pass --n-nodes 1024; real scaling numbers need
TPU devices anyway (tests/test_parallel.py covers CPU-mesh correctness).
"""

import argparse
import dataclasses
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=None,
                    help="mesh sizes to sweep (default: 1..all local)")
    ap.add_argument("--force-cpu", action="store_true",
                    help="run on virtual CPU devices (functional check)")
    ap.add_argument("--n-nodes", type=int, default=4096)
    ap.add_argument("--avg-degree", type=float, default=16.0)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--layers", type=int, default=3)
    ap.add_argument("--maxk", type=int, default=32)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--model", default="sage_fused",
                    help="sage_fused exercises the CBSR halo path")
    ap.add_argument("--json", default=None)
    ap.add_argument("--project", action="store_true",
                    help="emit the first-order ICI scaling projection per "
                         "mesh size (bench.roofline.project_multichip): "
                         "measured per-slot cost + planned halo payload + "
                         "public v5e ICI bandwidth")
    ap.add_argument("--ici-gbps", type=float, default=None,
                    help="override the per-chip aggregate ICI GB/s "
                         "(default: v5e spec, 200)")
    ap.add_argument("--model-parallel", type=int, default=1,
                    help="tensor-parallel size (second mesh axis); every "
                         "swept device count must be divisible by it")
    args = ap.parse_args()

    if args.force_cpu:
        want = max(args.devices) if args.devices else 8
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={want}"
            ).strip()

    import jax
    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from maxk_tpu.data.datasets import make_synthetic_dataset
    from maxk_tpu.models.models import GraphBundle
    from maxk_tpu.parallel.mesh import make_graph_mesh
    from maxk_tpu.parallel.dist_train import DistTrainer
    from maxk_tpu.ops.cbsr import cbsr_nbytes

    n_local = len(jax.devices())
    sizes = args.devices or [n for n in (1, 2, 4, 8, 16, 32) if n <= n_local]
    sizes = [n for n in sizes if n <= n_local]
    print(f"# backend={jax.default_backend()} local_devices={n_local} "
          f"sweep={sizes}", file=sys.stderr)

    ds = make_synthetic_dataset(n_nodes=args.n_nodes,
                                avg_degree=args.avg_degree,
                                n_classes=16, in_size=128, seed=0)

    @dataclasses.dataclass
    class Cfg:
        model: str
        hidden_dim: int
        hidden_layers: int
        maxk: int
        dropout: float = 0.1
        norm: bool = True
        nonlinear: str = "maxk"
        epochs: int = 1
        w_lr: float = 0.01
        w_weight_decay: float = 0.0
        enable_lookahead: bool = False
        seed: int = 97
        eval_every: int = 1
        n_devices: int = 0
        # bf16 matmuls are software-emulated on the CPU backend (~100x);
        # the functional check must run f32 there.
        compute_dtype: str = "float32" if args.force_cpu else "bfloat16"

    cbsr_b, dense_b = cbsr_nbytes(ds.csr.n_nodes, args.maxk, args.hidden)
    print(f"# halo model per aggregation: dense all-gather "
          f"{dense_b/1e6:.1f} MB vs CBSR {cbsr_b/1e6:.1f} MB "
          f"({dense_b/cbsr_b:.1f}x reduction)", file=sys.stderr)

    graphs_single = GraphBundle.from_csr(ds.csr)
    feats_single = jnp.asarray(ds.features)

    from maxk_tpu.bench.roofline import sharded_gather_slots as _gather_slots

    rows = []
    base_ms = None
    slots_single = None
    for n in sizes:
        cfg = Cfg(model=args.model, hidden_dim=args.hidden,
                  hidden_layers=args.layers, maxk=args.maxk, n_devices=n)
        mesh = make_graph_mesh(n, model_axis_size=args.model_parallel)
        tr = DistTrainer(cfg, ds, mesh=mesh)
        # Neighbor-selective halo: actual exchange payload vs the old
        # full-node-space all-gather. halo_rows tracks the edge cut (max
        # remote rows any pair needs), NOT V — the scaling payoff.
        # With --model-parallel M the graph axis has only n // M shards;
        # all halo/projection math is per graph shard, not per device.
        g = tr.n_shards
        st = tr.sharded._any
        slots = _gather_slots(st)
        slots_single = slots_single or slots * g   # exact when sweep has g=1
        if args.project:
            from maxk_tpu.bench.roofline import (project_multichip,
                                                 V5E_ICI_GBPS)
            proj = project_multichip(
                n_shards=g, slots_per_shard=slots,
                slots_single=slots_single,
                halo_rows=st.halo_rows if st.send_idx is not None else 0,
                dim=args.hidden, k=args.maxk,
                n_aggregations=2 * args.layers,
                ici_gbps=args.ici_gbps or V5E_ICI_GBPS)
            print(json.dumps(dict(projection=proj)))
        if st.send_idx is not None:
            halo_dense = g * g * st.halo_rows * args.hidden * 4
            halo_cbsr = g * g * st.halo_rows * 3 * args.maxk
            ag_dense = g * st.n_nodes_padded * args.hidden * 4
            print(json.dumps(dict(
                devices=n, halo_rows=st.halo_rows,
                rows_per_shard=st.rows_per_shard,
                halo_exchange_dense_mb=round(halo_dense / 1e6, 3),
                halo_exchange_cbsr_mb=round(halo_cbsr / 1e6, 3),
                old_allgather_mb=round(ag_dense / 1e6, 3))))
        state = tr.init_state_concrete(graphs_single, feats_single)
        rng = jax.random.PRNGKey(0)
        state, loss = tr.train_step(state, rng)   # compile + step 1
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for i in range(args.steps):
            rng, sr = jax.random.split(rng)
            state, loss = tr.train_step(state, sr)
        jax.block_until_ready(loss)
        ms = (time.perf_counter() - t0) / args.steps * 1e3
        base_ms = base_ms or ms
        rows.append(dict(devices=n, step_ms=round(ms, 3),
                         loss=float(loss),
                         speedup=round(base_ms / ms, 3),
                         efficiency=round(base_ms / ms / (n / sizes[0]), 3)))
        print(json.dumps(rows[-1]))

    out = dict(backend=jax.default_backend(),
               model=args.model, n_nodes=ds.csr.n_nodes,
               n_edges=ds.csr.n_edges, hidden=args.hidden,
               maxk=args.maxk, halo_dense_mb=dense_b / 1e6,
               halo_cbsr_mb=cbsr_b / 1e6, sweep=rows)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=2)
        print(f"# wrote {args.json}", file=sys.stderr)


if __name__ == "__main__":
    main()
