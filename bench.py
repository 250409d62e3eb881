#!/usr/bin/env python
"""Headline benchmark: MaxK fused SpGEMM vs the production dense tiled
SpMM baseline, on one chip.

vs_baseline answers the honest question "is MaxK aggregation faster than
not using MaxK at all" — the same comparison the paper's cuSPARSE column
makes (round-1 reported vs the weak unfused scatter-add path instead;
that number is still logged to stderr for continuity).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Graph: reddit from --graphs dir when the binary CSR suite is on disk
(reference wire format, kernels/graphs/), otherwise a seeded synthetic
power-law graph with reddit-like average degree. Protocol: dim=256, k=32
(reference kernels/main.cu:52-54), 4 warmup + 4 timed runs per kernel
(reference kernels/spmm_base.h:58-74), 10+10 for the baseline
(spmm_cusparse.cu:35-51).
"""

import argparse
import json
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--graphs", default="./graphs",
                    help="dir with <name>.indptr/.indices binaries")
    ap.add_argument("--graph", default="reddit.dgl")
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--n-nodes", type=int, default=131072,
                    help="synthetic fallback size")
    ap.add_argument("--avg-degree", type=float, default=50.0)
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    import os
    import numpy as np
    import jax
    # The axon sitecustomize overwrites JAX_PLATFORMS at import time;
    # honor an explicit env choice (e.g. cpu smoke runs) like train.py.
    from maxk_tpu.platform import honor_env_platforms
    honor_env_platforms()

    # Fail fast (not hang) when the remote TPU backend is unreachable:
    # backend init over a dead tunnel blocks for unbounded time, which
    # would stall any driver running this CLI. Probe it on a side thread
    # with a hard cap.
    import threading
    _dev = {}

    def _probe():
        try:
            _dev["d"] = jax.devices()
        except Exception as e:           # backend init error
            _dev["err"] = e

    _t = threading.Thread(target=_probe, daemon=True)
    _t.start()
    _t.join(float(os.environ.get("MAXK_BACKEND_TIMEOUT_S", "600")))
    if "d" not in _dev:
        print(f"bench.py: JAX backend unavailable "
              f"({_dev.get('err', 'init timed out')}); aborting",
              file=sys.stderr)
        os._exit(3)
    import jax.numpy as jnp

    from maxk_tpu.data.loaders import load_csr_binary, available_graphs, \
        synthetic_graph
    from maxk_tpu.ops.graph import build_tiled_graph
    from maxk_tpu.ops.spmm import spmm, spmm_segment
    from maxk_tpu.ops.spgemm import maxk_spgemm
    from maxk_tpu.bench.timing import time_fn

    def log(*a):
        if args.verbose:
            print(*a, file=sys.stderr)

    names = available_graphs(args.graphs)
    if args.graph in names or args.graph.rstrip(".dgl") in names:
        name = args.graph if args.graph in names else args.graph.rstrip(".dgl")
        csr = load_csr_binary(args.graphs, name)
        log(f"loaded {name}: V={csr.n_nodes} E={csr.n_edges}")
    else:
        csr = synthetic_graph(args.n_nodes, args.avg_degree, seed=123)
        log(f"synthetic graph: V={csr.n_nodes} E={csr.n_edges}")

    rng = np.random.default_rng(123)  # reference seeds features with 123
    vals = rng.uniform(0, 1, csr.n_edges).astype(np.float32)
    csr = csr.with_values(vals)
    x = jnp.asarray(rng.uniform(0, 1, (csr.n_nodes, args.dim))
                    .astype(np.float32))

    g = build_tiled_graph(csr)
    gt = build_tiled_graph(csr.transpose())
    if hasattr(g, "n_tiles"):
        log(f"tiles: T={g.n_tiles} R={g.row_block} C={g.edge_tile} "
            f"pad={(g.n_tiles*g.edge_tile - csr.n_edges)/(g.n_tiles*g.edge_tile):.2%}")
    else:
        log(f"column-parted graph: {g.n_parts} parts of "
            f"{g.col_part_rows} rows")

    nnz = csr.n_edges

    # Graphs are jit ARGUMENTS (closure capture would bake them into the
    # executable as constants, re-shipped per call on remote TPUs).
    # Production dense tiled SpMM: THE baseline (10+10 protocol, the role
    # cuSPARSE plays in the reference benchmark).
    tiled_fn = jax.jit(spmm)
    t_tiled = time_fn(lambda: tiled_fn(g, x), warmup=10, runs=10)
    log(f"baseline tiled spmm: {t_tiled.mean_ms:.2f} ms "
        f"({t_tiled.nnz_per_s(nnz)/1e9:.2f} Gnnz/s)")

    # Unfused scatter-add oracle (round-1's flattering denominator, kept
    # for continuity in the logs only). spmm_segment only accepts the
    # unparted hub-free form — build one regardless of graph layout.
    g_seg = g if hasattr(g, "n_tiles") and g.hub_ids is None \
        else build_tiled_graph(csr, col_part_rows=0, hub_cols=0)
    base_fn = jax.jit(spmm_segment)
    t_seg = time_fn(lambda: base_fn(g_seg, x), warmup=4, runs=4)
    log(f"unfused spmm_segment: {t_seg.mean_ms:.2f} ms "
        f"({t_seg.nnz_per_s(nnz)/1e9:.2f} Gnnz/s)")

    # MaxK SpGEMM forward (the headline kernel). Reference protocol: the
    # CBSR operand is prepared beforehand and the TopK kernel is timed
    # separately (kernels/main.cu:120-146 builds the selector outside
    # do_test), so the headline times spgemm_forward_cbsr; the whole
    # fused op (TopK included) is logged alongside.
    from maxk_tpu.ops.cbsr import cbsr_topk
    from maxk_tpu.ops.spgemm import spgemm_forward_cbsr
    jit_topk = jax.jit(cbsr_topk, static_argnames=("k",))
    v, s = jax.block_until_ready(jit_topk(x, k=args.k))
    t_topk = time_fn(lambda: jit_topk(x, k=args.k), warmup=4, runs=4)
    log(f"topk->cbsr k={args.k}: {t_topk.mean_ms:.2f} ms")
    fwd_fn = jax.jit(lambda gg, vv, ss: spgemm_forward_cbsr(
        gg, vv, ss, args.dim))
    t_fused = time_fn(lambda: fwd_fn(g, v, s), warmup=4, runs=4)
    full_fn = jax.jit(lambda gg, ggt, xx: maxk_spgemm(gg, ggt, xx, args.k))
    t_full = time_fn(lambda: full_fn(g, gt, x), warmup=4, runs=4)
    log(f"maxk spgemm fwd k={args.k}: {t_fused.mean_ms:.2f} ms "
        f"({t_fused.nnz_per_s(nnz)/1e9:.2f} Gnnz/s); "
        f"full fused op incl. topk {t_full.mean_ms:.2f} ms; "
        f"vs unfused {t_seg.mean_ms / t_fused.mean_ms:.1f}x")

    # Training-step probe: the metric the paper actually sells (2-6x
    # training speedup, reference build_maxk_gnn.sh:206-207) — one full
    # SAGE fwd+bwd+Adam step on this graph, chained-differencing
    # protocol, k = --k. Unit edge values + structural symmetry: the
    # trainer re-normalizes per aggregation semantics anyway.
    from maxk_tpu.data.datasets import Dataset
    from maxk_tpu.train.loop import Trainer
    v = csr.n_nodes
    ds = Dataset(
        name="bench", csr=csr.with_values(np.ones(csr.n_edges, np.float32)),
        features=np.asarray(x), labels=rng.integers(0, 41, size=v),
        train_mask=rng.uniform(size=v) < 0.66,
        val_mask=rng.uniform(size=v) < 0.1,
        test_mask=rng.uniform(size=v) < 0.2,
        num_classes=41, multilabel=False, metric="micro_f1",
        symmetric=True)

    class _Cfg:
        model = "sage"
        hidden_dim = 256
        hidden_layers = 4
        maxk = args.k
        dropout = 0.5
        norm = True
        nonlinear = "maxk"
        w_lr = 0.01
        w_weight_decay = 0.0
        enable_lookahead = False
        seed = 97
        # CPU bf16 matmuls are software-emulated (~100x); smoke runs
        # must use f32 there. TPU runs keep the production dtype.
        compute_dtype = ("float32" if jax.default_backend() == "cpu"
                         else "bfloat16")

    tr = Trainer(_Cfg(), ds)
    state = tr.init_state()
    srng = jax.random.PRNGKey(0)
    state, loss = tr._jit_step(state, srng)      # compile
    np.asarray(loss)
    t_step = time_fn(lambda: tr._jit_step(state, srng)[1],
                     warmup=2, runs=3)
    log(f"SAGE 4x256 k={args.k} train step: {t_step.mean_ms:.1f} ms")

    print(json.dumps({
        "metric": f"maxk_spgemm_fwd_nnz_per_s_k{args.k}_d{args.dim}",
        "value": round(t_fused.nnz_per_s(nnz) / 1e9, 4),
        "unit": "Gnnz/s",
        "vs_baseline": round(t_tiled.mean_ms / t_fused.mean_ms, 4),
        "train_step_ms": round(t_step.mean_ms, 2),
    }))


if __name__ == "__main__":
    main()
