#!/usr/bin/env python
"""In-situ probe: lax.scan unroll factor on the tiled SpMM.

The roofline audit (maxk_tpu/bench/roofline.py) shows the scan's
gather/matmul/accumulate phases fully serialized, with the ideal-overlap
floor ~2x below the serial model. Each scan step's gather depends only on
the tile metadata (not the accumulator), so unrolling N steps into one
loop body lets XLA's scheduler hoist step i+1's gather over step i's
matmul chain — the software-pipelining the latency-hiding scheduler can't
do across scan iterations.

Sweeps MAXK_SCAN_UNROLL (ops.spmm._SCAN_UNROLL) in subprocess-free form
by patching the module constant before each jit (fresh jit cache per
setting). Run from /root/repo, one TPU process at a time; CPU-smoke with
JAX_PLATFORMS=cpu and a tiny --v first.
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
    ap.add_argument("--avg-degree", type=float, default=100.0)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--unrolls", default="1,2,4")
    ap.add_argument("--fused-k", type=int, default=0,
                    help="also probe the fused forward at this k (0 = off)")
    args = ap.parse_args()

    import os
    import importlib
    import jax
    from maxk_tpu.platform import honor_env_platforms
    honor_env_platforms()
    import jax.numpy as jnp
    from maxk_tpu.data.loaders import synthetic_graph
    from maxk_tpu.ops.graph import build_tiled_graph
    from maxk_tpu.bench.timing import time_fn
    spmm_mod = importlib.import_module("maxk_tpu.ops.spmm")

    print(f"# backend={jax.default_backend()}", file=sys.stderr)
    csr = synthetic_graph(args.v, args.avg_degree, seed=123)
    rng = np.random.default_rng(123)
    csr = csr.with_values(rng.uniform(0, 1, csr.n_edges).astype(np.float32))
    g = build_tiled_graph(csr)
    x = jnp.asarray(rng.uniform(0, 1, (csr.n_nodes, args.dim))
                    .astype(np.float32))
    nnz = csr.n_edges
    print(f"# V={csr.n_nodes} E={nnz}", file=sys.stderr)

    ref = None
    for u in [int(s) for s in args.unrolls.split(",")]:
        spmm_mod._SCAN_UNROLL = u
        jax.clear_caches()
        fn = jax.jit(spmm_mod.spmm)
        y = jax.block_until_ready(fn(g, x))
        if ref is None:
            ref = np.asarray(y)
        else:
            err = float(np.max(np.abs(np.asarray(y) - ref)))
            assert err < 1e-2, f"unroll={u} diverges: {err}"
        t = time_fn(lambda: fn(g, x), warmup=4, runs=4)
        print(json.dumps(dict(kernel="spmm_dense", unroll=u,
                              ms=round(t.mean_ms, 3),
                              ns_per_edge=round(t.mean_ms * 1e6 / nnz, 3))))
        if args.fused_k:
            from maxk_tpu.ops.cbsr import cbsr_topk
            from maxk_tpu.ops.spgemm import spgemm_forward_cbsr
            v, s = jax.block_until_ready(
                jax.jit(cbsr_topk, static_argnames=("k",))(x, k=args.fused_k))
            ffn = jax.jit(lambda gg, vv, ss: spgemm_forward_cbsr(
                gg, vv, ss, args.dim))
            jax.block_until_ready(ffn(g, v, s))
            t = time_fn(lambda: ffn(g, v, s), warmup=4, runs=4)
            print(json.dumps(dict(kernel=f"fused_k{args.fused_k}", unroll=u,
                                  ms=round(t.mean_ms, 3),
                                  ns_per_edge=round(
                                      t.mean_ms * 1e6 / nnz, 3))))
    spmm_mod._SCAN_UNROLL = 1


if __name__ == "__main__":
    main()
