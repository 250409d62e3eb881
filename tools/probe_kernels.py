#!/usr/bin/env python
"""In-situ kernel timing: dense tiled SpMM (split-gather) + CBSR-operand
fused forward across k, on one benchmark-scale graph.

Round-1 reference numbers on the same shape (V=131072, avg degree 100,
D=256; BASELINE.md): tiled SpMM 41.6 ms, fused MaxK forward k=32 ~49 ms.
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
    ap.add_argument("--avg-degree", type=float, default=100.0)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--ks", default="8,16,32,64")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from maxk_tpu.data.loaders import synthetic_graph
    from maxk_tpu.ops.graph import build_tiled_graph
    from maxk_tpu.ops.spmm import spmm
    from maxk_tpu.ops.cbsr import cbsr_topk
    from maxk_tpu.ops.spgemm import spgemm_forward_cbsr
    from maxk_tpu.bench.timing import time_fn

    print(f"# backend={jax.default_backend()}", file=sys.stderr)
    csr = synthetic_graph(args.v, args.avg_degree, seed=123)
    rng = np.random.default_rng(123)
    csr = csr.with_values(rng.uniform(0, 1, csr.n_edges).astype(np.float32))
    g = build_tiled_graph(csr)
    x = jnp.asarray(rng.uniform(0, 1, (csr.n_nodes, args.dim))
                    .astype(np.float32))
    nnz = csr.n_edges
    print(f"# V={csr.n_nodes} E={nnz} tiles={getattr(g, 'n_tiles', '?')}",
          file=sys.stderr)

    f_dense = jax.jit(spmm)
    t = time_fn(lambda: f_dense(g, x), warmup=4, runs=4)
    base_ms = t.mean_ms
    print(json.dumps(dict(kernel="spmm_dense", ms=round(t.mean_ms, 3),
                          gnnz_s=round(nnz / t.mean_ms / 1e6, 4),
                          ns_per_edge=round(t.mean_ms * 1e6 / nnz, 3))))

    jit_topk = jax.jit(cbsr_topk, static_argnames=("k",))
    variants = {
        "fused_bf16": jax.jit(lambda g, v, s: spgemm_forward_cbsr(
            g, v, s, args.dim)),
        "fused_int8_rowscale": jax.jit(lambda g, v, s: spgemm_forward_cbsr(
            g, v, s, args.dim, compute_dtype="int8_rowscale")),
        "fused_int8_percol": jax.jit(lambda g, v, s: spgemm_forward_cbsr(
            g, v, s, args.dim, compute_dtype="int8")),
    }
    for k in [int(s) for s in args.ks.split(",")]:
        v, s = jax.block_until_ready(jit_topk(x, k=k))
        for name, fn in variants.items():
            t = time_fn(lambda: fn(g, v, s), warmup=4, runs=4)
            print(json.dumps(dict(
                kernel=name, k=k, ms=round(t.mean_ms, 3),
                gnnz_s=round(nnz / t.mean_ms / 1e6, 4),
                ns_per_edge=round(t.mean_ms * 1e6 / nnz, 3),
                vs_dense=round(base_ms / t.mean_ms, 3))))


if __name__ == "__main__":
    main()
