"""Probe: attribute the k=64 forward cliff on the parted OGB stand-ins.

Round-4 suite record (BENCH_SUITE24.json, protocol 2) shows
spgemm_forward_cbsr forward time cliffing 2.25x between k=32 and k=64 on
s24_ogbn_arxiv (21.1 -> 47.5 ms) and 2.84x on s24_ogbn_products
(1347 -> 3826 ms), while every other suite graph grows <= 1.2x. The
only k-dependent stage of the default forward is the node-level
cbsr_expand (+ the bf16 pack it fuses into); the tiled SpMM consumes a
k-independent (V, 256) operand.

This probe decomposes the forward on the arxiv shape (cheap, V=169k) at
k in {16, 32, 64, 96}:
  expand        cbsr_expand alone (jit boundary)
  expand+pack   cbsr_expand fused into _pack_bf16_pairs (what the parted
                impl's first stage actually computes)
  spmm_dense    tiled SpMM on a pre-expanded operand (k-independent ref)
  full          spgemm_forward_cbsr (the suite-timed op)
  full_unpart   same, graph built with col_part_rows=0
  fused_mask    maxk_spgemm mask-path forward (production training route)

Run: python tools/probe_cliff.py [V [avg_deg]]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from maxk_tpu.data.loaders import synthetic_graph
from maxk_tpu.ops.graph import build_tiled_graph
from maxk_tpu.ops.cbsr import cbsr_topk, cbsr_expand
from maxk_tpu.ops.spgemm import spgemm_forward_cbsr
from maxk_tpu.ops.spmm import spmm, _pack_bf16_pairs
from maxk_tpu.bench.timing import time_fn

D = 256


def main():
    v_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 169343
    deg = float(sys.argv[2]) if len(sys.argv) > 2 else 6.9
    csr = synthetic_graph(v_nodes, deg, seed=123)
    rng = np.random.default_rng(123)
    vals = rng.uniform(0.0, 1.0, size=csr.n_edges).astype(np.float32)
    csr = csr.with_values(vals)
    x = jnp.asarray(rng.uniform(size=(csr.n_nodes, D)).astype(np.float32))

    g = build_tiled_graph(csr)
    g_u = build_tiled_graph(csr, col_part_rows=0)
    from maxk_tpu.ops.graph import PartedGraph
    if isinstance(g, PartedGraph):
        print(f"graph V={csr.n_nodes} E={csr.n_edges} parts={g.n_parts} "
              f"layouts={[(p.row_block, p.edge_tile) for p in g.parts]}")
    else:
        print(f"graph V={csr.n_nodes} E={csr.n_edges} unparted "
              f"layout=({g.row_block},{g.edge_tile})")

    jit_topk = jax.jit(cbsr_topk, static_argnames=("k",))
    jit_exp = jax.jit(cbsr_expand, static_argnames=("dim",))
    jit_exp_pack = jax.jit(
        lambda v, s: _pack_bf16_pairs(cbsr_expand(v, s, D)))
    jit_full = jax.jit(lambda g, v, s: spgemm_forward_cbsr(g, v, s, D))
    jit_full_u = jax.jit(lambda g, v, s: spgemm_forward_cbsr(g, v, s, D))

    xd = jax.block_until_ready(jit_exp(*jit_topk(x, k=32), D))
    t = time_fn(lambda: spmm(g, xd), warmup=4, runs=4)
    print(f"spmm_dense (k-indep, parted): {t.mean_ms:8.2f} ms")
    t = time_fn(lambda: spmm(g_u, xd), warmup=4, runs=4)
    print(f"spmm_dense (k-indep, unpart): {t.mean_ms:8.2f} ms")

    from maxk_tpu.ops.maxk import _forward as maxk_forward

    for k in (16, 32, 64, 96):
        v, s = jax.block_until_ready(jit_topk(x, k=k))
        te = time_fn(lambda: jit_exp(v, s, D), warmup=4, runs=4)
        tp = time_fn(lambda: jit_exp_pack(v, s), warmup=4, runs=4)
        tf = time_fn(lambda: jit_full(g, v, s), warmup=4, runs=4)
        tu = time_fn(lambda: jit_full_u(g_u, v, s), warmup=4, runs=4)
        # jit once per k OUTSIDE the timed lambda (a jax.jit(...) call in
        # the lambda builds a fresh wrapper each run -> recompile, and the
        # "timing" is pure compile time).
        jit_mask = jax.jit(lambda g, x: spmm(g, maxk_forward(x, k)[0]))
        tm = time_fn(lambda: jit_mask(g, x), warmup=4, runs=4)
        print(f"k={k:3d}  expand {te.mean_ms:8.2f}  expand+pack "
              f"{tp.mean_ms:8.2f}  full {tf.mean_ms:8.2f}  full_unpart "
              f"{tu.mean_ms:8.2f}  fused_mask {tm.mean_ms:8.2f}", flush=True)


if __name__ == "__main__":
    main()
