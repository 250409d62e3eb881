"""Probe: hub-column densification for the tiled SpMM.

Hypothesis. The tiled SpMM's cost is the per-edge HBM row gather
(~2.8 ns/edge in-kernel, descriptor-bound — BASELINE.md machine model).
On power-law graphs a small set of high-in-degree "hub" columns receives
a large fraction of all edges. Those edges can be moved off the gather
entirely: collect them into a dense (V, H) slab A_hub (column c of the
slab = hub node hub_ids[c]) and compute their contribution as one MXU
matmul, A_hub @ x[hub_ids]:

  per-column dense cost ~= V * (2 B / HBM_BW + 2*D flops / MXU_peak)
                        ~= V * 5e-12 s          (bf16 slab, D=256)
  per-edge gather saving ~= 2.8 ns (fast regime) .. 8-16 ns (parted)

so a column wins when its in-degree exceeds ~V/555 (fast regime) and the
win per column is (deg - breakeven) * gather_ns. This is the TPU hybrid
analog of pulling hot rows out of the sparse format — the same reason
the reference's warp4 metadata splits hot rows (generate_meta.py), but
applied to columns and resolved on the MXU instead of more scheduling.

Measures, per hub-set size H: edge coverage, residual SpMM time, hub
matmul time, and the total vs the unsplit baseline.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--graph", default="syn_big_d100")
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--hs", default="512,1024,2048,4096")
    ap.add_argument("--runs", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from maxk_tpu.bench.harness import synthetic_by_name
    from maxk_tpu.bench.timing import time_fn
    from maxk_tpu.ops.graph import CSRGraph, build_tiled_graph
    from maxk_tpu.ops.spmm import spmm

    csr = synthetic_by_name(args.graph)
    rng = np.random.default_rng(123)
    csr = csr.with_values(
        rng.uniform(0, 1, size=csr.n_edges).astype(np.float32))
    v, e, d = csr.n_nodes, csr.n_edges, args.dim
    x = jnp.asarray(rng.uniform(0, 1, size=(v, d)).astype(np.float32))
    print(f"graph={args.graph} V={v} E={e} D={d}")

    g_full = build_tiled_graph(csr)
    base = time_fn(lambda: spmm(g_full, x), warmup=4, runs=args.runs)
    print(f"baseline spmm: {base.mean_ms:.2f} ms "
          f"({base.mean_ms * 1e6 / e:.2f} ns/edge)")
    y_ref = np.asarray(spmm(g_full, x), np.float64)

    in_deg = csr.in_degrees
    order = np.argsort(-in_deg)
    rows_all, cols_all = csr.to_coo()

    for h in [int(s) for s in args.hs.split(",")]:
        hub_ids = np.sort(order[:h].astype(np.int32))
        deg_min = int(in_deg[hub_ids].min())
        is_hub = np.zeros(v, bool)
        is_hub[hub_ids] = True
        hub_edge = is_hub[cols_all]
        cov = float(hub_edge.mean())

        # Dense slab: A_hub[r, pos(c)] += val over hub edges.
        pos = np.zeros(v, np.int32)
        pos[hub_ids] = np.arange(h, dtype=np.int32)
        t0 = time.perf_counter()
        a_hub = np.zeros((v, h), np.float32)
        np.add.at(a_hub, (rows_all[hub_edge], pos[cols_all[hub_edge]]),
                  csr.values[hub_edge])
        build_s = time.perf_counter() - t0

        resid = CSRGraph.from_coo(rows_all[~hub_edge],
                                  cols_all[~hub_edge].astype(np.int32),
                                  v, values=csr.values[~hub_edge])
        g_r = build_tiled_graph(resid)
        a_dev = jnp.asarray(a_hub, jnp.bfloat16)
        hub_j = jnp.asarray(hub_ids)

        # Graphs/slabs as jit ARGUMENTS (closure capture bakes them into
        # the executable, which the remote-compile tunnel rejects at 413).
        @jax.jit
        def hybrid(gg, aa, hh, xx):
            dense = jnp.dot(aa, jnp.take(xx, hh, axis=0)
                            .astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
            return spmm(gg, xx) + dense

        @jax.jit
        def dense_only(aa, hh, xx):
            return jnp.dot(aa, jnp.take(xx, hh, axis=0)
                           .astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)

        y = np.asarray(hybrid(g_r, a_dev, hub_j, x), np.float64)
        err = np.abs(y - y_ref).mean() / max(1.0, np.abs(y_ref).mean())
        t = time_fn(lambda: hybrid(g_r, a_dev, hub_j, x),
                    warmup=4, runs=args.runs)
        t_dense = time_fn(lambda: dense_only(a_dev, hub_j, x),
                          warmup=4, runs=args.runs)
        print(f"H={h:5d} deg_min={deg_min:5d} cov={cov * 100:5.1f}% "
              f"hybrid={t.mean_ms:7.2f} ms (dense part "
              f"{t_dense.mean_ms:6.2f} ms, slab build {build_s:5.1f} s) "
              f"speedup={base.mean_ms / t.mean_ms:5.2f}x rel_err={err:.1e}")


if __name__ == "__main__":
    main()
