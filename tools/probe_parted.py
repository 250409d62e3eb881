#!/usr/bin/env python
"""In-situ probe of the column-parted low-degree regime (products/yelp
shape class: V >> 131072, per-part degree < 8).

Round-2 context: syn_products_shape (V=2.45M, E=125M, 19 parts) runs at
15.7 ns/edge vs 2.8 at reddit-shape. Hypotheses tested here, all in-situ
(isolated microbenches do not transfer — see BASELINE.md machine model):

  a) the 128-lane packed gather drops to descriptor rate (~117 M rows/s)
     in this regime -> splitting into 2x64-lane gathers should win
     (tables are <=131072 rows, the fast-descriptor regime);
  b) padding (33-58% at the auto R/C choice) multiplies all per-slot
     costs -> non-power-of-2 / smaller C should win;
  c) per-sub-tile output read-modify-write (R*D*8/C bytes per slot)
     matters at R=512/C<=2048 -> smaller R should win.

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
    ap.add_argument("--v", type=int, default=786432)
    ap.add_argument("--avg-degree", type=float, default=10.0,
                    help="pre-symmetrization degree (doubles)")
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--variants", default="")
    args = ap.parse_args()

    import os
    import jax
    # The axon sitecustomize overwrites JAX_PLATFORMS at import time;
    # honor an explicit env choice (CPU smoke runs) like train.py.
    from maxk_tpu.platform import honor_env_platforms
    honor_env_platforms()
    import jax.numpy as jnp
    from maxk_tpu.data.loaders import synthetic_graph
    from maxk_tpu.ops.graph import build_tiled_graph
    import importlib
    spmm_mod = importlib.import_module("maxk_tpu.ops.spmm")
    from maxk_tpu.bench.timing import time_fn

    print(f"# backend={jax.default_backend()}", file=sys.stderr)
    csr = synthetic_graph(args.v, args.avg_degree, seed=123)
    rng = np.random.default_rng(123)
    csr = csr.with_values(rng.uniform(0, 1, csr.n_edges).astype(np.float32))
    x_np = rng.uniform(0, 1, (csr.n_nodes, args.dim)).astype(np.float32)
    nnz = csr.n_edges
    print(f"# V={csr.n_nodes} E={nnz} deg={nnz/csr.n_nodes:.1f}",
          file=sys.stderr)

    def describe(g):
        if hasattr(g, "parts"):
            slots = sum(p.cols.size for p in g.parts)
            rcs = {(p.row_block, p.edge_tile) for p in g.parts}
            return dict(parts=len(g.parts), slots=int(slots),
                        pad=round(1 - nnz / slots, 3), rc=sorted(rcs))
        slots = g.cols.size
        return dict(parts=0, slots=int(slots),
                    pad=round(1 - nnz / slots, 3),
                    rc=[(g.row_block, g.edge_tile)])

    # (name, build_kwargs, gather_max_lanes, compute_dtype)
    variants = [
        ("parted_auto", {}, 128, None),
        ("parted_split64", {}, 64, None),
        ("parted_int8", {}, 128, "int8"),
        ("parted_R256_C512", {"row_block": 256, "edge_tile": 512},
         128, None),
        ("parted_R256_C1536", {"row_block": 256, "edge_tile": 1536},
         128, None),
        ("parted_R128_C1024", {"row_block": 128, "edge_tile": 1024},
         128, None),
        ("parted_R256_C512_split64", {"row_block": 256, "edge_tile": 512},
         64, None),
        ("unparted", {"col_part_rows": 0}, 128, None),
        ("unparted_split64", {"col_part_rows": 0}, 64, None),
    ]
    if args.variants:
        want = set(args.variants.split(","))
        variants = [v for v in variants if v[0] in want]

    # Fused-forward variants on the auto-parted graph: the int8_rowscale
    # table is dim/4+1 = 65 lanes, under the 512-byte width penalty that
    # the dense 128-lane table pays in this regime — if the penalty is
    # what makes products-shape slow, the FUSED forward should beat the
    # dense baseline here (the paper's story, on large graphs).
    fused_variants = [("fused_bf16_k32", None), ("fused_rowscale_k32",
                                                 "int8_rowscale")]

    built = {}
    for name, kw, lanes, cd in variants:
        key = tuple(sorted(kw.items()))
        if key not in built:
            built[key] = build_tiled_graph(csr, **kw)
        g = built[key]
        spmm_mod._GATHER_MAX_LANES = lanes
        jax.clear_caches()
        x = jnp.asarray(x_np)
        fn = jax.jit(lambda gg, xx: spmm_mod.spmm(gg, xx, compute_dtype=cd))
        try:
            t = time_fn(lambda: fn(g, x), warmup=4, runs=4)
            print(json.dumps(dict(
                kernel=name, ms=round(t.mean_ms, 3),
                ns_per_edge=round(t.mean_ms * 1e6 / nnz, 3),
                **describe(g))), flush=True)
        except Exception as e:  # noqa: BLE001 — probe sweeps must continue
            print(json.dumps(dict(kernel=name,
                                  error=str(e)[:200])), flush=True)
    spmm_mod._GATHER_MAX_LANES = 128

    from maxk_tpu.ops.cbsr import cbsr_topk
    from maxk_tpu.ops.spgemm import spgemm_forward_cbsr
    jax.clear_caches()
    g = built.get(())
    if g is not None and fused_variants:
        x = jnp.asarray(x_np)
        v, s = jax.block_until_ready(
            jax.jit(cbsr_topk, static_argnames=("k",))(x, k=32))
        for name, cd in fused_variants:
            fn = jax.jit(lambda gg, vv, ss, cd=cd: spgemm_forward_cbsr(
                gg, vv, ss, args.dim, compute_dtype=cd))
            try:
                t = time_fn(lambda: fn(g, v, s), warmup=4, runs=4)
                print(json.dumps(dict(
                    kernel=name, ms=round(t.mean_ms, 3),
                    ns_per_edge=round(t.mean_ms * 1e6 / nnz, 3))),
                    flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps(dict(kernel=name, error=str(e)[:200])),
                      flush=True)


if __name__ == "__main__":
    main()
