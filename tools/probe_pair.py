#!/usr/bin/env python
"""In-situ probe: 1024-byte paired-node gather rows for the tiled SpMM.

MACHINE-MODEL PROBE, not an expected win: gather descriptors are
per-EDGE (each edge slot fetches its neighbor's row), so pairing two
nodes per (V/2, 256-lane) row keeps the descriptor count and doubles
the fetched bytes — if the in-kernel gather is purely descriptor-bound
(the 512-byte rate is 186 GB/s, 4.4x under the byte floor) this measures
~neutral, and the delta calibrates where the 512->1024-byte row cost
lands between the descriptor and byte regimes (the isolated table shows
a width cliff at >=128 lanes; in-kernel fusion behaves differently).
A real descriptor reduction would need cross-edge dedup, which measures
near-zero for sparse power-law neighbor lists.

Formulation: cols >> 1 indexes the paired table; the per-edge parity
(cols & 1) selects the low/high bf16 half after the gather, as a VPU
select over the unpacked (C, D) operands (one extra select vs the
production path). Validates against ops.spmm.

Run from /root/repo, one TPU process at a time; CPU-smoke with
JAX_PLATFORMS=cpu --v 4096 first.
"""

from __future__ import annotations

import argparse
import functools
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
    args = ap.parse_args()

    import os
    import jax
    from maxk_tpu.platform import honor_env_platforms
    honor_env_platforms()
    import jax.numpy as jnp
    from maxk_tpu.data.loaders import synthetic_graph
    from maxk_tpu.ops.graph import build_tiled_graph
    from maxk_tpu.ops.spmm import spmm, _tile_reduce, _group_count
    from maxk_tpu.bench.timing import time_fn

    print(f"# backend={jax.default_backend()}", file=sys.stderr)
    csr = synthetic_graph(args.v, args.avg_degree, seed=123)
    rng = np.random.default_rng(123)
    csr = csr.with_values(rng.uniform(0, 1, csr.n_edges).astype(np.float32))
    g = build_tiled_graph(csr)
    assert hasattr(g, "n_tiles"), "probe expects an unparted graph"
    x = jnp.asarray(rng.uniform(0, 1, (csr.n_nodes, args.dim))
                    .astype(np.float32))
    nnz = csr.n_edges
    d = args.dim
    print(f"# V={csr.n_nodes} E={nnz} tiles={g.n_tiles}", file=sys.stderr)

    # Production baseline.
    f_base = jax.jit(spmm)
    y_ref = np.asarray(jax.block_until_ready(f_base(g, x)))
    t = time_fn(lambda: f_base(g, x), warmup=4, runs=4)
    print(json.dumps(dict(kernel="spmm_128lane", ms=round(t.mean_ms, 3),
                          ns_per_edge=round(t.mean_ms * 1e6 / nnz, 3))))

    # Paired-node table: (ceil(V/2), D) int32; lane j holds bf16 bits of
    # node 2i (low half) and node 2i+1 (high half), column j.
    @functools.partial(jax.jit, static_argnames=("row_block",
                                                 "n_rows_padded", "group"))
    def spmm_paired(cols, vals, lrow, block, x, row_block, n_rows_padded,
                    group):
        v = x.shape[0]
        xb = jax.lax.bitcast_convert_type(
            x.astype(jnp.bfloat16), jnp.int16).astype(jnp.int32) & 0xFFFF
        if v % 2:
            xb = jnp.concatenate([xb, jnp.zeros((1, d), jnp.int32)], axis=0)
        packed = xb[0::2] | (xb[1::2] << 16)          # (V/2, D) int32

        t_tiles, c = cols.shape
        gcols = cols.reshape(t_tiles // group, group * c)
        gvals = vals.reshape(t_tiles // group, group, c)
        glrow = lrow.reshape(t_tiles // group, group, c)
        gblock = block.reshape(t_tiles // group, group)

        def step(out, tile):
            tcols, tvals, tlrow, tblk = tile
            xg = jnp.take(packed, tcols >> 1, axis=0, mode="clip") \
                .reshape(group, c, d)
            parity = (tcols & 1).reshape(group, c)
            for j in range(group):
                # bf16 bits land in the f32 top half: low node via <<16,
                # high node via mask (same trick as _unpack_bf16_pairs).
                f_lo = jax.lax.bitcast_convert_type(xg[j] << 16, jnp.float32)
                f_hi = jax.lax.bitcast_convert_type(
                    xg[j] & jnp.int32(-65536), jnp.float32)
                xop = jnp.where((parity[j] == 1)[:, None], f_hi, f_lo)
                tile_out = _tile_reduce(xop.astype(jnp.bfloat16), tvals[j],
                                        tlrow[j], row_block, jnp.bfloat16)
                off = tblk[j] * row_block
                cur = jax.lax.dynamic_slice(out, (off, 0), (row_block, d))
                out = jax.lax.dynamic_update_slice(out, cur + tile_out,
                                                   (off, 0))
            return out, None

        out = jnp.zeros((n_rows_padded, d), jnp.float32)
        out, _ = jax.lax.scan(step, out, (gcols, gvals, glrow, gblock))
        return out

    group = _group_count(g.n_tiles, g.edge_tile)
    f_pair = lambda: spmm_paired(g.cols, g.vals, g.lrow, g.block, x,
                                 g.row_block, g.n_rows_padded, group)
    y = np.asarray(jax.block_until_ready(f_pair()))[: g.n_nodes]
    err = float(np.max(np.abs(y - y_ref)))
    scale = max(1.0, float(np.abs(y_ref).mean()))
    print(f"# paired max_err={err:.3e} (rel {err/scale:.3e})",
          file=sys.stderr)
    assert err / scale < 2e-2, "paired formulation diverges"
    t = time_fn(f_pair, warmup=4, runs=4)
    print(json.dumps(dict(kernel="spmm_paired_256lane",
                          ms=round(t.mean_ms, 3),
                          ns_per_edge=round(t.mean_ms * 1e6 / nnz, 3))))


if __name__ == "__main__":
    main()
