"""Probe: composed backward SSpMM at suite-giant scale, k=32 vs k=64.

Round-4 suite record (BENCH_SUITE24.json): s24_ogbn_products backward
cliffs 1473 ms (k=32) -> 3934 ms (k=64) while the dense transpose SpMM
is k-independent (1368 ms) and cbsr_gather in isolation is k-linear
(225 ms at k=64, measured in this round). The cliff is therefore in the
jitted composition spmm(parted g_t) -> k-unrolled gather — the backward
twin of the forward expand cliff fixed in ops/cbsr.py cbsr_expand.
This probe measures the composition AFTER cbsr_gather's chunk fix.

Usage: python tools/probe_bwd_cliff.py [graph=s24_ogbn_products]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from maxk_tpu.bench.harness import synthetic_by_name
from maxk_tpu.ops.graph import build_tiled_graph
from maxk_tpu.ops.spmm import spmm
from maxk_tpu.ops.spgemm import sspmm_sampled
from maxk_tpu.bench.timing import time_fn


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "s24_ogbn_products"
    dim = 256
    csr = synthetic_by_name(name)
    rng = np.random.default_rng(123)
    vals = rng.uniform(0.0, 1.0, size=csr.n_edges).astype(np.float32)
    csr = csr.with_values(vals)
    print(f"{name}: V={csr.n_nodes} E={csr.n_edges}", flush=True)

    csr_t = csr.transpose()
    t0 = time.time()
    g_t = build_tiled_graph(csr_t)
    print(f"tile g_t: {time.time() - t0:.1f} s", flush=True)
    dy = jnp.asarray(rng.uniform(size=(csr.n_nodes, dim)).astype(np.float32))

    base = time_fn(lambda: spmm(g_t, dy), warmup=2, runs=2)
    print(f"spmm_T dense: {base.mean_ms:.2f} ms", flush=True)

    jit_bwd = jax.jit(sspmm_sampled)
    for k in (32, 64):
        sel = np.sort(rng.integers(0, dim, size=(csr.n_nodes, k)),
                      axis=1).astype(np.int32)
        s = jnp.asarray(sel)
        bw = time_fn(lambda: jit_bwd(g_t, dy, s), warmup=2, runs=2)
        print(f"sspmm_sampled k={k}: {bw.mean_ms:.2f} ms "
              f"(gather delta {bw.mean_ms - base.mean_ms:.2f})", flush=True)


if __name__ == "__main__":
    main()
