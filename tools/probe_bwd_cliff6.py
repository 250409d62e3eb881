"""Probe 6: the Pallas gather fix, measured at products scale.

Expects (if the fix lands): composed sspmm_sampled k=64 within
~250 ms of the dense transpose SpMM, vs the +2572 ms XLA-formulation
cliff (probe_bwd_cliff2). Also times the standalone Pallas gather and
validates it against take_along_axis on device.

Usage: python tools/probe_bwd_cliff6.py [graph=s24_ogbn_products]
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
from maxk_tpu.ops.pallas_gather import cbsr_gather_pallas
from maxk_tpu.bench.timing import time_fn


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "s24_ogbn_products"
    dim = 256
    csr = synthetic_by_name(name)
    rng = np.random.default_rng(123)
    csr = csr.with_values(
        rng.uniform(0.0, 1.0, size=csr.n_edges).astype(np.float32))
    print(f"{name}: V={csr.n_nodes} E={csr.n_edges}", flush=True)

    # Small-scale on-device validation first (cheap fail-fast).
    ds_s = jnp.asarray(rng.normal(size=(1000, dim)).astype(np.float32))
    sel_s = np.sort(rng.integers(0, dim, size=(1000, 64)),
                    axis=1).astype(np.int32)
    out_s = np.asarray(cbsr_gather_pallas(ds_s, jnp.asarray(sel_s)))
    ref_s = np.take_along_axis(np.asarray(ds_s), sel_s.astype(np.int64),
                               axis=1)
    assert np.array_equal(out_s, ref_s), np.abs(out_s - ref_s).max()
    print("pallas gather validates on device", flush=True)

    t0 = time.time()
    g_t = build_tiled_graph(csr.transpose())
    print(f"tile g_t: {time.time() - t0:.1f} s", flush=True)
    dy = jnp.asarray(rng.uniform(size=(csr.n_nodes, dim)).astype(np.float32))
    base = time_fn(lambda: spmm(g_t, dy), warmup=2, runs=2)
    print(f"spmm_T dense: {base.mean_ms:.2f} ms", flush=True)

    ds = jax.block_until_ready(jax.jit(spmm)(g_t, dy))
    for k in (32, 64):
        sel = jnp.asarray(np.sort(
            rng.integers(0, dim, size=(csr.n_nodes, k)),
            axis=1).astype(np.int32))
        t = time_fn(lambda: cbsr_gather_pallas(ds, sel), warmup=2, runs=2)
        print(f"pallas gather standalone k={k}: {t.mean_ms:.2f} ms",
              flush=True)
    del ds

    jit_bwd = jax.jit(sspmm_sampled)
    for k in (32, 64):
        sel = jnp.asarray(np.sort(
            rng.integers(0, dim, size=(csr.n_nodes, k)),
            axis=1).astype(np.int32))
        bw = time_fn(lambda: jit_bwd(g_t, dy, sel), warmup=2, runs=2)
        print(f"sspmm_sampled k={k}: {bw.mean_ms:.2f} ms "
              f"(delta {bw.mean_ms - base.mean_ms:.2f})", flush=True)


if __name__ == "__main__":
    main()
