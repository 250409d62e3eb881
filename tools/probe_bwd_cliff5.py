"""Probe 5: bisect the composed backward k=64 cliff (products stand-in).

Known (probe_bwd_cliff2/3/4): composed spmm(19-part g_t) -> gather
cliffs +2572 ms at k=64 only; invariant to chunking/padding; compiled
census ~= k=48's; trivial (V, 64) consumers are clean. The delta is
suspiciously ~19 x 135 ms — one hypothesis is XLA distributing the
(linear) gather into each part's contribution despite the barrier.

Variants (selectors are ARGUMENTS, never closed-over constants — the
axon remote-compile tunnel 413s on embedded 600 MB constants):

  tuple32x2   two (V, 32) chunk outputs, no concat
  sum32x2     chunk0 + chunk1 -> (V, 32) output
  concat64    chunk0 ++ chunk1 -> (V, 64) output (the production shape)
  bf16_ds     gather on ds.astype(bf16), concat64 shape
  twojit      jit(spmm) then jit(cbsr_gather) — decomposed dispatch

Usage: python tools/probe_bwd_cliff5.py [graph=s24_ogbn_products]
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
from maxk_tpu.ops.cbsr import cbsr_gather
from maxk_tpu.bench.timing import time_fn


def chunk_gather(d, s_c):
    iota = jnp.arange(d.shape[1], dtype=s_c.dtype)[None, :]
    cols = []
    for l in range(s_c.shape[1]):
        hit = s_c[:, l:l + 1] == iota
        cols.append(jnp.where(hit, d, jnp.zeros((), d.dtype)).sum(axis=1))
    return jnp.stack(cols, axis=1)


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "s24_ogbn_products"
    dim = 256
    csr = synthetic_by_name(name)
    rng = np.random.default_rng(123)
    csr = csr.with_values(
        rng.uniform(0.0, 1.0, size=csr.n_edges).astype(np.float32))
    print(f"{name}: V={csr.n_nodes} E={csr.n_edges}", flush=True)
    t0 = time.time()
    g_t = build_tiled_graph(csr.transpose())
    print(f"tile g_t: {time.time() - t0:.1f} s", flush=True)
    dy = jnp.asarray(rng.uniform(size=(csr.n_nodes, dim)).astype(np.float32))
    base = time_fn(lambda: spmm(g_t, dy), warmup=2, runs=2)
    print(f"spmm_T dense: {base.mean_ms:.2f} ms", flush=True)

    s = jnp.asarray(np.sort(
        rng.integers(0, dim, size=(csr.n_nodes, 64)), axis=1).astype(np.int32))

    def tuple32x2(gt, dy, s):
        ds = jax.lax.optimization_barrier(spmm(gt, dy))
        return chunk_gather(ds, s[:, :32]), chunk_gather(ds, s[:, 32:])

    def sum32x2(gt, dy, s):
        ds = jax.lax.optimization_barrier(spmm(gt, dy))
        return chunk_gather(ds, s[:, :32]) + chunk_gather(ds, s[:, 32:])

    def concat64(gt, dy, s):
        ds = jax.lax.optimization_barrier(spmm(gt, dy))
        return jnp.concatenate(
            [chunk_gather(ds, s[:, :32]), chunk_gather(ds, s[:, 32:])],
            axis=1)

    def bf16_ds(gt, dy, s):
        ds = jax.lax.optimization_barrier(
            spmm(gt, dy).astype(jnp.bfloat16))
        return jnp.concatenate(
            [chunk_gather(ds, s[:, :32]), chunk_gather(ds, s[:, 32:])],
            axis=1)

    for vname, fn in (("tuple32x2", tuple32x2), ("sum32x2", sum32x2),
                      ("concat64", concat64), ("bf16_ds", bf16_ds)):
        f = jax.jit(fn)
        t = time_fn(lambda: f(g_t, dy, s), warmup=2, runs=2)
        print(f"{vname}: {t.mean_ms:.2f} ms "
              f"(delta {t.mean_ms - base.mean_ms:.2f})", flush=True)

    f1 = jax.jit(spmm)
    f2 = jax.jit(cbsr_gather)
    t = time_fn(lambda: f2(f1(g_t, dy), s), warmup=2, runs=2)
    print(f"twojit: {t.mean_ms:.2f} ms "
          f"(delta {t.mean_ms - base.mean_ms:.2f})", flush=True)


if __name__ == "__main__":
    main()
