"""Probe 4: which consumer shape triggers the composed backward cliff?

probe_bwd_cliff2/3 (products stand-in): the k=64 composed cliff
(+2572 ms) is invariant to gather chunking and selector padding, and
the compiled program's memory/structure census is ~identical to k=48
(clean). Variants here isolate the trigger:

  slice48     ds[:, :48]            trivial consumer, (V, 48) output
  slice64     ds[:, :64]            trivial consumer, (V, 64) output
  gather64_72 gather, output kept (V, 72) (no final slice back to 64)
  gather64_sum gather -> sum()      scalar output (no (V, k) buffer)

Usage: python tools/probe_bwd_cliff4.py [graph=s24_ogbn_products]
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

    sel64 = jnp.asarray(np.sort(
        rng.integers(0, dim, size=(csr.n_nodes, 64)), axis=1).astype(np.int32))
    sel72 = jnp.pad(sel64, ((0, 0), (0, 8)))

    variants = {
        "slice48": lambda gt, dy: spmm(gt, dy)[:, :48],
        "slice64": lambda gt, dy: spmm(gt, dy)[:, :64],
        "gather64_72": lambda gt, dy: cbsr_gather(spmm(gt, dy), sel72),
        "gather64_sum": lambda gt, dy: cbsr_gather(spmm(gt, dy),
                                                   sel64).sum(),
    }
    for vname, fn in variants.items():
        t = time_fn(lambda f=jax.jit(fn): f(g_t, dy), warmup=2, runs=2)
        print(f"{vname}: {t.mean_ms:.2f} ms "
              f"(delta {t.mean_ms - base.mean_ms:.2f})", flush=True)


if __name__ == "__main__":
    main()
