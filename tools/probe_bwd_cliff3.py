"""Probe 3: compile-level census of the composed backward at k=48 vs 64.

probe_bwd_cliff2 measured (products stand-in): the composed
spmm(parted g_t) -> cbsr_gather pays a 2572 ms delta at k=64 (1.88x the
whole SpMM) that is invariant to gather chunking AND selector padding,
while k=48 is k-linear. Hypothesis: XLA rematerializes the (V, 256) ds
buffer (2.5 GiB) under HBM pressure at k=64, re-running the parted scan
per consumer. This probe compiles (never runs) both compositions and
prints the while-loop count and XLA's memory analysis.

Usage: python tools/probe_bwd_cliff3.py [graph=s24_ogbn_products]
"""

import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from maxk_tpu.bench.harness import synthetic_by_name
from maxk_tpu.ops.graph import build_tiled_graph
from maxk_tpu.ops.spgemm import sspmm_sampled


def census(fn, *args):
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    txt = compiled.as_text()
    n_while = len(re.findall(r"\bwhile\b", txt))
    n_fusion = txt.count("fusion(")
    mem = compiled.memory_analysis()
    return n_while, n_fusion, mem


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

    v = csr.n_nodes
    dy = jax.ShapeDtypeStruct((v, dim), jnp.float32)
    for k in (48, 64):
        s = jax.ShapeDtypeStruct((v, k), jnp.int32)
        t0 = time.time()
        n_while, n_fusion, mem = census(
            lambda gt, dy, s: sspmm_sampled(gt, dy, s), g_t, dy, s)
        print(f"k={k}: while={n_while} fusion={n_fusion} "
              f"compile={time.time() - t0:.0f}s", flush=True)
        try:
            print(f"  temp={mem.temp_size_in_bytes / 2**30:.2f} GiB "
                  f"argument={mem.argument_size_in_bytes / 2**30:.2f} GiB "
                  f"output={mem.output_size_in_bytes / 2**30:.2f} GiB "
                  f"peak≈{(mem.temp_size_in_bytes + mem.argument_size_in_bytes + mem.output_size_in_bytes) / 2**30:.2f} GiB",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  memory_analysis unavailable: {e}", flush=True)


if __name__ == "__main__":
    main()
