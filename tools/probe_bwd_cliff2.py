"""Probe 2: isolate the composed backward k=64 cliff's trigger.

probe_bwd_cliff measured (products stand-in, v5e): composed
spmm(parted g_t) -> cbsr_gather costs a 2572 ms gather delta at k=64
(vs 102 ms at k=32 and 225 ms for the SAME gather isolated), and
chunking the gather into fenced 32-channel passes (ops/cbsr.py) did not
move it. Forward's cliff (fixed in cbsr_expand) was triggered by the
(V, 64)-wide operand layout, not chain length — this probe tests the
same hypothesis on the backward: k=48 (narrower), k=64 as-is, and k=64
with the selector zero-padded to width 72 / 128 (padded output columns
sliced off).

Usage: python tools/probe_bwd_cliff2.py [graph=s24_ogbn_products]
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


def sspmm_pad(g_t, dy, selector, pad_to):
    k = selector.shape[1]
    ds = spmm(g_t, dy)
    if pad_to > k:
        selector = jnp.pad(selector, ((0, 0), (0, pad_to - k)))
    out = cbsr_gather(ds, selector)
    return out[:, :k]


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

    for k, pad_to in ((48, 0), (64, 0), (64, 72), (64, 128)):
        sel = np.sort(rng.integers(0, dim, size=(csr.n_nodes, k)),
                      axis=1).astype(np.int32)
        s = jnp.asarray(sel)
        fn = jax.jit(lambda gt, dy, s, p=pad_to: sspmm_pad(gt, dy, s, p))
        bw = time_fn(lambda: fn(g_t, dy, s), warmup=2, runs=2)
        print(f"k={k} pad_to={pad_to}: {bw.mean_ms:.2f} ms "
              f"(gather delta {bw.mean_ms - base.mean_ms:.2f})", flush=True)


if __name__ == "__main__":
    main()
