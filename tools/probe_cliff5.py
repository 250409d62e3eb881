"""Probe 3 for the parted k=64 cliff: map the anomaly's support.

After the chunked expand (ops/cbsr.py), k=96 runs clean (28 ms on the
arxiv stand-in) but k=64 still cliffs (48 ms vs ~26 expected) — so the
trigger is not chain length. This probe holds the graph fixed and
sweeps k in {48, 56, 64, 72, 80} plus k=64 variants:
  - chunk=16 expand (MAXK_EXPAND_CHUNK already applied at import),
  - zero-padded CBSR to k=72 (extra channels select col 0 with value 0
    — same math, different operand WIDTH): distinguishes "64 channels"
    from "width-64 (V, k) operands".

Run: python tools/probe_cliff5.py [V [avg_deg]]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from maxk_tpu.data.loaders import synthetic_graph
from maxk_tpu.ops.graph import build_tiled_graph
from maxk_tpu.ops.cbsr import cbsr_topk
from maxk_tpu.ops.spgemm import spgemm_forward_cbsr
from maxk_tpu.bench.timing import time_fn

D = 256


def main():
    v_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 169343
    deg = float(sys.argv[2]) if len(sys.argv) > 2 else 6.9
    csr = synthetic_graph(v_nodes, deg, seed=123)
    rng = np.random.default_rng(123)
    csr = csr.with_values(
        rng.uniform(0.0, 1.0, size=csr.n_edges).astype(np.float32))
    x = jnp.asarray(rng.uniform(size=(csr.n_nodes, D)).astype(np.float32))
    g = build_tiled_graph(csr)

    jit_topk = jax.jit(cbsr_topk, static_argnames=("k",))
    jit_full = jax.jit(lambda g, v, s: spgemm_forward_cbsr(g, v, s, D))

    for k in (48, 56, 64, 72, 80):
        v, s = jax.block_until_ready(jit_topk(x, k=k))
        tf = time_fn(lambda: jit_full(g, v, s), warmup=4, runs=4)
        print(f"k={k:3d} full {tf.mean_ms:8.2f}", flush=True)

    # k=64 channels, width padded to 72 with dead channels.
    v, s = jax.block_until_ready(jit_topk(x, k=64))
    vp = jnp.pad(v, ((0, 0), (0, 8)))
    sp = jnp.pad(s, ((0, 0), (0, 8)))
    vp, sp = jax.block_until_ready((vp, sp))
    tf = time_fn(lambda: jit_full(g, vp, sp), warmup=4, runs=4)
    print(f"k=64 padded-to-72 full {tf.mean_ms:8.2f}", flush=True)


if __name__ == "__main__":
    main()
