"""Probe 2 for the parted k=64 cliff: barrier placements + HLO census.

probe_cliff.py established: expand alone 6.4 ms, parted spmm on a
param 19.3 ms, but their in-graph composition 47.4 ms at k=64 (fine at
k<=32; unparted composition also fine). The xp barrier inside
_spmm_parted_impl did not remove the excess. This probe times
alternative compositions at k=64 and counts HLO fusions that read the
CBSR operands to locate the duplication/split.

Run: python tools/probe_cliff3.py [V [avg_deg [k]]]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from maxk_tpu.data.loaders import synthetic_graph
from maxk_tpu.ops.graph import build_tiled_graph
from maxk_tpu.ops.cbsr import cbsr_topk, cbsr_expand
from maxk_tpu.ops.spgemm import spgemm_forward_cbsr
from maxk_tpu.ops.spmm import spmm
from maxk_tpu.bench.timing import time_fn

D = 256


def census(jitted, *args, label=""):
    comp = jitted.lower(*args).compile()
    txt = comp.as_text()
    n_fus = txt.count(" fusion(")
    n_loop = txt.count("kind=kLoop")
    n_in = txt.count("kind=kInput")
    n_out = txt.count("kind=kOutput")
    # crude: how many fusion computations contain a compare (the expand's
    # signature op) — counts duplicated expand bodies.
    bodies = txt.split("fused_computation")
    n_cmp_bodies = sum(1 for b in bodies[1:] if " compare(" in b.split(
        "\n\n")[0])
    print(f"  [{label}] fusions={n_fus} loop={n_loop} input={n_in} "
          f"output={n_out} bodies_with_compare={n_cmp_bodies}")


def main():
    v_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 169343
    deg = float(sys.argv[2]) if len(sys.argv) > 2 else 6.9
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    csr = synthetic_graph(v_nodes, deg, seed=123)
    rng = np.random.default_rng(123)
    csr = csr.with_values(
        rng.uniform(0.0, 1.0, size=csr.n_edges).astype(np.float32))
    x = jnp.asarray(rng.uniform(size=(csr.n_nodes, D)).astype(np.float32))
    g = build_tiled_graph(csr)

    v, s = jax.block_until_ready(
        jax.jit(cbsr_topk, static_argnames=("k",))(x, k=k))

    f_full = jax.jit(lambda g, v, s: spgemm_forward_cbsr(g, v, s, D))
    f_bar = jax.jit(lambda g, v, s: spmm(
        g, jax.lax.optimization_barrier(cbsr_expand(v, s, D))))
    f_param = jax.jit(lambda g, xe: spmm(g, xe))
    xe = jax.block_until_ready(
        jax.jit(cbsr_expand, static_argnames=("dim",))(v, s, D))

    for label, fn, args in (
            ("full", f_full, (g, v, s)),
            ("barrier_after_expand", f_bar, (g, v, s)),
            ("param", f_param, (g, xe))):
        census(fn, *args, label=label)
        t = time_fn(lambda: fn(*args), warmup=4, runs=4)
        print(f"  [{label}] {t.mean_ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
