"""Probe: Pallas selector-sample kernel (cbsr_gather) vs the XLA
compare-reduce, on TPU.

cbsr_gather is the sampling step of the backward SSpMM: (V, D) dense
gradient rows sampled at each node's k selector columns -> (V, k)
(reference spmm_maxk_backward.cu:92-103 does this with global
atomicAdd scatter). The XLA path is k compare-reduce passes over
(V, D). The Pallas kernel does the same loop in one VMEM pass; output
is (RB, KP) with KP = 128-padded k (single output ref, single
accumulation chain - the Mosaic-safe shape per tools/probe_pallas_topk).

Run: python tools/probe_sample.py
"""

import functools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from maxk_tpu.ops.pallas_topk import _pad_rows, _ROW_BLOCK
from maxk_tpu.ops.cbsr import cbsr_topk, cbsr_gather
from maxk_tpu.bench.timing import time_fn

K, D, V = 32, 256, 131072


def sample_kernel(d_ref, s_ref, o_ref, *, k):
    ds = d_ref[:]
    s = s_ref[:]
    rb, d = ds.shape
    kp = o_ref.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (rb, d), 1)
    lane_k = jax.lax.broadcasted_iota(jnp.int32, (rb, kp), 1)
    out = jnp.zeros((rb, kp), jnp.float32)
    for l in range(k):
        hit = s[:, l:l + 1] == iota                      # (RB, D)
        c_l = jnp.sum(jnp.where(hit, ds, 0.0), axis=1, keepdims=True)
        out = jnp.where(lane_k == l, c_l, out)
    o_ref[:] = out


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32))
    ds = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32))
    _, sel = jax.block_until_ready(
        jax.jit(cbsr_topk, static_argnames="k")(x, k=K))
    dp, _ = _pad_rows(ds, _ROW_BLOCK)
    sp, _ = _pad_rows(sel, _ROW_BLOCK)
    n = dp.shape[0]
    kp = -(-K // 128) * 128

    f = jax.jit(lambda dp, sp: pl.pallas_call(
        functools.partial(sample_kernel, k=K),
        grid=(n // _ROW_BLOCK,),
        in_specs=[pl.BlockSpec((_ROW_BLOCK, D), lambda i: (i, 0)),
                  pl.BlockSpec((_ROW_BLOCK, K), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((_ROW_BLOCK, kp), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, kp), jnp.float32))(dp, sp))

    ref = jax.jit(cbsr_gather)
    try:
        out = jax.block_until_ready(f(dp, sp))
        r = jax.block_until_ready(ref(ds, sel))
        err = float(jnp.max(jnp.abs(out[:V, :K] - r)))
        t = time_fn(lambda: f(dp, sp))
        tr = time_fn(lambda: ref(ds, sel))
        print(f"pallas sample: {t.mean_ms:.2f} ms (err {err}) | "
              f"xla cbsr_gather: {tr.mean_ms:.2f} ms", flush=True)
    except Exception as e:
        print(f"FAILED {type(e).__name__}: {str(e).splitlines()[0][:160]}",
              flush=True)


if __name__ == "__main__":
    main()
