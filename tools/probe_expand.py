"""Probe: Pallas CBSR-expand kernel vs the XLA compare-select expand.

Outcome (v5e, V=131k, D=256, k=32, round 3): Pallas 2.40 ms vs XLA
3.21 ms isolated — but in the headline CBSR-consuming kernel the XLA
expand FUSES into the bf16 pack step (fused-minus-baseline is only
~1.9 ms total), so a separate Pallas expand dispatch would not improve
spgemm_forward_cbsr. Recorded as a measured no-win; the production
training path avoids the expand entirely via the fused op's mask path
(ops/spgemm.py _mask_path).

Round-5 k-ladder (v5e, V=169k, arxiv stand-in), while chasing the
parted k=64 forward cliff: Pallas expand vs isolated XLA expand —
k=8: 1.73 vs 0.93 ms, k=16: 1.94 vs 1.61, k=32: 3.94 vs 3.19 (Pallas
LOSES at every compiling k), and k=64/96/128 crash tpu_compile_helper
(the same k-long select-chain Mosaic ceiling as the CBSR compaction
kernels). The cliff fix is therefore on the XLA side: cbsr_expand
evaluates k > 32 in barrier-fenced 32-channel chunks (ops/cbsr.py).

Run: python tools/probe_expand.py
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
from maxk_tpu.ops.cbsr import cbsr_topk, cbsr_expand
from maxk_tpu.bench.timing import time_fn

K, D, V = 32, 256, 131072


def expand_kernel(v_ref, s_ref, o_ref, *, k):
    v = v_ref[:]
    s = s_ref[:]
    rb = v.shape[0]
    d = o_ref.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (rb, d), 1)
    out = jnp.zeros((rb, d), jnp.float32)
    for l in range(k):
        out = out + jnp.where(s[:, l:l + 1] == iota, v[:, l:l + 1],
                              jnp.float32(0.0))
    o_ref[:] = out


def main():
    x = jnp.asarray(np.random.default_rng(0)
                    .normal(size=(V, D)).astype(np.float32))
    vv, ss = jax.block_until_ready(
        jax.jit(cbsr_topk, static_argnames="k")(x, k=K))
    vp, _ = _pad_rows(vv, _ROW_BLOCK)
    sp, _ = _pad_rows(ss, _ROW_BLOCK)
    n = vp.shape[0]

    f = jax.jit(lambda vp, sp: pl.pallas_call(
        functools.partial(expand_kernel, k=K),
        grid=(n // _ROW_BLOCK,),
        in_specs=[pl.BlockSpec((_ROW_BLOCK, K), lambda i: (i, 0)),
                  pl.BlockSpec((_ROW_BLOCK, K), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((_ROW_BLOCK, D), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, D), jnp.float32))(vp, sp))

    ref = jax.jit(cbsr_expand, static_argnames="dim")
    out = jax.block_until_ready(f(vp, sp))
    r = jax.block_until_ready(ref(vv, ss, D))
    err = float(jnp.max(jnp.abs(out[:V] - r)))
    t = time_fn(lambda: f(vp, sp))
    tr = time_fn(lambda: ref(vv, ss, D))
    print(f"pallas expand: {t.mean_ms:.2f} ms (err {err}) | "
          f"xla expand: {tr.mean_ms:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
