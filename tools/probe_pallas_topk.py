"""Bisect which op of the Pallas CBSR compaction kernel breaks Mosaic.

The mask kernel (maxk_pallas) compiles and runs 2 ms; the CBSR kernel
(cbsr_topk_pallas) crashes tpu_compile_helper. Variants isolate:
  V1  mask + second cumsum (pos), write pos            — cumsum#2
  V2  V1 + k-loop float value compaction, write vals   — f32 loop
  V3  V2 + int32 selector compaction                   — int32 loop
Run: python tools/probe_pallas_topk.py
"""

import functools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from maxk_tpu.ops.pallas_topk import (_exact_mask, _cumsum_lanes,
                                      _pad_rows, _ROW_BLOCK)

K = 32


def v1_kernel(x_ref, o_ref):
    x = x_ref[:]
    mask = _exact_mask(x, K)
    pos = _cumsum_lanes(mask.astype(jnp.int32))
    o_ref[:] = jnp.where(mask, pos, jnp.float32(0.0))


def v2_kernel(x_ref, o_ref):
    x = x_ref[:]
    rb, d = x.shape
    mask = _exact_mask(x, K)
    pos = jnp.where(mask, _cumsum_lanes(mask.astype(jnp.int32)),
                    jnp.float32(0.0))
    kp = o_ref.shape[1]
    lane_k = jax.lax.broadcasted_iota(jnp.int32, (rb, kp), 1)
    vals = jnp.zeros((rb, kp), jnp.float32)
    for l in range(K):
        hit = pos == jnp.float32(l + 1)
        v_l = jnp.sum(jnp.where(hit, x, 0.0), axis=1, keepdims=True)
        vals = jnp.where(lane_k == l, v_l, vals)
    o_ref[:] = vals


def v3_kernel(x_ref, o_ref):
    x = x_ref[:]
    rb, d = x.shape
    mask = _exact_mask(x, K)
    pos = jnp.where(mask, _cumsum_lanes(mask.astype(jnp.int32)),
                    jnp.float32(0.0))
    iota_d = jax.lax.broadcasted_iota(jnp.int32, (rb, d), 1)
    kp = o_ref.shape[1]
    lane_k = jax.lax.broadcasted_iota(jnp.int32, (rb, kp), 1)
    sels = jnp.zeros((rb, kp), jnp.int32)
    for l in range(K):
        hit = pos == jnp.float32(l + 1)
        s_l = jnp.sum(jnp.where(hit, iota_d, 0), axis=1, keepdims=True)
        sels = jnp.where(lane_k == l, s_l, sels)
    o_ref[:] = sels.astype(jnp.float32)


def run(name, kernel, out_lanes):
    x = jnp.asarray(np.random.default_rng(0)
                    .uniform(0, 1, (131072, 256)).astype(np.float32))
    xp, v = _pad_rows(x, _ROW_BLOCK)
    vp, d = xp.shape
    try:
        out = pl.pallas_call(
            kernel,
            grid=(vp // _ROW_BLOCK,),
            in_specs=[pl.BlockSpec((_ROW_BLOCK, d), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((_ROW_BLOCK, out_lanes),
                                   lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((vp, out_lanes), jnp.float32),
        )(xp)
        jax.block_until_ready(out)
        print(f"{name}: OK sum={float(jnp.sum(out)):.1f}", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: "
              f"{str(e).splitlines()[0][:160]}", flush=True)


def _old_main():
    run("V1 pos-write   ", v1_kernel, 256)
    run("V2 f32-compact ", v2_kernel, 128)
    run("V3 int32-compact", v3_kernel, 128)


def v5_kernel(x_ref, o_ref):
    # V3 with a TRUE int32 output ref (no f32 cast)
    x = x_ref[:]
    rb, d = x.shape
    mask = _exact_mask(x, K)
    pos = jnp.where(mask, _cumsum_lanes(mask.astype(jnp.int32)),
                    jnp.float32(0.0))
    iota_d = jax.lax.broadcasted_iota(jnp.int32, (rb, d), 1)
    kp = o_ref.shape[1]
    lane_k = jax.lax.broadcasted_iota(jnp.int32, (rb, kp), 1)
    sels = jnp.zeros((rb, kp), jnp.int32)
    for l in range(K):
        hit = pos == jnp.float32(l + 1)
        s_l = jnp.sum(jnp.where(hit, iota_d, 0), axis=1, keepdims=True)
        sels = jnp.where(lane_k == l, s_l, sels)
    o_ref[:] = sels


def v4_full_two_f32(x_ref, va_ref, se_ref):
    from maxk_tpu.ops.pallas_topk import _cbsr_kernel
    import functools as ft
    # full kernel but selector output f32
    x = x_ref[:]
    rb, d = x.shape
    mask = _exact_mask(x, K)
    pos = jnp.where(mask, _cumsum_lanes(mask.astype(jnp.int32)),
                    jnp.float32(0.0))
    iota_d = jax.lax.broadcasted_iota(jnp.int32, (rb, d), 1)
    kp = va_ref.shape[1]
    lane_k = jax.lax.broadcasted_iota(jnp.int32, (rb, kp), 1)
    vals = jnp.zeros((rb, kp), jnp.float32)
    sels = jnp.zeros((rb, kp), jnp.int32)
    for l in range(K):
        hit = pos == jnp.float32(l + 1)
        v_l = jnp.sum(jnp.where(hit, x, 0.0), axis=1, keepdims=True)
        s_l = jnp.sum(jnp.where(hit, iota_d, 0), axis=1, keepdims=True)
        vals = jnp.where(lane_k == l, v_l, vals)
        sels = jnp.where(lane_k == l, s_l, sels)
    va_ref[:] = vals
    se_ref[:] = sels.astype(jnp.float32)


def run2(name, kernel, dt2):
    x = jnp.asarray(np.random.default_rng(0)
                    .uniform(0, 1, (131072, 256)).astype(np.float32))
    xp, v = _pad_rows(x, _ROW_BLOCK)
    vp, d = xp.shape
    try:
        out = pl.pallas_call(
            kernel,
            grid=(vp // _ROW_BLOCK,),
            in_specs=[pl.BlockSpec((_ROW_BLOCK, d), lambda i: (i, 0))],
            out_specs=(pl.BlockSpec((_ROW_BLOCK, 128), lambda i: (i, 0)),
                       pl.BlockSpec((_ROW_BLOCK, 128), lambda i: (i, 0))),
            out_shape=(jax.ShapeDtypeStruct((vp, 128), jnp.float32),
                       jax.ShapeDtypeStruct((vp, 128), dt2)),
        )(xp)
        jax.block_until_ready(out)
        print(f"{name}: OK", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: "
              f"{str(e).splitlines()[0][:160]}", flush=True)


def run1_int(name, kernel):
    x = jnp.asarray(np.random.default_rng(0)
                    .uniform(0, 1, (131072, 256)).astype(np.float32))
    xp, v = _pad_rows(x, _ROW_BLOCK)
    vp, d = xp.shape
    try:
        out = pl.pallas_call(
            kernel,
            grid=(vp // _ROW_BLOCK,),
            in_specs=[pl.BlockSpec((_ROW_BLOCK, d), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((_ROW_BLOCK, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((vp, 128), jnp.int32),
        )(xp)
        jax.block_until_ready(out)
        print(f"{name}: OK", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: "
              f"{str(e).splitlines()[0][:160]}", flush=True)


if __name__ == "__main__":
    import sys as _s
    stage = _s.argv[1] if len(_s.argv) > 1 else "2"
    if stage == "1":
        run("V1 pos-write   ", v1_kernel, 256)
        run("V2 f32-compact ", v2_kernel, 128)
        run("V3 int32-compact", v3_kernel, 128)
    else:
        run1_int("V5 int32-output", v5_kernel)
        run2("V4 full-two-f32", v4_full_two_f32, jnp.float32)


def v6_concat_out(x_ref, o_ref):
    # vals f32 in lanes [0,128), sels bitcast-to-f32 in lanes [128,256)
    x = x_ref[:]
    rb, d = x.shape
    mask = _exact_mask(x, K)
    pos = jnp.where(mask, _cumsum_lanes(mask.astype(jnp.int32)),
                    jnp.float32(0.0))
    iota_d = jax.lax.broadcasted_iota(jnp.int32, (rb, d), 1)
    kp = o_ref.shape[1] // 2
    lane_k = jax.lax.broadcasted_iota(jnp.int32, (rb, kp), 1)
    vals = jnp.zeros((rb, kp), jnp.float32)
    sels = jnp.zeros((rb, kp), jnp.int32)
    for l in range(K):
        hit = pos == jnp.float32(l + 1)
        v_l = jnp.sum(jnp.where(hit, x, 0.0), axis=1, keepdims=True)
        s_l = jnp.sum(jnp.where(hit, iota_d, 0), axis=1, keepdims=True)
        vals = jnp.where(lane_k == l, v_l, vals)
        sels = jnp.where(lane_k == l, s_l, sels)
    o_ref[:] = jnp.concatenate(
        [vals, jax.lax.bitcast_convert_type(sels, jnp.float32)], axis=1)


def v7_two_mixed(x_ref, va_ref, se_ref):
    # the production kernel shape: f32 vals ref + int32 sels ref
    x = x_ref[:]
    rb, d = x.shape
    mask = _exact_mask(x, K)
    pos = jnp.where(mask, _cumsum_lanes(mask.astype(jnp.int32)),
                    jnp.float32(0.0))
    iota_d = jax.lax.broadcasted_iota(jnp.int32, (rb, d), 1)
    kp = va_ref.shape[1]
    lane_k = jax.lax.broadcasted_iota(jnp.int32, (rb, kp), 1)
    vals = jnp.zeros((rb, kp), jnp.float32)
    sels = jnp.zeros((rb, kp), jnp.int32)
    for l in range(K):
        hit = pos == jnp.float32(l + 1)
        v_l = jnp.sum(jnp.where(hit, x, 0.0), axis=1, keepdims=True)
        s_l = jnp.sum(jnp.where(hit, iota_d, 0), axis=1, keepdims=True)
        vals = jnp.where(lane_k == l, v_l, vals)
        sels = jnp.where(lane_k == l, s_l, sels)
    va_ref[:] = vals
    se_ref[:] = sels


def run_v7(name):
    x = jnp.asarray(np.random.default_rng(0)
                    .uniform(0, 1, (131072, 256)).astype(np.float32))
    xp, v = _pad_rows(x, _ROW_BLOCK)
    vp, d = xp.shape
    try:
        out = pl.pallas_call(
            v7_two_mixed,
            grid=(vp // _ROW_BLOCK,),
            in_specs=[pl.BlockSpec((_ROW_BLOCK, d), lambda i: (i, 0))],
            out_specs=(pl.BlockSpec((_ROW_BLOCK, 128), lambda i: (i, 0)),
                       pl.BlockSpec((_ROW_BLOCK, 128), lambda i: (i, 0))),
            out_shape=(jax.ShapeDtypeStruct((vp, 128), jnp.float32),
                       jax.ShapeDtypeStruct((vp, 128), jnp.int32)),
        )(xp)
        jax.block_until_ready(out)
        print(f"{name}: OK", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: "
              f"{str(e).splitlines()[0][:160]}", flush=True)
