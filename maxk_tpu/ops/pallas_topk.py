"""Pallas TopK kernels: MaxK nonlinearity and TopK->CBSR compaction.

The TPU answer to the reference's warp-ballot TopK kernel
(reference kernels/maxk_kernel.cu:23-96): the reference binary-searches an
8-bit threshold per 256-wide uint8 row with warp shuffles, then
ballot-compacts the survivors into CBSR. This kernel family does the same
dance in full fp32 — a 32-step bitwise descent on the IEEE-754 sortable
key finds the exact k-th largest value per row, ties at the threshold are
resolved first-index-wins via a lane cumsum (the VPU analog of
__ballot_sync/__popc), and compaction emits (V, k) values + ascending
int32 selectors. No uint8 quantization, no k < 19 crash
(reference test_topk_bug.py), any 1 <= k <= D.

Why Pallas: lax.top_k lowers to a full per-row variadic sort — measured
6.0 ms for (131072, 256) f32 at k=32 on v5e, ~37x off the HBM streaming
bound for a 134 MB input. The threshold search reads each row once into
VMEM and does all 32 count iterations on-chip. Unlike the SpMM tile
reduce (ops/pallas_spmm.py — blocked on Mosaic's gather limitations),
every op here is dense, row-local and lane-aligned, which Mosaic
compiles.

Numerics: output == cbsr_topk/maxk exactly, including first-index tie
breaking, with one measure-zero exception: -0.0 and +0.0 compare equal
for lax.top_k but order as -0.0 < +0.0 under the sortable key, so a row
whose k-boundary straddles mixed-sign zeros may select different
(all-zero-valued) channels. The expanded dense result is identical.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_ROW_BLOCK = 512          # rows per grid step; (RB, 256) f32 x 4 bufs ~2 MB


def _sortable_key(x):
    """IEEE-754 f32 -> order-isomorphic uint32 (radix-sort remap)."""
    b = jax.lax.bitcast_convert_type(x, jnp.uint32)
    return jnp.where(b >= jnp.uint32(0x80000000), ~b,
                     b | jnp.uint32(0x80000000))


def _kth_threshold(key, k: int):
    """Greedy MSB-first descent: the largest t with count(key >= t) >= k,
    i.e. exactly the k-th largest key per row. 32 unrolled steps."""
    rb = key.shape[0]
    t = jnp.zeros((rb, 1), jnp.uint32)
    for bit in range(31, -1, -1):
        cand = t | jnp.uint32(1 << bit)
        cnt = jnp.sum((key >= cand).astype(jnp.int32), axis=1,
                      keepdims=True)
        t = jnp.where(cnt >= k, cand, t)
    return t


def _cumsum_lanes(m_int, tri_ref=None):
    """Inclusive cumsum along the lane (channel) axis.

    Expressed as a matmul with the upper-triangular ones matrix so it maps
    to the MXU (values are 0/1 with row sums <= D <= 256, exact in a
    single bf16 pass for D <= 256, f32 accumulate): the VPU analog would
    be log2(D) shifted adds, but Mosaic lowers lane-axis cumsum poorly.
    """
    d = m_int.shape[1]
    if tri_ref is not None:
        tri = tri_ref[:]
    else:
        r = jax.lax.broadcasted_iota(jnp.int32, (d, d), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (d, d), 1)
        tri = (r <= c).astype(jnp.bfloat16)
    return jnp.dot(m_int.astype(jnp.bfloat16), tri,
                   preferred_element_type=jnp.float32)


def _exact_mask(x, k: int, tri_ref=None):
    """(RB, D) block -> exact top-k 0/1 mask (f32), first-index ties."""
    key = _sortable_key(x)
    t = _kth_threshold(key, k)
    gt = key > t
    n_gt = jnp.sum(gt.astype(jnp.int32), axis=1, keepdims=True)
    tie = key == t
    cum = _cumsum_lanes(tie.astype(jnp.int32), tri_ref)
    need = (k - n_gt).astype(jnp.float32)
    mask = jnp.logical_or(gt, jnp.logical_and(tie, cum <= need))
    return mask


def _maxk_kernel(x_ref, y_ref, mask_ref, *, k: int):
    x = x_ref[:]
    mask = _exact_mask(x, k).astype(x.dtype)
    y_ref[:] = x * mask
    mask_ref[:] = mask.astype(mask_ref.dtype)


def _cbsr_kernel(x_ref, o_ref, *, k: int):
    # One (RB, 2*KP) f32 output: value lanes [0, KP), selector lanes
    # [KP, 2*KP) carried as f32 (exact for D < 2**24); the wrapper splits
    # and casts. Mosaic constraints pinned by tools/probe_pallas_topk.py:
    # two 128-lane output refs crash tpu_compile_helper, and INTERLEAVING
    # the value/selector select-accumulate chains in one k-loop blows up
    # compilation at k=32 — two sequential loops compile and run.
    x = x_ref[:]
    rb, d = x.shape
    mask = _exact_mask(x, k)
    pos = _cumsum_lanes(mask.astype(jnp.int32))          # 1..k at kept
    pos = jnp.where(mask, pos, jnp.float32(0.0))
    iota_f = jax.lax.broadcasted_iota(jnp.int32, (rb, d), 1) \
        .astype(jnp.float32)
    half = o_ref.shape[1] // 2
    lane_k = jax.lax.broadcasted_iota(jnp.int32, (rb, half), 1)
    vals = jnp.zeros((rb, half), jnp.float32)
    for l in range(k):
        hit = pos == jnp.float32(l + 1)                  # (RB, D)
        v_l = jnp.sum(jnp.where(hit, x, 0.0), axis=1, keepdims=True)
        vals = jnp.where(lane_k == l, v_l, vals)
    sels = jnp.zeros((rb, half), jnp.float32)
    for l in range(k):
        hit = pos == jnp.float32(l + 1)
        s_l = jnp.sum(jnp.where(hit, iota_f, 0.0), axis=1, keepdims=True)
        sels = jnp.where(lane_k == l, s_l, sels)
    o_ref[:] = jnp.concatenate([vals, sels], axis=1)


def _cbsr_half_kernel(x_ref, o_ref, *, k: int, which: str):
    """One compaction chain only (values OR selectors) per pallas_call.

    The single-call _cbsr_kernel's two sequential k-loops blow up
    tpu_compile_helper at k=64 (reference benches k in {16,32,64},
    kernels/main.cu:53-54); splitting value and selector emission into
    two pallas_calls halves each program's select-accumulate chain, at
    the cost of recomputing the threshold mask (pure VPU, cheap next to
    the compile ceiling). Same math as _cbsr_kernel otherwise.
    """
    x = x_ref[:]
    rb, d = x.shape
    mask = _exact_mask(x, k)
    pos = _cumsum_lanes(mask.astype(jnp.int32))
    pos = jnp.where(mask, pos, jnp.float32(0.0))
    if which == "vals":
        src = x
    else:
        src = jax.lax.broadcasted_iota(jnp.int32, (rb, d), 1) \
            .astype(jnp.float32)
    w = o_ref.shape[1]
    lane_k = jax.lax.broadcasted_iota(jnp.int32, (rb, w), 1)
    out = jnp.zeros((rb, w), jnp.float32)
    for l in range(k):
        hit = pos == jnp.float32(l + 1)
        v_l = jnp.sum(jnp.where(hit, src, 0.0), axis=1, keepdims=True)
        out = jnp.where(lane_k == l, v_l, out)
    o_ref[:] = out


def _pad_rows(x, rb: int):
    v = x.shape[0]
    vp = -(-v // rb) * rb
    if vp != v:
        x = jnp.pad(x, ((0, vp - v), (0, 0)))
    return x, v


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def maxk_pallas(x: jax.Array, k: int, interpret: bool = False):
    """MaxK forward block kernel: (y, mask) with y = x * topk_mask(x).

    The mask comes back bf16 (0/1 exact) for the straight-through
    backward. Requires f32 x with D % 128 == 0; callers fall back to the
    XLA path otherwise (ops.maxk.maxk).
    """
    xp, v = _pad_rows(x, _ROW_BLOCK)
    vp, d = xp.shape
    grid = (vp // _ROW_BLOCK,)
    y, mask = pl.pallas_call(
        functools.partial(_maxk_kernel, k=k),
        grid=grid,
        in_specs=[pl.BlockSpec((_ROW_BLOCK, d), lambda i: (i, 0))],
        out_specs=(pl.BlockSpec((_ROW_BLOCK, d), lambda i: (i, 0)),
                   pl.BlockSpec((_ROW_BLOCK, d), lambda i: (i, 0))),
        out_shape=(jax.ShapeDtypeStruct((vp, d), x.dtype),
                   jax.ShapeDtypeStruct((vp, d), jnp.bfloat16)),
        interpret=interpret,
    )(xp)
    return y[:v], mask[:v]


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def cbsr_topk_pallas(x: jax.Array, k: int, interpret: bool = False):
    """TopK->CBSR block kernel: (values, selector), selector ascending.

    Same output contract as ops.cbsr.cbsr_topk. Requires f32 x with
    D % 128 == 0 and 1 <= k <= D. Mosaic compiles the single-call
    two-loop kernel up to k=32; k > 32 dispatches to TWO sequential
    pallas_calls (values pass + selector pass, _cbsr_half_kernel) whose
    halved select-accumulate chains keep tpu_compile_helper alive at
    k=64 — the one benchmarked k the round-3 kernel family lacked
    (reference kernels/main.cu:53-54). Measured on v5e at V=131k D=256:
    k=64 compiles, output bit-equal to cbsr_topk, 8.52 ms vs 4.04 XLA
    (the XLA path stays the production dispatch at large k). k=96/128
    (outside the reference's benchmarked set) still crash
    tpu_compile_helper even split — recorded closed. A fori_loop body
    compiles at any k but measures slower than the XLA sort
    (tools/probe_pallas_topk.py). Production cbsr_topk dispatches to
    lax.approx_max_k; this kernel is the measured first-index-exact
    alternative (3.21 ms at k=8 vs 3.45 approx / 6.31 sort, V=131k
    D=256 on v5e).
    """
    xp, v = _pad_rows(x, _ROW_BLOCK)
    vp, d = xp.shape
    grid = (vp // _ROW_BLOCK,)
    if k > 32:
        wk = -(-k // 128) * 128      # lane-padded per-output width
        halves = [pl.pallas_call(
            functools.partial(_cbsr_half_kernel, k=k, which=which),
            grid=grid,
            in_specs=[pl.BlockSpec((_ROW_BLOCK, d), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((_ROW_BLOCK, wk), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((vp, wk), jnp.float32),
            interpret=interpret,
        )(xp) for which in ("vals", "sels")]
        return halves[0][:v, :k], halves[1][:v, :k].astype(jnp.int32)
    w = -(-2 * k // 128) * 128       # lane-padded output width (>= 2k)
    out = pl.pallas_call(
        functools.partial(_cbsr_kernel, k=k),
        grid=grid,
        in_specs=[pl.BlockSpec((_ROW_BLOCK, d), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((_ROW_BLOCK, w), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((vp, w), jnp.float32),
        interpret=interpret,
    )(xp)
    return out[:v, :k], out[:v, w // 2:w // 2 + k].astype(jnp.int32)


# ---------------------------------------------------------------------------
# Production dispatch: Pallas on TPU, XLA elsewhere (see ops.maxk/ops.cbsr)
# ---------------------------------------------------------------------------

_FORCE = os.environ.get("MAXK_PALLAS_TOPK")   # "1" force on, "0" force off


def pallas_topk_supported(x, k: int) -> bool:
    """Static dispatch gate, evaluated at trace time."""
    if _FORCE == "0":
        return False
    if x.ndim != 2 or x.dtype != jnp.float32:
        return False
    if x.shape[1] % 128 != 0 or not (1 <= k <= x.shape[1]):
        return False
    if _FORCE == "1":
        return True
    return jax.default_backend() == "tpu"
