"""Pallas CBSR sampling kernel: dense (V, D) -> (V, k) at selector cols.

The sampling step of the backward SSpMM (the reference scatters it with
per-element global atomicAdd, kernels/spmm_maxk_backward.cu:92-103; the
XLA formulation is ops.cbsr.cbsr_gather's per-channel compare-reduce).

Why Pallas: when the dense operand is the output of the column-parted
transpose SpMM, XLA schedules the k-unrolled compare-reduce consumer
catastrophically at >=64 live output channels — measured on the
products stand-in (V=2.45M, 19 parts, v5e): composed backward 3941 ms
at k=64 vs 1371 ms SpMM + 225 ms for the SAME gather isolated, an
~11x gather blow-up that is invariant to chunking, barriers, selector
padding, and output grouping (tools/probe_bwd_cliff*.py: two separate
(V, 32) outputs cliff identically; 48 live channels are clean; the
same 64 chains merged into 32 output channels are clean; bf16 input is
clean). A pallas_call is opaque to that scheduling: each row block is
read into VMEM once and all channel sums run on the VPU.

One pallas_call covers k <= 64 (Mosaic compiles the 64-long select
chain, as ops/pallas_topk.py's split compaction already proves). The
single call matters beyond compile limits: TWO pallas_calls both
consuming the parted-SpMM output re-trigger the producer — measured
composed delta 2476 ms with 2x32-channel calls vs clean with one call
— i.e. the cliff is XLA re-running the 19-part scan once per
unfusable consumer of its 2.5 GiB temp (the same census that showed
two separate XLA (V, 32) outputs cliff while their fusable sum is
clean). k > 64 (outside the reference's benchmarked set,
kernels/main.cu:53-54) still chunks at 64 and accepts the recompute.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_ROW_BLOCK = 512
_CHUNK = 64              # channels per pallas_call: one call must cover
                         # k=64 (a second consumer of a parted-SpMM
                         # temp re-runs the scan — module note)


def _gather_kernel(x_ref, s_ref, o_ref, *, kc: int):
    x = x_ref[:]                                         # (RB, D)
    s = s_ref[:]                                         # (RB, kc) int32
    rb, d = x.shape
    iota_d = jax.lax.broadcasted_iota(jnp.int32, (rb, d), 1)
    w = o_ref.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (rb, w), 1)
    out = jnp.zeros((rb, w), jnp.float32)
    for l in range(kc):
        hit = s[:, l:l + 1] == iota_d
        v_l = jnp.sum(jnp.where(hit, x, jnp.zeros((), x.dtype))
                      .astype(jnp.float32), axis=1, keepdims=True)
        out = jnp.where(lane == l, v_l, out)
    o_ref[:] = out


@functools.partial(jax.jit, static_argnames=("interpret",))
def cbsr_gather_pallas(dense: jax.Array, selector: jax.Array,
                       interpret: bool = False) -> jax.Array:
    """out[i, l] = dense[i, selector[i, l]], computed blockwise in VMEM.

    Same contract as ops.cbsr.cbsr_gather (top-k selectors are unique
    per row; padding selectors simply sample a column). Requires
    f32/bf16 dense with D % 128 == 0; callers fall back to the XLA
    formulation otherwise. Output is f32 (the sum accumulates exactly
    one term per channel, so dtype only widens).
    """
    k = selector.shape[1]
    v, d = dense.shape
    # Chains over 32 channels halve the row block: the 64-chain's Mosaic
    # stack allocation at 512 rows is 17.1 MiB vs the 16 MiB scoped-VMEM
    # limit (measured compile failure on v5e).
    rb = _ROW_BLOCK if k <= 32 else _ROW_BLOCK // 2
    # No host-level padding: a padded copy of the dense operand doubles
    # its HBM footprint (2.5 GiB at products scale), and the lane-padded
    # selector doubles its own — enough extra pressure that XLA's remat
    # pass starts recomputing the parted SpMM's packed tables inside 5
    # of the 19 part-scan loops (traced: those whiles run 540 ms instead
    # of 71 ms — the real body of the composed k=64 cliff). Pallas
    # handles the ragged final row block and sub-128 selector lanes.
    grid = (-(-v // rb),)
    chunks = []
    for c0 in range(0, k, _CHUNK):
        kc = min(_CHUNK, k - c0)
        s_c = selector[:, c0:c0 + kc]
        out = pl.pallas_call(
            functools.partial(_gather_kernel, kc=kc),
            grid=grid,
            in_specs=[pl.BlockSpec((rb, d), lambda i: (i, 0)),
                      pl.BlockSpec((rb, kc), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((rb, kc), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((v, kc), jnp.float32),
            interpret=interpret,
        )(dense, s_c)
        chunks.append(out)
    if len(chunks) == 1:
        return chunks[0]
    return jnp.concatenate(chunks, axis=1)


_FORCE = os.environ.get("MAXK_PALLAS_GATHER")   # "1" force on, "0" off


def pallas_gather_supported(dense, selector) -> bool:
    """Static dispatch gate, evaluated at trace time.

    f32 only: the custom call constrains its operand to plain row-major
    layout, so a tiled-layout producer (the parted SpMM's output) costs
    a full-size conversion copy — at products scale that extra buffer
    alone re-arms the remat cliff this kernel exists to dodge (measured:
    bf16 hand-off + XLA chunked gather composes clean at +146 ms, while
    bf16 + Pallas re-cliffs at +2523 ms). sspmm_sampled therefore hands
    bf16 to the XLA formulation and only f32 (validation / standalone
    use, where Pallas wins 225 -> 135 ms at products scale) lands here.
    """
    if _FORCE == "0":
        return False
    if dense.ndim != 2 or selector.ndim != 2:
        return False
    if dense.dtype != jnp.float32:
        return False
    if selector.dtype != jnp.int32:
        return False
    if dense.shape[1] % 128 != 0 or selector.shape[1] > dense.shape[1]:
        return False
    if _FORCE == "1":
        return True
    return jax.default_backend() == "tpu"
