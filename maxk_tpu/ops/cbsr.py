"""CBSR — compressed balanced sparse row format for MaxK activations.

A (V, D) row-wise top-k-sparse matrix is stored as:
  values:   (V, k) float32 — the kept entries, selector-sorted per row
  selector: (V, k) int32   — their column indices, ascending per row

This mirrors the reference's CBSR ((V,k) float data + (V,k) uint8 selector,
reference kernels/main.cu:120-146, cuda_kernel_bindings.cpp:320-340) with
two deliberate fixes: exact fp32 values (no uint8 round trip) and int32
selectors (no D <= 256 cap). For multi-chip halo exchange the selector can
be packed to int8/int16 on the wire when D allows (maxk_tpu.parallel).

Selectors are kept sorted ascending so the layout is canonical: packing is
deterministic, and expanded results are invariant to top-k tie ordering.

TPU implementation note: every indexed elementwise op here is expressed as
a compare-reduction over the channel axis rather than a scatter/gather —
measured on v5e, XLA scatter and take_along_axis cost 25-80 ms at
V=131k while the fused compare-reduce costs 2-5 ms. The k*D-compare
pattern is the VPU analog of the reference's warp-ballot compaction
(kernels/maxk_kernel.cu:68-94), with no uint8 quantization.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


_TOPK_IMPL = os.environ.get("MAXK_TOPK_IMPL")  # "sort" | "approx" | None


def _use_approx_topk(x, k: int) -> bool:
    """TPU dispatch gate for the PartialReduce-based top-k (trace-time)."""
    if _TOPK_IMPL == "sort":
        return False
    if x.ndim != 2 or not jnp.issubdtype(x.dtype, jnp.floating):
        return False
    if not (1 <= k <= x.shape[1]):
        return False
    if _TOPK_IMPL == "approx":
        return True
    return jax.default_backend() == "tpu"


def cbsr_topk(x: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """Compact each row's top-k entries into CBSR (values, selector).

    The (index, value) pairs are co-sorted by index with a multi-operand
    lax.sort (take_along_axis-free).

    On TPU the top-k itself runs through ``lax.approx_max_k`` with
    ``recall_target=1.0`` (the hardware PartialReduce op, exact results)
    — measured 6.3-6.5 ms -> 2.9-4.1 ms at (131072, 256), k in 8..64 on
    v5e versus ``lax.top_k``, which lowers to a full per-row variadic
    sort. Values are bit-identical; when equal values straddle the
    k-boundary the two may keep different (equal-valued) tied columns —
    the reference's own torch.topk leaves CUDA tie order unspecified, so
    first-index ties (the lax.top_k path, kept as the CPU/oracle route
    and forceable with MAXK_TOPK_IMPL=sort) are this framework's
    canonicalization, not a reference contract.
    """
    if _use_approx_topk(x, k):
        vals, idx = jax.lax.approx_max_k(x, k, recall_target=1.0,
                                         aggregate_to_topk=True)
    else:
        vals, idx = jax.lax.top_k(x, k)
    selector, values = jax.lax.sort((idx.astype(jnp.int32), vals),
                                    dimension=1, num_keys=1)
    return values, selector


# Max channels per fused expand chain (see cbsr_expand: XLA schedules
# longer in-context chains catastrophically next to the parted SpMM).
_EXPAND_CHUNK = int(os.environ.get("MAXK_EXPAND_CHUNK", "32"))


def cbsr_expand(values: jax.Array, selector: jax.Array, dim: int) -> jax.Array:
    """Expand CBSR back to a dense (V, dim) matrix (zeros elsewhere).

    dense[i, d] = sum_l values[i, l] * 1{selector[i, l] == d}; top-k
    selectors are unique per row so the sum has at most one live term.
    Accumulated channel-by-channel so peak memory is O(V*D) even when
    executed eagerly (a broadcast (V, k, D) intermediate OOMs 16 GB HBM at
    V=262k, k=64, D=256).

    k > 32 is evaluated in barrier-fenced 32-channel chunks: XLA
    schedules the k-unrolled compare-select fusion catastrophically when
    its consumer is the column-parted SpMM at k >= 64 — the same fusion
    that runs 6.4 ms isolated took ~28 ms in-graph on the arxiv
    stand-in, the round-4 suite's 2.3-2.8x forward cliff on the parted
    OGB rows (tools/probe_cliff.py; the HLO census in probe_cliff3.py
    shows no duplication, so it is an XLA scheduling effect of the long
    chain). Fencing each <=32-channel sub-expand behind an
    optimization_barrier keeps every fused chain at the size XLA
    handles well; the chunk-sum adds one (V, dim) add per extra chunk.
    (A Pallas expand kernel was measured as the alternative: slower
    than XLA at k <= 32 — 1.7 vs 0.9 ms at k=8 — and Mosaic-crashed at
    the k >= 64 sizes that matter; tools/probe_expand.py.)
    """
    k = values.shape[1]
    if k == 64:
        # Measured XLA anomaly, pinned by tools/probe_cliff5.py on the
        # arxiv stand-in (parted consumer, v5e): the fused forward runs
        # 48.1 ms at k=64 but 24-28 ms at k in {48, 56, 72, 80, 96} —
        # and the SAME 64 live channels padded to width 72 run 25.96 ms.
        # The trigger is the (V, 64)-wide operand pair (half a 128-lane
        # tile), not channel count or chain length. Dead channels carry
        # value 0 (contribute nothing wherever their selector points),
        # cost ~0.8 ms of extra compare-selects, and remove the 2.3-2.8x
        # k=64 suite cliff on the parted OGB stand-ins.
        values = jnp.pad(values, ((0, 0), (0, 8)))
        selector = jnp.pad(selector, ((0, 0), (0, 8)))
        k = 72

    def chunk_expand(v_c, s_c):
        kc = v_c.shape[1]
        iota = jnp.arange(dim, dtype=s_c.dtype)[None, :]
        out = jnp.zeros((v_c.shape[0], dim), v_c.dtype)
        for l in range(kc):
            out = out + jnp.where(s_c[:, l:l + 1] == iota, v_c[:, l:l + 1],
                                  jnp.zeros((), v_c.dtype))
        return out

    if k <= _EXPAND_CHUNK:
        return chunk_expand(values, selector)
    out = None
    for c0 in range(0, k, _EXPAND_CHUNK):
        c1 = min(c0 + _EXPAND_CHUNK, k)
        part = jax.lax.optimization_barrier(
            chunk_expand(values[:, c0:c1], selector[:, c0:c1]))
        out = part if out is None else out + part
    return out


def cbsr_gather(dense: jax.Array, selector: jax.Array) -> jax.Array:
    """Sample a dense (V, D) matrix at each row's selector positions -> (V, k).

    This is the sampling step of the backward SSpMM: the reference computes
    it with per-element global atomicAdd scatter
    (kernels/spmm_maxk_backward.cu:92-103); here it is a one-hot
    compare-reduction over the channel axis, one kept channel at a time
    (O(V*D) peak memory, same rationale as cbsr_expand).

    On TPU with lane-aligned shapes this dispatches to the Pallas block
    kernel (ops.pallas_gather): XLA schedules the k-unrolled
    compare-reduce consumer catastrophically against a column-parted
    SpMM producer at >=64 live output channels (s24_ogbn_products
    backward k=64: 3941 ms composed vs 1371 ms SpMM + 225 ms gather in
    isolation — the round-4 suite's backward cliff on the parted OGB
    stand-ins; invariant to chunking/barriers/padding/output grouping,
    tools/probe_bwd_cliff*.py). The XLA fallback below evaluates k > 32
    in barrier-fenced <=32-channel chunks (bounded fusion chains, the
    cbsr_expand discipline — necessary but NOT sufficient against the
    parted-producer cliff).
    """
    from maxk_tpu.ops.pallas_gather import (cbsr_gather_pallas,
                                            pallas_gather_supported)
    if pallas_gather_supported(dense, selector):
        return cbsr_gather_pallas(dense, selector)
    k = selector.shape[1]
    dim = dense.shape[1]
    iota = jnp.arange(dim, dtype=selector.dtype)[None, :]

    def chunk_gather(d, s_c):
        cols = []
        for l in range(s_c.shape[1]):
            hit = s_c[:, l:l + 1] == iota                      # (V, D)
            cols.append(jnp.where(hit, d,
                                  jnp.zeros((), d.dtype)).sum(axis=1))
        # Output carries the input dtype (each sum has exactly one live
        # term). No f32 widening: at products scale + k=64 the widened
        # output's extra 0.5 GiB alone re-armed the remat cliff the
        # bf16 hand-off exists to dodge (measured 1514 -> 3869 ms).
        return jnp.stack(cols, axis=1)

    if k <= _EXPAND_CHUNK:
        return chunk_gather(dense, selector)
    dense = jax.lax.optimization_barrier(dense)
    parts = []
    for c0 in range(0, k, _EXPAND_CHUNK):
        c1 = min(c0 + _EXPAND_CHUNK, k)
        parts.append(jax.lax.optimization_barrier(
            chunk_gather(dense, selector[:, c0:c1])))
    return jnp.concatenate(parts, axis=1)


def cbsr_nbytes(n_nodes: int, k: int, dim: int,
                value_dtype=jnp.float32) -> tuple[int, int]:
    """(cbsr_bytes, dense_bytes) for traffic/roofline accounting.

    Selector width is the narrowest integer type that can index dim.
    """
    val_b = jnp.dtype(value_dtype).itemsize
    sel_b = 1 if dim <= 256 else (2 if dim <= 65536 else 4)
    return n_nodes * k * (val_b + sel_b), n_nodes * dim * val_b
