"""Fused MaxK SpGEMM: y = A @ MaxK_k(x) with a sampled-sparse backward.

One jax.custom_vjp replaces the reference's entire kernel sandwich
(TopK kernel -> CBSR pack -> forward SpGEMM kernel -> backward SSpMM kernel
-> Python scatter loop; reference utils/models.py:61-149,
kernels/spmm_maxk.cu, kernels/spmm_maxk_backward.cu):

Single-chip (mask path — the production route, see _mask_path):
forward:  y_s, mask = MaxK(x, k)            # Pallas threshold kernel on TPU
          y         = A @ y_s               # tiled MXU SpMM (ops.spmm)
backward: dx        = mask * (A^T @ dy)     # one transpose SpMM + multiply

Distributed / CBSR-consuming (halo wire format, API-parity entry points):
forward:  (v, s) = cbsr_topk(x, k)          # exact fp32 TopK -> CBSR
          y      = A @ expand(v, s)         # tiled MXU SpMM (ops.spmm)
backward: dS     = A^T @ dy                 # transpose-side tiled SpMM
          g_cbsr = dS[i, s[i, l]]           # sampled at TopK positions —
                                            # the reference SSpMM's (V, k)
                                            # output layout, race-free
          dx     = expand(g_cbsr, s)        # == topk_mask * (A^T @ dy)

The two backwards are the same function: expand(gather(dS, s), s) ==
mask * dS because top-k selectors are exactly the mask's support. The
mask path skips the CBSR pack/expand round trip (k compare-select
passes over (V, D) each way) — measured 282.7 -> 211.7 ms (1.34x) on
the SAGE 4x256 training step at V=131k, E=6.5M, k=32 on v5e.

Design notes (TPU-first, not a port):
- The reference expands CBSR per *edge* inside the forward kernel
  (kernels/spmm_maxk.cu:66-98) because GPU lanes scatter to shared memory
  cheaply. TPU VPUs cannot scatter, so expansion happens once per *node*
  (V*k*D work instead of E*k*D) and the SpMM runs on the expanded k-sparse
  matrix through the MXU. CBSR remains the storage and wire format; its
  per-edge traffic advantage is realized in the distributed halo exchange
  (maxk_tpu.parallel) rather than in single-chip HBM gathers.
- The backward needs A^T. The reference silently reuses the forward CSR
  (valid only for symmetric graphs); here the transpose is precomputed once
  at graph load and passed explicitly, so directed graphs are correct too.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from maxk_tpu.ops.graph import TiledGraph
from maxk_tpu.ops.cbsr import cbsr_topk, cbsr_expand, cbsr_gather
from maxk_tpu.ops.spmm import (
    spmm, _scan_tiles, _split_tables, _group_count, _pack_bf16_pairs,
    _unpack_bf16_pairs, _pack_int8_quads, _unpack_int8_quads,
    _unpack_uint8_quads, _dtype_name)


# ---------------------------------------------------------------------------
# CBSR-operand forward: gather (V, ~3k/4) packed CBSR lanes per edge
# ---------------------------------------------------------------------------
#
# The reference forward kernel reads exactly k values + k selector bytes
# per edge (kernels/spmm_maxk.cu:66-98) instead of the expanded dense row.
# The TPU analog measured on v5e (tools/probe_gather.py): the random
# row-gather has a ~565 M rows/s descriptor floor for any row of <=96
# int32 lanes, while the expanded-dense row (128 packed lanes, 512 B)
# gathers ~4.8x slower. Packing each node's CBSR into ONE combined int32
# row — k/2 lanes of bf16 value pairs + k/4 lanes of uint8 selector quads
# (<= 96 lanes up to k=128) — costs a single descriptor per edge where
# the dense path costs two; the expansion back to (C, D) happens inside
# the tile with k fused compare-selects on the VPU.
#
# MEASURED OUTCOME (tools/probe_kernels.py, v5e, V=131k E=26M D=256): the
# per-tile expand costs ~1.5 ns/edge per kept channel in situ (k=8: 18.2,
# k=16: 30.7, k=32: 59.3 ns/edge vs dense-path ~3.2), so this formulation
# LOSES to node-level expansion + dense-operand SpMM at every benchmarked
# k — the VPU compare-select expand is the TPU analog of the GPU
# shared-memory scatter, but ~50x more expensive per element. It is kept
# as an opt-in (CBSR_GATHER_MODE/cbsr_gather=True) for API parity with
# the reference's CBSR-consuming kernel and for the measurement record;
# the production fused forward uses node-level expansion, whose
# k-sparsity is instead exploited by the per-ROW-scaled int8 gather table
# (see _rowscale_int8_table below) and by the CBSR halo wire format.

_CBSR_GATHER_MAX_K = 128     # 3k/4 lanes must fit one <=96-lane gather row

# Opt-in switch for the CBSR-operand gather formulation (measured slower;
# see note above).
CBSR_GATHER_MODE = False


def _cbsr_pad_k(values: jax.Array, selector: jax.Array):
    """Pad k up to a multiple of 4 (bf16-pair + uint8-quad packing unit).
    Padding entries carry value 0, so their expansion contributes nothing."""
    k = values.shape[1]
    k4 = -(-k // 4) * 4
    if k4 != k:
        values = jnp.pad(values, ((0, 0), (0, k4 - k)))
        selector = jnp.pad(selector, ((0, 0), (0, k4 - k)))
    return values, selector, k4


def _cbsr_pack_table(values: jax.Array, selector: jax.Array) -> jax.Array:
    """(V, k) f32 values + (V, k) int32 selectors -> (V, 3k/4) int32 rows:
    lanes [0, k/2) bf16 value pairs (l, l+k/2), lanes [k/2, 3k/4) uint8
    selector quads (l, l+k/4, l+2k/4, l+3k/4). Requires dim <= 256."""
    vp = _pack_bf16_pairs(values)
    sp = _pack_int8_quads(selector)
    return jnp.concatenate([vp, sp], axis=1)


def _cbsr_operands_fn(k: int, dim: int, compute_dtype, f32_tables: bool):
    """Build the per-sub-tile operand function: unpack gathered CBSR rows
    and expand them to a dense (C, dim) matmul operand.

    Expansion is k fused compare-select-adds against a dim-iota — the VPU
    analog of the reference's per-edge shared-memory scatter
    (kernels/spmm_maxk.cu:66-98); top-k selectors are unique per row so
    adds never collide (k-padding entries add zeros).
    """
    def operands_fn(xgs):
        if f32_tables:
            v = xgs[0] if len(xgs) == 2 else jnp.concatenate(
                xgs[:-1], axis=1)                          # (C, k) f32
            s = jnp.concatenate(_unpack_uint8_quads(xgs[-1]), axis=1)
        else:
            xg = xgs[0]                                    # (C, 3k/4)
            lo, hi = _unpack_bf16_pairs(xg[:, : k // 2])
            v = jnp.concatenate([lo, hi], axis=1)          # (C, k), l-order
            s = jnp.concatenate(
                _unpack_uint8_quads(xg[:, k // 2:]), axis=1)
        v = v.astype(compute_dtype)
        it = jax.lax.broadcasted_iota(jnp.int32, (1, dim), 1)
        out = jnp.zeros((v.shape[0], dim), compute_dtype)
        for l in range(k):
            out = out + jnp.where(s[:, l:l + 1] == it, v[:, l:l + 1],
                                  jnp.zeros((), compute_dtype))
        return (out,)

    return operands_fn


@partial(jax.jit, static_argnames=("row_block", "n_rows_padded", "dim", "k",
                                   "group", "compute_dtype_name"))
def _spgemm_cbsr_impl(cols, vals, lrow, block, values, selector,
                      row_block: int, n_rows_padded: int, dim: int, k: int,
                      group: int, compute_dtype_name: str):
    cd = jnp.dtype(compute_dtype_name)
    f32 = cd == jnp.float32
    if f32:
        # Validation layout: exact f32 value lanes + packed selectors
        # (two+ descriptors per edge — correctness path, not the fast one).
        tables = _split_tables(values) + (_pack_int8_quads(selector),)
    else:
        tables = (_cbsr_pack_table(values, selector),)
    out = jnp.zeros((n_rows_padded, dim), dtype=jnp.float32)
    return _scan_tiles(cols, vals, lrow, block, tables, out, cd,
                       row_block, group,
                       _cbsr_operands_fn(k, dim, cd, f32))


# ---------------------------------------------------------------------------
# Row-scaled int8 gather table: the production fast path for the fused
# forward. The expanded MaxK matrix is k-sparse per row with all kept
# values of similar magnitude (they are the row's top-k), so a per-ROW
# int8 scale quantizes it accurately — the same 8-bit representation the
# reference's own CBSR pipeline uses (maxk_kernel.cu uint8 activations,
# cuda_kernel_bindings.cpp:211-231), minus its k<19 crash and with the
# scale carried exactly. The gather row is dim/4 int8-quad lanes + 1 f32
# scale lane (65 lanes at D=256): ONE descriptor per edge at the measured
# ~565 M rows/s floor, where the dense bf16 row (128 lanes, 512 B) pays
# the ~4.8x width penalty (tools/probe_gather.py). Dequantization is a
# (C,1) broadcast multiply fused into the matmul operand — no per-edge
# expand.
# ---------------------------------------------------------------------------

def _rowscale_int8_table(values: jax.Array, selector: jax.Array,
                         dim: int) -> jax.Array:
    x = cbsr_expand(values, selector, dim)               # (V, dim), k-sparse
    scale = jnp.max(jnp.abs(values), axis=1) / 127.0 + 1e-30
    q = jnp.clip(jnp.round(x / scale[:, None]), -127, 127).astype(jnp.int8)
    qp = _pack_int8_quads(q)                             # (V, dim/4)
    s_lane = jax.lax.bitcast_convert_type(
        scale.astype(jnp.float32), jnp.int32)
    return jnp.concatenate([qp, s_lane[:, None]], axis=1)


@partial(jax.jit, static_argnames=("row_block", "n_rows_padded", "dim",
                                   "group"))
def _rowscale_impl(cols, vals, lrow, block, table,
                   row_block: int, n_rows_padded: int, dim: int, group: int):
    """Scan for the row-scaled int8 table.

    The gathered operand stays the PURE shift-unpack int8-quad pattern
    (the formulation XLA fuses into the dot at full rate — applying the
    scale on the operand measured 2.7x slower, tools/probe_kernels.py);
    the per-gathered-row scale is folded into the one-hot P instead:
    t[r, d] = sum_e (P[r,e] * s_e) * q[e, d], an (R+1, C) VPU multiply.
    """
    from maxk_tpu.ops.spmm import _tile_reduce
    t_tiles, c = cols.shape
    group_c = group * c
    gcols = cols.reshape(t_tiles // group, group_c)
    gvals = vals.reshape(t_tiles // group, group, c)
    glrow = lrow.reshape(t_tiles // group, group, c)
    gblock = block.reshape(t_tiles // group, group)

    def step(out, tile):
        tcols, tvals, tlrow, tblk = tile
        xg = jnp.take(table, tcols, axis=0, mode="clip")
        xg = xg.reshape(group, c, -1)
        for j in range(group):
            data = xg[j][:, : dim // 4]
            scale = jax.lax.bitcast_convert_type(
                xg[j][:, dim // 4], jnp.float32)               # (C,)
            ops = tuple(q.astype(jnp.bfloat16)
                        for q in _unpack_int8_quads(data))
            t = _tile_reduce(ops, tvals[j] * scale, tlrow[j], row_block,
                             jnp.bfloat16)
            off = tblk[j] * row_block
            cur = jax.lax.dynamic_slice(out, (off, 0), (row_block, dim))
            out = jax.lax.dynamic_update_slice(out, cur + t, (off, 0))
        return out, None

    out = jnp.zeros((n_rows_padded, dim), dtype=jnp.float32)
    out, _ = jax.lax.scan(step, out, (gcols, gvals, glrow, gblock))
    return out


def _hub_term_cbsr(g, values: jax.Array, selector: jax.Array, dim: int,
                   compute_dtype) -> jax.Array:
    """Hub-column contribution for the CBSR-operand formulations: expand
    only the H hub rows and resolve them via the slab matmul (the hub
    edges are not in g's tiles — see ops.graph.split_hub_columns)."""
    from maxk_tpu.ops.spmm import hub_matmul
    x_hub = cbsr_expand(jnp.take(values, g.hub_ids, axis=0),
                        jnp.take(selector, g.hub_ids, axis=0), dim)
    return hub_matmul(g.hub_dense, x_hub, compute_dtype)


def _spgemm_rowscale_int8(g, values: jax.Array, selector: jax.Array,
                          dim: int) -> jax.Array:
    from maxk_tpu.ops.graph import PartedGraph
    table = _rowscale_int8_table(values, selector, dim)
    # Materialize once before per-part slicing (same recompute hazard as
    # ops.spmm._spmm_parted_impl — see the barrier note there).
    table = jax.lax.optimization_barrier(table)
    hub = (_hub_term_cbsr(g, values, selector, dim, jnp.bfloat16)
           if g.hub_ids is not None else None)
    if isinstance(g, PartedGraph):
        out = None
        v = table.shape[0]
        for p_idx, p in enumerate(g.parts):
            lo = p_idx * g.col_part_rows
            t_p = jax.lax.optimization_barrier(jax.lax.slice_in_dim(
                table, lo, min(lo + g.col_part_rows, v), axis=0))
            part = _rowscale_impl(p.cols, p.vals, p.lrow, p.block, t_p,
                                  p.row_block, p.n_rows_padded, dim,
                                  _group_count(p.n_tiles, p.edge_tile))
            # Parts may differ in n_rows_padded (per-part tile sizing);
            # only the first n_nodes rows are real.
            part = part[: g.n_nodes]
            out = part if out is None else out + part
        return out if hub is None else out + hub
    out = _rowscale_impl(g.cols, g.vals, g.lrow, g.block, table,
                         g.row_block, g.n_rows_padded, dim,
                         _group_count(g.n_tiles, g.edge_tile))[: g.n_nodes]
    return out if hub is None else out + hub


def _cbsr_group(n_tiles: int, edge_tile: int) -> int:
    """Gather-group size for the CBSR path, capped at 8 sub-tiles: the
    expand unrolls group*k ops per scan step, and an uncapped group (up to
    64 for small edge tiles) makes XLA compile time explode. At the
    production C=8192 the cap coincides with the measured-optimal 64k-edge
    gather group."""
    s = min(_group_count(n_tiles, edge_tile), 8)
    while n_tiles % s:
        s -= 1
    return s


def _spgemm_cbsr_gather(g, values: jax.Array, selector: jax.Array,
                        dim: int, compute_dtype) -> jax.Array:
    """Dispatch the CBSR-operand forward over TiledGraph / PartedGraph."""
    from maxk_tpu.ops.graph import PartedGraph
    values, selector, k = _cbsr_pad_k(values, selector)
    cdname = _dtype_name(compute_dtype)
    hub = (_hub_term_cbsr(g, values, selector, dim, compute_dtype)
           if g.hub_ids is not None else None)
    if isinstance(g, PartedGraph):
        out = None
        v = values.shape[0]
        for p_idx, p in enumerate(g.parts):
            lo = p_idx * g.col_part_rows
            hi = min(lo + g.col_part_rows, v)
            v_p = jax.lax.optimization_barrier(
                jax.lax.slice_in_dim(values, lo, hi, axis=0))
            s_p = jax.lax.optimization_barrier(
                jax.lax.slice_in_dim(selector, lo, hi, axis=0))
            part = _spgemm_cbsr_impl(
                p.cols, p.vals, p.lrow, p.block, v_p, s_p,
                p.row_block, p.n_rows_padded, dim, k,
                _cbsr_group(p.n_tiles, p.edge_tile), cdname)[: g.n_nodes]
            out = part if out is None else out + part
        return out if hub is None else out + hub
    out = _spgemm_cbsr_impl(
        g.cols, g.vals, g.lrow, g.block, values, selector,
        g.row_block, g.n_rows_padded, dim, k,
        _cbsr_group(g.n_tiles, g.edge_tile), cdname)[: g.n_nodes]
    return out if hub is None else out + hub


def spgemm_forward_cbsr(g: TiledGraph, values: jax.Array,
                        selector: jax.Array, dim: int,
                        compute_dtype=None) -> jax.Array:
    """Forward SpGEMM consuming CBSR directly: A @ expand(values, selector).

    API parity with the reference's stateless kernel entry point
    ``maxk_cuda_kernels.spmm_maxk_forward`` (cuda_kernel_bindings.cpp:42-104).

    Execution strategies (v5e numbers in BASELINE.md's formulation study):
    - default (bf16/f32): node-level expansion + dense-operand SpMM —
      the measured optimum (0.92-0.98x of dense tiled SpMM; XLA fuses
      the 128-lane packed gather into the one-hot dot).
    - compute_dtype="int8_rowscale": node-level expansion quantized to
      int8 with a per-row scale folded into the one-hot reduce — a single
      <=96-lane gather descriptor per edge. Measured SLOWER (0.61x: the
      narrower row buys nothing against the row-count-bound gather unit
      and the scale handling costs fusion). Kept as a measured opt-in;
      numerics match the reference's own uint8 CBSR kernel path
      (maxk_kernel.cu quantizes activations to uint8,
      cuda_kernel_bindings.cpp:211-231) and validate under the reference
      tolerance (mean err < 1e-3).
    - CBSR_GATHER_MODE: the CBSR-operand tile-expand formulation
      (measured 0.28-0.92x; kept for parity + the record).

    Row-partitioned execution (g.gather_axis set): the all-gather moves the
    COMPRESSED (V, k) values + selectors over ICI instead of the (V, D)
    dense matrix — k*(4+4)/D*4 of the dense halo bytes. This is the
    distributed payoff of the CBSR format (SURVEY.md section 2.4).
    """
    if compute_dtype is None:
        compute_dtype = jnp.bfloat16
    rowscale = compute_dtype == "int8_rowscale"
    if getattr(g, "local_parts", None) is not None:
        return _spgemm_cbsr_halo_parted(
            g, values, selector, dim,
            jnp.bfloat16 if rowscale else compute_dtype)
    if getattr(g, "halo", None) is not None:
        return _spgemm_cbsr_halo(
            g, values, selector, dim,
            jnp.bfloat16 if rowscale else compute_dtype)
    if g.gather_axis is not None:
        values = jax.lax.all_gather(values, g.gather_axis, axis=0, tiled=True)
        selector = jax.lax.all_gather(selector, g.gather_axis, axis=0,
                                      tiled=True)
        g = g.replace(gather_axis=None)
    k = values.shape[1]
    if rowscale and dim % 4 == 0:
        return _spgemm_rowscale_int8(g, values, selector, dim)
    if CBSR_GATHER_MODE and dim <= 256 and k <= _CBSR_GATHER_MAX_K \
            and not rowscale and jnp.dtype(compute_dtype) != jnp.int8:
        return _spgemm_cbsr_gather(g, values, selector, dim, compute_dtype)
    if rowscale:
        compute_dtype = jnp.bfloat16
    return spmm(g, cbsr_expand(values, selector, dim),
                compute_dtype=compute_dtype)


def _cbsr_wire_exchange(values: jax.Array, selector: jax.Array,
                        spec, dim: int, cd) -> tuple[jax.Array, jax.Array]:
    """One halo exchange of the CBSR operand, returning the RECEIVED
    (values, selector) rows.

    Packed wire (bf16 compute, dim <= 256, k within the packers' range):
    bf16 value pairs + uint8 selector quads — 3k/4 int32 lanes per row.
    Exact wire (f32 validation / dim > 256 / large k): raw values with
    the selector bitcast alongside, still one collective and still
    k-compressed relative to dense rows.
    """
    from maxk_tpu.parallel.halo import halo_exchange
    n_local = values.shape[0]
    k0 = values.shape[1]
    if cd != jnp.float32 and dim <= 256 and k0 <= _CBSR_GATHER_MAX_K:
        values_p, selector_p, k = _cbsr_pad_k(values, selector)
        table = _cbsr_pack_table(values_p, selector_p)   # (n_local, 3k/4)
        recv = halo_exchange(table, spec)[n_local:]
        lo, hi = _unpack_bf16_pairs(recv[:, : k // 2])
        v_r = jnp.concatenate([lo, hi], axis=1)
        s_r = jnp.concatenate(_unpack_uint8_quads(recv[:, k // 2:]), axis=1)
        return v_r, s_r
    if values.dtype.itemsize == 4 and selector.dtype.itemsize == 4:
        # Single collective: selector lanes bitcast to the value dtype and
        # concatenated (lossless 32-bit reinterpret both ways).
        wire = jnp.concatenate(
            [values, jax.lax.bitcast_convert_type(selector, values.dtype)],
            axis=1)
        recv = halo_exchange(wire, spec)[n_local:]
        v_r = recv[:, :k0]
        s_r = jax.lax.bitcast_convert_type(recv[:, k0:], selector.dtype)
        return v_r, s_r
    v_r = halo_exchange(values, spec)[n_local:]
    s_r = halo_exchange(selector, spec)[n_local:]
    return v_r, s_r


def _spgemm_cbsr_halo(g, values: jax.Array, selector: jax.Array,
                      dim: int, compute_dtype) -> jax.Array:
    """Halo-mode fused forward: exchange the CBSR wire format, expand at
    node level, run the dense two-phase scan.

    Per-pair payload is H * 3k/4 int32 lanes (bf16 value pairs + uint8
    selector quads) instead of H * D f32 — the k-scaled halo compression
    that is the distributed payoff of MaxK (SURVEY.md section 2.4).
    Expansion happens ONCE per received row (node level), never per edge
    (the per-tile expand formulation measured ~1.5 ns/edge/channel —
    see the module note); the expanded tables then run the same
    local-first overlap structure as ops.spmm._spmm_halo. For float32
    compute (validation) the exchange carries exact f32 values.
    """
    from maxk_tpu.ops.spmm import _pack_x, _halo_dense_scans
    spec = g.halo
    cd = jnp.dtype(compute_dtype)
    x_local = cbsr_expand(values, selector, dim)
    v_r, s_r = _cbsr_wire_exchange(values, selector, spec, dim, cd)
    x_recv = cbsr_expand(v_r, s_r, dim)
    x_full = jnp.concatenate([x_local, x_recv], axis=0)
    cdname = _dtype_name(jnp.bfloat16 if cd == jnp.int8 else cd)
    xp_l, scale_l, unpack, cdt = _pack_x(x_local, cdname)
    xp_f, _, _, _ = _pack_x(x_full, cdname)
    out = _halo_dense_scans(g, dim, _split_tables(xp_l), _split_tables(xp_f),
                            scale_l, unpack, cdt)
    return out[: g.n_nodes]


def _spgemm_cbsr_halo_parted(g, values: jax.Array, selector: jax.Array,
                             dim: int, compute_dtype) -> jax.Array:
    """Column-parted halo-mode fused forward (HaloPartedGraph).

    The exchange carries the CBSR wire format (bf16 value pairs + uint8
    selector quads — the k-scaled halo compression of _spgemm_cbsr_halo);
    expansion happens once per received row, and the scans gather against
    materialized <= col_part_rows-row slices of the local / received
    tables (the fast-descriptor regime, like ops.spmm._spmm_halo_parted).
    """
    from maxk_tpu.ops.spmm import _pack_x, _scan_col_parts
    spec = g.spec
    cd = jnp.dtype(compute_dtype)
    n_local = values.shape[0]
    x_local = cbsr_expand(values, selector, dim)
    v_r = s_r = None
    if spec is not None:
        v_r, s_r = _cbsr_wire_exchange(values, selector, spec, dim, cd)
    cdname = _dtype_name(jnp.bfloat16 if cd == jnp.int8 else cd)
    xp_l, scale, unpack, cdt = _pack_x(x_local, cdname)
    # Materialize the expanded+packed tables once before the per-part
    # slicing (recompute hazard — see ops.spmm._spmm_parted_impl note).
    xp_l = jax.lax.optimization_barrier(xp_l)
    out = jnp.zeros((g.n_rows_padded, dim), dtype=jnp.float32)
    out = _scan_col_parts(g.local_parts, xp_l, n_local, g.col_part_rows,
                          out, scale, unpack, cdt)
    if v_r is not None and g.halo_parts:
        xp_r, _, _, _ = _pack_x(cbsr_expand(v_r, s_r, dim), cdname)
        xp_r = jax.lax.optimization_barrier(xp_r)
        out = _scan_col_parts(g.halo_parts, xp_r, xp_r.shape[0],
                              g.col_part_rows, out, scale, unpack, cdt)
    return out[: g.n_nodes]


def sspmm_sampled(g_t: TiledGraph, dy: jax.Array, selector: jax.Array,
                  compute_dtype=None) -> jax.Array:
    """Backward SSpMM: grad sampled at TopK positions, output (V, k).

    g_cbsr[i, l] = sum_{j in N_in(i)} A[j, i] * dy[j, selector[i, l]]

    API parity with ``maxk_cuda_kernels.spmm_maxk_backward``
    (cuda_kernel_bindings.cpp:107-161); g_t is the precomputed transpose.

    Under the default bf16 compute contract (this op's SpMM multiplies
    in bf16; only the tile accumulate is f32) the dense intermediate is
    handed to the sampler in bf16. Besides matching the stated
    precision, this is what keeps suite giants off XLA's remat cliff:
    at products scale + k=64 the program peak sits close enough to the
    16 GiB HBM budget that the remat pass re-runs the packed-table
    fusions inside 5 of the 19 part-scan loops (traced 540 ms/loop vs
    71 clean — a +2.5 s cliff invariant to every consumer-side
    formulation, tools/probe_bwd_cliff*.py / probe_bwd_trace.py);
    dropping the 2.5 GiB f32 intermediate to 1.25 GiB bf16 clears the
    trigger (measured clean). compute_dtype=float32 (validation) keeps
    the exact f32 hand-off.
    """
    ds = spmm(g_t, dy, compute_dtype=compute_dtype)
    cd = jnp.bfloat16 if compute_dtype is None else jnp.dtype(compute_dtype)
    if cd != jnp.float32:
        ds = ds.astype(jnp.bfloat16)
    return cbsr_gather(ds, selector)


def _resolve_cd(compute_dtype_name: Optional[str], backward: bool = False):
    """Forward may carry the "int8_rowscale" mode string; the backward
    SSpMM always computes in bf16 (gradient rows are dense, so the
    per-row-scale argument does not apply to them)."""
    if compute_dtype_name is None:
        return None
    if compute_dtype_name == "int8_rowscale":
        return jnp.bfloat16 if backward else compute_dtype_name
    return jnp.dtype(compute_dtype_name)


def _mask_path(g, compute_dtype_name: Optional[str]) -> bool:
    """True when the fused op can run mask-based, skipping CBSR entirely.

    Algebraic identities on the single-chip path:
      forward:  expand(cbsr_topk(x, k)) == x * topk_mask(x, k) == MaxK(x)
      backward: expand(gather(dS, s), s) == topk_mask * dS,  dS = A^T @ dy
    so the CBSR pack -> expand round trip (k compare-select passes over
    (V, D) each way, plus the top-k itself) collapses to the MaxK
    nonlinearity (the Pallas threshold kernel on TPU, ops.pallas_topk —
    1.9 ms vs 6.5 ms top_k + 2 ms expand at V=131k, D=256, k=32 on v5e)
    and one (V, D) multiply in the backward. CBSR stays load-bearing
    where it is the wire format (halo exchange, gather_axis all-gather)
    and in the CBSR-consuming opt-in formulations.
    """
    import os
    if os.environ.get("MAXK_FUSED_MASK") == "0":   # A/B + triage opt-out
        return False
    return (getattr(g, "local_parts", None) is None
            and getattr(g, "halo", None) is None
            and getattr(g, "gather_axis", None) is None
            and compute_dtype_name != "int8_rowscale"
            and not CBSR_GATHER_MODE)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _fused(k: int, compute_dtype_name: Optional[str],
           g: TiledGraph, g_t: TiledGraph, x: jax.Array) -> jax.Array:
    if _mask_path(g, compute_dtype_name):
        from maxk_tpu.ops.maxk import _forward as _maxk_forward
        y_s, _ = _maxk_forward(x, k)
        return spmm(g, y_s, compute_dtype=_resolve_cd(compute_dtype_name))
    v, s = cbsr_topk(x, k)
    return spgemm_forward_cbsr(g, v, s, x.shape[1],
                               _resolve_cd(compute_dtype_name))


def _fused_fwd(k, compute_dtype_name, g, g_t, x):
    if _mask_path(g, compute_dtype_name):
        from maxk_tpu.ops.maxk import _forward as _maxk_forward
        y_s, mask = _maxk_forward(x, k)
        y = spmm(g, y_s, compute_dtype=_resolve_cd(compute_dtype_name))
        return y, (mask, None, g_t, x.shape[1])
    v, s = cbsr_topk(x, k)
    y = spgemm_forward_cbsr(g, v, s, x.shape[1],
                            _resolve_cd(compute_dtype_name))
    return y, (None, s, g_t, x.shape[1])


def _fused_bwd(k, compute_dtype_name, res, dy):
    cd = _resolve_cd(compute_dtype_name, backward=True)
    mask, s, g_t, dim = res
    if mask is not None:
        ds = spmm(g_t, dy, compute_dtype=cd)
        return (None, None, ds * mask.astype(ds.dtype))
    g_cbsr = sspmm_sampled(g_t, dy, s, cd)
    dx = cbsr_expand(g_cbsr, s, dim)
    return (None, None, dx)  # no cotangents for the graph pytrees


_fused.defvjp(_fused_fwd, _fused_bwd)


def maxk_spgemm(g: TiledGraph, g_t: TiledGraph, x: jax.Array, k: int,
                compute_dtype: Optional[jnp.dtype] = None) -> jax.Array:
    """Fused y = A @ MaxK_k(x) with custom VJP.

    Graphs are formal (non-differentiated) arguments of the custom-VJP
    primitive — not closure captures — so the op is safe under shard_map
    and other tracing transforms.

    Args:
      g:   tiled adjacency (values encode the aggregation normalization).
      g_t: tiled transpose of g (pass g itself for symmetric graphs with
           symmetric values, e.g. unnormalized sum aggregation).
      x:   (V, D) node features.
      k:   number of channels kept per node (1 <= k <= D).
    """
    cdname = None if compute_dtype is None else _dtype_name(compute_dtype)
    return _fused(k, cdname, g, g_t, x)
