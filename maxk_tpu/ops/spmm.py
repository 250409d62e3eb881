"""SpMM: sparse (CSR/COO) adjacency times dense features, TPU-native.

Three execution strategies, all numerically validated against each other
(tests/test_spmm.py):

1. ``spmm_dense_oracle`` — densify A and matmul. Exact oracle for tests.
2. ``spmm_segment``      — gather + jax.ops.segment_sum (scatter-add).
   An unfused correctness oracle only, NOT the speedup baseline: XLA's
   scatter-add path is far below this hardware's SpMM capability.
3. ``spmm`` (tiled)      — the production path AND the library baseline
   for all speedup reporting: the role cuSPARSE SpMM plays in the
   reference benchmark (reference kernels/spmm_cusparse.cu:6-52) is "the
   best dense-operand SpMM the platform offers", which on this TPU stack
   is this kernel. lax.scan over row-block
   edge tiles; each tile gathers its neighbor feature rows and reduces them
   with a one-hot segment matmul on the MXU, then accumulates into its row
   block. Race-free by construction — the TPU answer to the reference's
   shared-memory accumulation + atomicAdd flush
   (reference kernels/spmm_maxk.cu:101-110).

The tiled path is the kernel consumed by model aggregation and by the
fused MaxK SpGEMM (maxk_tpu.ops.spgemm).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from maxk_tpu.ops.graph import CSRGraph, TiledGraph


# ---------------------------------------------------------------------------
# Oracles / baselines
# ---------------------------------------------------------------------------

def spmm_dense_oracle(csr: CSRGraph, x: np.ndarray) -> np.ndarray:
    """Dense numpy oracle: A @ x. For tests only (O(V^2) memory)."""
    v = csr.n_nodes
    a = np.zeros((v, v), dtype=np.float64)
    rows, cols = csr.to_coo()
    np.add.at(a, (rows, cols), csr.values.astype(np.float64))
    return (a @ np.asarray(x, np.float64)).astype(np.float32)


def spmm_coo(rows: jax.Array, cols: jax.Array, vals: jax.Array,
             x: jax.Array, n_nodes: int) -> jax.Array:
    """COO SpMM via gather + segment_sum (capability parity with the
    reference's cuSPARSE COO path, kernels/spmm_cusparse.cu:65-119)."""
    contrib = vals[:, None] * jnp.take(x, cols, axis=0)
    return jax.ops.segment_sum(contrib, rows, num_segments=n_nodes)


def spmm_segment(g: TiledGraph, x: jax.Array) -> jax.Array:
    """Unfused scatter-add oracle on the tiled layout.

    Gathers all neighbor rows tile-by-tile and scatter-adds into the output
    with global segment ids. Used for numerical validation; speedup
    reporting baselines against the tiled ``spmm`` (see module docstring).
    """
    from maxk_tpu.ops.graph import PartedGraph
    if isinstance(g, PartedGraph):
        raise TypeError("spmm_segment is the unparted oracle baseline; "
                        "build the graph with col_part_rows=0")
    if g.hub_ids is not None:
        raise TypeError("spmm_segment is the oracle baseline; build the "
                        "graph with hub_cols=0 (hub edges are not in the "
                        "tiles)")
    n_out = g.n_rows_padded
    d = x.shape[1]

    def step(out, tile):
        cols, vals, lrow, blk = tile
        xg = jnp.take(x, cols, axis=0)            # (C, D) gather
        contrib = vals[:, None] * xg
        grow = jnp.where(lrow >= g.row_block, n_out, blk * g.row_block + lrow)
        out = out.at[grow].add(contrib, mode="drop")
        return out, None

    out = jnp.zeros((n_out, d), dtype=x.dtype)
    out, _ = jax.lax.scan(step, out, (g.cols, g.vals, g.lrow, g.block))
    return out[: g.n_nodes]


# ---------------------------------------------------------------------------
# Production tiled SpMM (MXU one-hot segment matmul)
# ---------------------------------------------------------------------------

def _tile_reduce(xg: jax.Array, vals: jax.Array, lrow: jax.Array,
                 row_block: int, compute_dtype) -> jax.Array:
    """Reduce one edge tile to its (row_block, D) partial output.

    Builds P[r, e] = vals[e] * 1{lrow[e] == r} and computes P @ xg on the
    MXU. Row index row_block is the garbage row for padding slots; it is
    computed and discarded (branch-free padding).

    xg may be a tuple of column-half operands (the packed-gather path);
    the one-hot P is built once and shared across the halves, and the
    halves concatenate back to the (row_block, D) tile.
    """
    r_ids = jnp.arange(row_block + 1, dtype=lrow.dtype)
    halves = xg if isinstance(xg, tuple) else (xg,)
    p = jnp.where(lrow[None, :] == r_ids[:, None],
                  vals[None, :].astype(halves[0].dtype),
                  jnp.zeros((), halves[0].dtype))
    # On TPU, f32 matmuls default to one bf16 MXU pass; when the caller
    # asks for float32 compute, request full-precision passes. The packed
    # paths carry exactly-bf16-valued f32, so the single pass is exact.
    precision = ("highest" if jnp.dtype(compute_dtype) == jnp.float32
                 else "default")
    ts = [jnp.dot(p, h, preferred_element_type=jnp.float32,
                  precision=precision) for h in halves]
    t = ts[0] if len(ts) == 1 else jnp.concatenate(ts, axis=1)
    return t[:row_block]


def _pack_bf16_pairs(x: jax.Array) -> jax.Array:
    """(V, D) -> (V, D/2) int32, lane i holding bf16 bits of columns
    (i, i+D/2) in (low, high) halves."""
    d = x.shape[1]
    bits = jax.lax.bitcast_convert_type(
        x.astype(jnp.bfloat16), jnp.int16).astype(jnp.int32)
    lo, hi = bits[:, : d // 2], bits[:, d // 2:]
    return (lo & 0xFFFF) | (hi << 16)


def _unpack_bf16_pairs(xp: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Inverse of _pack_bf16_pairs, as two f32 column-half operands.

    A bf16 value's f32 bit pattern is its 16 bits shifted into the top
    half, so both halves unpack with one shift/mask + bitcast — pure
    lane-local VPU ops, no cross-lane relayout (the naive
    int32->bf16 bitcast appends a minor dim of 2, which forces a
    pathological (.., 128, 2) retiling — measured +23 ms at E=13M).
    """
    f_lo = jax.lax.bitcast_convert_type(xp << 16, jnp.float32)
    f_hi = jax.lax.bitcast_convert_type(xp & jnp.int32(-65536), jnp.float32)
    return f_lo, f_hi


def _pack_int8_quads(x8: jax.Array) -> jax.Array:
    """(V, D) int8 -> (V, D/4) int32; lane i holds columns
    (i, i+D/4, i+2D/4, i+3D/4) little-endian."""
    d = x8.shape[1]
    q = x8.astype(jnp.int32) & 0xFF
    qs = [q[:, j * (d // 4):(j + 1) * (d // 4)] << (8 * j) for j in range(4)]
    return qs[0] | qs[1] | qs[2] | qs[3]


def _unpack_int8_quads(xp: jax.Array) -> tuple[jax.Array, ...]:
    """Inverse of _pack_int8_quads, as four f32 column-quarter operands
    (sign-extended via arithmetic shifts — lane-local only)."""
    return tuple(
        ((xp << (24 - 8 * j)) >> 24).astype(jnp.float32) for j in range(4))


def _unpack_uint8_quads(xp: jax.Array) -> tuple[jax.Array, ...]:
    """Unsigned variant of _unpack_int8_quads (int32 in [0, 256)) — used
    for packed CBSR selectors, which are column indices, not values."""
    return tuple((xp >> (8 * j)) & 0xFF for j in range(4))


# Measured on v5e (tools/probe_gather.py / probe_split.py, round 2):
# ISOLATED random row-gathers show a ~565 M rows/s descriptor floor for
# rows of 2..96 int32 lanes and a ~4.8x collapse at 128 lanes — but the
# penalty does NOT transfer into this kernel: XLA's gather-into-matmul
# fusion runs the same (V, 128) take at ~2.7 ns/slot in situ
# (BENCH_KERNELS round 1), and splitting the table into two <=96-lane
# gathers measures SLOWER both isolated (10.0 vs 8.4 ns/row) and in
# kernel (16.7 vs 2.8 ns/slot, tools/probe_kernels.py). The splitting
# machinery is therefore OFF by default (threshold 128 = never for the
# packed table) and kept behind this env override for future toolchains.
import os as _os
_GATHER_MAX_LANES = int(_os.environ.get("MAXK_GATHER_MAX_LANES", "128"))

# lax.scan unroll factor for the tile scans. The roofline's ideal-overlap
# floor is ~2x below the serial model (gather/matmul/accumulate phases are
# serialized within a scan step); unrolling inlines N consecutive steps so
# XLA may hoist step i+1's gather (independent of the accumulator) over
# step i's matmuls. Probe: tools/probe_unroll.py.
_SCAN_UNROLL = int(_os.environ.get("MAXK_SCAN_UNROLL", "1"))


def _split_tables(xp: jax.Array) -> tuple[jax.Array, ...]:
    """Split a packed gather table into <=96-lane compact column chunks."""
    lanes = xp.shape[1]
    n = -(-lanes // _GATHER_MAX_LANES)
    if n == 1:
        return (xp,)
    chunk = -(-lanes // n)
    return tuple(
        jax.lax.optimization_barrier(
            jax.lax.slice_in_dim(xp, i, min(i + chunk, lanes), axis=1))
        for i in range(0, lanes, chunk))


def _chunk_operands(xgs, unpack, compute_dtype):
    """Gathered column chunks -> matmul operands in original column order.

    Each packed chunk unpacks to m column-group operands (bf16 pairs m=2,
    int8 quads m=4, unpacked m=1); the original column order across chunks
    is [group q of chunk j for q in range(m) for j in chunks] because
    packing interleaves groups at stride D/m in the full table.
    """
    if unpack is None:
        return tuple(x.astype(compute_dtype) for x in xgs)
    per_chunk = [unpack(x) for x in xgs]
    m = len(per_chunk[0])
    return tuple(per_chunk[j][q]
                 for q in range(m) for j in range(len(per_chunk)))


def _group_count(n_tiles: int, edge_tile: int, target_edges: int = 65536) -> int:
    """Tiles per gather group: ~64k edge slots per HBM gather.

    Measured on v5e: per-scan-step dispatch overhead makes 4k-edge gathers
    run at ~17 ns/row while 64k-edge gathers run at the hardware descriptor
    floor (~3.6 ns/row for 512-byte rows). Grouping tiles so each scan step
    issues one large gather recovers the 5x difference.

    The cap (64, see tiling.gather_group) bounds the UNROLLED per-group
    sub-tile loop in _scan_tiles (program size / compile time).
    """
    from maxk_tpu.ops.tiling import gather_group
    s = gather_group(edge_tile, target_edges)
    while n_tiles % s:
        s -= 1
    return s


def _pack_x(x, compute_dtype_name: str):
    """Pack the gather table into int32 lanes (see _spmm_tiled_impl note).

    Returns (packed_or_cast_x, per_column_scale_or_None, unpack_fn_or_None,
    compute_dtype).
    """
    quantized = compute_dtype_name == "int8"
    compute_dtype = jnp.bfloat16 if quantized else jnp.dtype(compute_dtype_name)
    d = x.shape[1]
    if quantized and d % 4 == 0:
        scale = (jnp.max(jnp.abs(x), axis=0) / 127.0 + 1e-12) \
            .astype(jnp.float32)                                   # (D,)
        x8 = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
        return _pack_int8_quads(x8), scale, _unpack_int8_quads, compute_dtype
    if jnp.dtype(compute_dtype) == jnp.bfloat16 and d % 2 == 0:
        return _pack_bf16_pairs(x), None, _unpack_bf16_pairs, compute_dtype
    return x.astype(compute_dtype), None, None, compute_dtype


def _scan_tiles(cols, vals, lrow, block, tables, out, compute_dtype,
                row_block: int, group: int, operands_fn, scale=None):
    """Scan tile gather groups, accumulating into `out`.

    `tables` is the tuple of <=96-lane column chunks of the packed gather
    table (_split_tables): one take per chunk per group keeps every gather
    row under the 512-byte width penalty (see _GATHER_MAX_LANES note).
    `operands_fn(raw_chunks)` turns one sub-tile's gathered chunks into the
    matmul operand(s) — unpack for dense tables, unpack+expand for CBSR.
    """
    t_tiles, c = cols.shape
    d = out.shape[1]
    gcols = cols.reshape(t_tiles // group, group * c)
    gvals = vals.reshape(t_tiles // group, group, c)
    glrow = lrow.reshape(t_tiles // group, group, c)
    gblock = block.reshape(t_tiles // group, group)

    def step(out, tile):
        tcols, tvals, tlrow, tblk = tile
        xgs = [jnp.take(t, tcols, axis=0, mode="clip")   # (group*C, lanes_i)
               .reshape(group, c, -1) for t in tables]
        # Unrolled sub-tile reduces: small MXU matmuls over slices of the
        # one big gather (tiles are sorted by row block, so consecutive
        # sub-tiles usually hit the same or adjacent output blocks).
        # Unpacking happens per sub-tile so it fuses into the matmul
        # operands instead of materializing a relayouted copy of the gather.
        for j in range(group):
            xj = operands_fn([x[j] for x in xgs])
            t = _tile_reduce(xj, tvals[j], tlrow[j], row_block,
                             compute_dtype)
            if scale is not None:
                t = t * scale[None, :]
            off = tblk[j] * row_block
            cur = jax.lax.dynamic_slice(out, (off, 0), (row_block, d))
            out = jax.lax.dynamic_update_slice(out, cur + t, (off, 0))
        return out, None

    unroll = _SCAN_UNROLL if t_tiles // group >= _SCAN_UNROLL > 1 else 1
    out, _ = jax.lax.scan(step, out, (gcols, gvals, glrow, gblock),
                          unroll=unroll)
    return out


def _spmm_scan(cols, vals, lrow, block, tables, out, scale, unpack,
               compute_dtype, row_block: int, group: int):
    """Dense-table scan: operands are the unpacked gathered chunks."""
    return _scan_tiles(
        cols, vals, lrow, block, tables, out, compute_dtype, row_block,
        group, lambda xgs: _chunk_operands(xgs, unpack, compute_dtype),
        scale=scale)


@partial(jax.jit, static_argnames=("row_block", "n_rows_padded",
                                   "compute_dtype_name", "group"))
def _spmm_tiled_impl(cols, vals, lrow, block, x,
                     row_block: int, n_rows_padded: int,
                     compute_dtype_name: str, group: int):
    # The HBM row-gather is the hot spot, and on v5e it is bound by the
    # number of gathered *elements* (~71 G elem/s) until the 140 GB/s byte
    # floor takes over — NOT by row descriptors. So rows are packed into
    # int32 lanes before the gather: 2x bf16 (lossless, 47 -> 36 ms at
    # V=131k/E=13M/D=256) or 4x int8 (opt-in lossy mode, -> 30 ms), and
    # unpacked by a free-ish bitcast feeding the MXU. The int8 per-column
    # scale commutes with the one-hot row-reduce (output columns are input
    # columns), so dequantization is a post-matmul row scale, never a
    # per-edge op.
    xp, scale, unpack, compute_dtype = _pack_x(x, compute_dtype_name)
    out = jnp.zeros((n_rows_padded, x.shape[1]), dtype=jnp.float32)
    return _spmm_scan(cols, vals, lrow, block, _split_tables(xp), out,
                      scale, unpack, compute_dtype, row_block, group)


@partial(jax.jit, static_argnames=("part_statics", "n_rows_padded",
                                   "compute_dtype_name", "col_part_rows"))
def _spmm_parted_impl(part_arrays, x, part_statics,
                      n_rows_padded: int, compute_dtype_name: str,
                      col_part_rows: int):
    """Column-partitioned SpMM: gather each part against a materialized
    <=32 MiB slice of the packed table (v5e fast-gather footprint — the
    measured rate is ~560 M rows/s under it and ~117 M rows/s for large
    tables; BASELINE.md), accumulating all parts into one output."""
    xp, scale, unpack, compute_dtype = _pack_x(x, compute_dtype_name)
    # Materialize the packed table ONCE before the per-part slicing.
    # Without this barrier XLA may fuse the table's producer into every
    # part's barrier-slice and recompute it per part — invisible when x
    # is a plain jit parameter, but the fused MaxK forward feeds
    # pack(cbsr_expand(...)) here, and at k=64 the duplicated expand
    # produced the suite's 2.3-2.8x forward cliff on the parted OGB
    # stand-ins (tools/probe_cliff.py: arxiv full 47.2 ms parted vs
    # 21.2 unparted at identical expand cost; fix -> ~26 ms).
    xp = jax.lax.optimization_barrier(xp)
    v = xp.shape[0]
    out = jnp.zeros((n_rows_padded, x.shape[1]), dtype=jnp.float32)
    for p, ((cols, vals, lrow, block), (row_block, group)) in enumerate(
            zip(part_arrays, part_statics)):
        lo = p * col_part_rows
        hi = min(lo + col_part_rows, v)
        x_p = jax.lax.slice_in_dim(xp, lo, hi, axis=0)
        # The barrier forces a materialized compact copy; a slice fused
        # into the gather keeps the large-table slow path.
        x_p = jax.lax.optimization_barrier(x_p)
        out = _spmm_scan(cols, vals, lrow, block, _split_tables(x_p), out,
                         scale, unpack, compute_dtype, row_block, group)
    return out


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _spmm_pair(g, g_t, x, compute_dtype_name):
    return spmm(g, x, compute_dtype=compute_dtype_name)


def _spmm_pair_fwd(g, g_t, x, compute_dtype_name):
    return spmm(g, x, compute_dtype=compute_dtype_name), (g_t,)


def _spmm_pair_bwd(compute_dtype_name, res, dy):
    (g_t,) = res
    return (None, None, spmm(g_t, dy, compute_dtype=compute_dtype_name))


_spmm_pair.defvjp(_spmm_pair_fwd, _spmm_pair_bwd)


def spmm_t(g, g_t, x: jax.Array,
           compute_dtype: Optional[jnp.dtype] = None) -> jax.Array:
    """spmm with an explicit-transpose backward: dx = A^T @ dy.

    Differentiating spmm() directly makes XLA transpose the edge gather
    into a scatter-add (the slow library path — tens of times the forward
    cost at scale); this custom VJP routes the cotangent through the same
    tiled forward kernel on the precomputed transpose instead. Models use
    it for every aggregation (the transposes live in GraphBundle).
    """
    if compute_dtype is None:
        compute_dtype = jnp.bfloat16 if x.dtype == jnp.float32 else x.dtype
    return _spmm_pair(g, g_t, x, _dtype_name(compute_dtype))


def _dtype_name(compute_dtype) -> str:
    return compute_dtype if isinstance(compute_dtype, str) \
        else jnp.dtype(compute_dtype).name


def _halo_dense_scans(g, d: int, tables_local, tables_full, scale, unpack,
                      cd) -> jax.Array:
    """Local-first two-phase scan shared by the dense and fused halo
    paths: local tiles scan against the local table (data-independent of
    the exchange, so XLA's scheduler can overlap them), halo tiles scan
    against the [local | received] table."""
    nl = g.halo.n_local_tiles
    out = jnp.zeros((g.n_rows_padded, d), dtype=jnp.float32)
    if nl:
        out = _spmm_scan(g.cols[:nl], g.vals[:nl], g.lrow[:nl],
                         g.block[:nl], tables_local, out, scale, unpack,
                         cd, g.row_block, _group_count(nl, g.edge_tile))
    if g.n_tiles > nl:
        out = _spmm_scan(g.cols[nl:], g.vals[nl:], g.lrow[nl:],
                         g.block[nl:], tables_full, out, scale, unpack,
                         cd, g.row_block,
                         _group_count(g.n_tiles - nl, g.edge_tile))
    return out


def _spmm_halo(g, x: jax.Array, compute_dtype) -> jax.Array:
    """Row-partitioned SpMM with neighbor-selective halo exchange.

    Runs inside shard_map (see _halo_dense_scans for the overlap
    structure). The exchange moves PACKED rows (bf16 pairs), i.e. half
    the dense f32 halo bytes.
    """
    from maxk_tpu.parallel.halo import halo_exchange
    spec = g.halo
    cdname = _dtype_name(compute_dtype)
    d = x.shape[1]
    if cdname == "int8":
        # Quantization scales must match the packed payload; exchange raw
        # rows and pack the combined table (no overlap in this mode).
        x_full = halo_exchange(x, spec)
        xp_full, scale, unpack, cd = _pack_x(x_full, cdname)
        tables_local = tables_full = _split_tables(xp_full)
    else:
        xp, scale, unpack, cd = _pack_x(x, cdname)
        tables_local = _split_tables(xp)
        tables_full = _split_tables(halo_exchange(xp, spec))
    out = _halo_dense_scans(g, d, tables_local, tables_full, scale,
                            unpack, cd)
    return out[: g.n_nodes].astype(x.dtype)


def _scan_col_parts(parts, table, size: int, part_rows: int, out, scale,
                    unpack, cd):
    """Scan column parts against materialized <= part_rows-row slices of
    `table` (the fast-descriptor gather regime; see PartedGraph note)."""
    for q, p in enumerate(parts):
        lo = q * part_rows
        sl = jax.lax.optimization_barrier(
            jax.lax.slice_in_dim(table, lo, min(lo + part_rows, size),
                                 axis=0))
        out = _spmm_scan(p.cols, p.vals, p.lrow, p.block, _split_tables(sl),
                         out, scale, unpack, cd, p.row_block,
                         _group_count(p.n_tiles, p.edge_tile))
    return out


def _spmm_halo_parted(g, x: jax.Array, compute_dtype) -> jax.Array:
    """Column-parted halo SpMM (parallel.halo.HaloPartedGraph).

    Per-device gather tables larger than the fast-gather row count are
    split into column parts at shard-build time; every gather here runs
    against a materialized compact slice. Local parts are
    data-independent of the exchange (overlappable with the all_to_all);
    halo parts scan against slices of the received rows.
    """
    from maxk_tpu.parallel.halo import halo_exchange
    cdname = _dtype_name(compute_dtype)
    d = x.shape[1]
    n_local = g.n_local
    recv = None
    if cdname == "int8":
        # Quantization scales must cover the exchanged rows too: exchange
        # raw rows, pack the combined table once (no overlap in this mode).
        x_full = halo_exchange(x, g.spec) if g.spec is not None else x
        xp_full, scale, unpack, cd = _pack_x(x_full, cdname)
        xp_local = jax.lax.slice_in_dim(xp_full, 0, n_local, axis=0)
        if g.spec is not None:
            recv = jax.lax.slice_in_dim(xp_full, n_local,
                                        xp_full.shape[0], axis=0)
    else:
        xp_local, scale, unpack, cd = _pack_x(x, cdname)
        if g.spec is not None:
            recv = jax.lax.slice_in_dim(
                halo_exchange(xp_local, g.spec), n_local,
                n_local + g.spec.n_shards * g.spec.halo_rows, axis=0)
    out = jnp.zeros((g.n_rows_padded, d), dtype=jnp.float32)
    out = _scan_col_parts(g.local_parts, xp_local, n_local,
                          g.col_part_rows, out, scale, unpack, cd)
    if recv is not None and g.halo_parts:
        out = _scan_col_parts(g.halo_parts, recv, recv.shape[0],
                              g.col_part_rows, out, scale, unpack, cd)
    return out[: g.n_nodes].astype(x.dtype)


def hub_matmul(hub_dense: jax.Array, x_rows: jax.Array,
               compute_dtype) -> jax.Array:
    """Hub-column contribution: hub_dense @ x_rows on the MXU.

    The (V, H) slab holds the edge values of every edge into a hub
    column (ops.graph.split_hub_columns), so this one matmul resolves
    all of them — no gather descriptors. f32 compute (validation) runs
    full-precision MXU passes; every other mode runs the standard
    single-bf16-pass matmul, the same rounding as the tiled path's
    packed-bf16 gather table.
    """
    cdname = _dtype_name(compute_dtype)
    if cdname == "float32":
        return jnp.dot(hub_dense, x_rows.astype(jnp.float32),
                       preferred_element_type=jnp.float32,
                       precision="highest")
    return jnp.dot(hub_dense.astype(jnp.bfloat16),
                   x_rows.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)


def _hub_term(g, x: jax.Array, compute_dtype) -> jax.Array:
    return hub_matmul(g.hub_dense, jnp.take(x, g.hub_ids, axis=0),
                      compute_dtype)


def spmm(g, x: jax.Array,
         compute_dtype: Optional[jnp.dtype] = None) -> jax.Array:
    """Tiled SpMM: out[r] = sum_{e in row r} vals[e] * x[cols[e]].

    Args:
      g: TiledGraph or PartedGraph (values already encode the aggregation
         normalization — see CSRGraph.normalize).
      x: (V, D) dense features.
      compute_dtype: matmul input dtype; defaults to bfloat16 on TPU
         (accumulation is always fp32 via preferred_element_type);
         "int8" selects the quantized-gather mode.
    """
    from maxk_tpu.ops.graph import PartedGraph
    if compute_dtype is None:
        compute_dtype = jnp.bfloat16 if x.dtype == jnp.float32 else x.dtype
    if getattr(g, "local_parts", None) is not None:
        if getattr(g, "hub_ids", None) is not None:
            raise TypeError("hub-densified graphs are single-device only; "
                            "halo-parted graphs must be built with hub off "
                            "(the slab term would be silently dropped)")
        return _spmm_halo_parted(g, x, compute_dtype)
    if getattr(g, "halo", None) is not None:
        if getattr(g, "hub_ids", None) is not None:
            raise TypeError("hub-densified graphs are single-device only; "
                            "halo graphs must be built with hub off "
                            "(the slab term would be silently dropped)")
        return _spmm_halo(g, x, compute_dtype)
    if g.gather_axis is not None:
        # Row-partitioned execution inside shard_map: fetch the full node
        # feature space over ICI, compute only the local row shard.
        if g.hub_ids is not None:
            raise TypeError("hub-densified graphs are single-device only "
                            "(the slab rows address the global node "
                            "space); build sharded graphs with hub off")
        x = jax.lax.all_gather(x, g.gather_axis, axis=0, tiled=True)
        g = g.replace(gather_axis=None)
    if isinstance(g, PartedGraph):
        part_arrays = tuple((p.cols, p.vals, p.lrow, p.block)
                            for p in g.parts)
        part_statics = tuple(
            (p.row_block, _group_count(p.n_tiles, p.edge_tile))
            for p in g.parts)
        out = _spmm_parted_impl(part_arrays, x, part_statics,
                                max(p.n_rows_padded for p in g.parts),
                                _dtype_name(compute_dtype),
                                g.col_part_rows)
    else:
        group = _group_count(g.n_tiles, g.edge_tile)
        out = _spmm_tiled_impl(g.cols, g.vals, g.lrow, g.block, x,
                               g.row_block, g.n_rows_padded,
                               _dtype_name(compute_dtype), group)
    out = out[: g.n_nodes]
    if g.hub_ids is not None:
        out = out + _hub_term(g, x, compute_dtype)
    return out.astype(x.dtype)
