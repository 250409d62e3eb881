"""Pallas tile-reduce kernel: the SpMM inner loop on the MXU with
VMEM-resident output blocks.

This is the TPU kernel analog of the reference's per-warp accumulation
loop (reference kernels/spmm_maxk.cu:62-105: shared-memory out_cache +
atomicAdd flush). One grid step processes one edge tile:

  P[r, e] = vals[e] * 1{lrow[e] == r}     (VPU one-hot; padding slots
                                           carry lrow == R, matching no r)
  out[block[t]] (+)= P @ xg[t]            (MXU)

The output BlockSpec is indexed by the scalar-prefetched tile->block map,
and tiles are sorted by block (ops.tiling invariant), so Pallas keeps each
output block in VMEM across its run of tiles and round-trips HBM once per
block — where the XLA scan path pays a dynamic-slice read+write per tile.
The running output is also threaded in as an aliased *input*: the first
tile of a block adds onto the carried value, so accumulation stays
correct when a block's tile run is split across chunked invocations, and
row blocks with no edges pass through untouched.

The HBM neighbor-row gather stays OUTSIDE the kernel (XLA `take`): Mosaic
cannot express an efficient HBM row gather (its dynamic_gather requires
operand/index/output shape equality, and per-row DMA issue costs ~10x the
measured 2.8 ns/row of XLA's gather), so spmm_pallas gathers per
super-chunk in XLA and runs this kernel over the chunk's tiles.

STATUS: numerically validated in interpret mode (tests/test_pallas_spmm.py
— including block runs split across chunk boundaries and never-visited
blocks). Mosaic compilation is blocked on the current jax/libtpu by a
relayout limitation: broadcasting a dynamically-selected (1, C) VMEM row
across sublanes fails with "Invalid relayout: Non-singleton logical
dimension is replicated in destination but not in source" for every
formulation tried (direct (R,C) compare, fori-chunked (R,512) compare,
broadcast_to vs implicit broadcasting).

Round-2 attempts (tools/probe_pallas.py) closed the remaining avenues:
- (R, C//128, 128) blocks with the one-hot broadcast over a NEW LEADING
  dim + multi-dim dot_general: 'tpu.matmul' rejects >1 contracting dims;
- per-128-lane-group (R, 128) one-hot from a lane vector: the lane->
  sublane replication is the same blocked relayout.

Round-2e ran the full candidate ladder on the live TPU (8 formulations,
tools/probe_pallas.py): every edge-dim-in-SUBLANES layout that sidesteps
the relayout rule — transposed one-hot via (C, T) metadata columns (C:
rejected by the block rule, last block dim must be 128-divisible or the
array dim), (T, C, 1) metadata (D), scalar-onehot scratch fill (E),
8x lane-replicated (T, C, 8) metadata (F), dynamic lane slice of a
full-array block (G) — is numerically correct in interpret mode
(bf16-level error) but crashes the Mosaic compiler itself
(tpu_compile_helper exit 1; diagnostics swallowed by the remote-compile
tunnel). Beyond the compiler wall the formulation is also structurally
bounded: the XLA production path fuses the HBM row gather INTO the
one-hot dot without materializing the gathered rows, while any Pallas
kernel runs after an XLA gather that must materialize its (E, D) output
— paying the full gather cost (~85% of kernel time) plus a second
read — so even a compiling tile-reduce starts from a deficit the saved
per-tile output round-trips cannot recover. The XLA path (ops.spmm) is
the production backend by measurement, not by default.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from maxk_tpu.ops.graph import TiledGraph


def _tile_reduce_kernel(block_ref, vals_ref, lrow_ref, xg_ref, acc_ref,
                        out_ref, *, row_block: int, edge_sub: int,
                        compute_dtype):
    t = pl.program_id(0)
    # vals/lrow live as whole-chunk VMEM blocks (a (1, C) block would break
    # the (8, 128) tiling rule); select this tile's row dynamically.
    # The one-hot build + matmul run over edge sub-chunks of `edge_sub`
    # to keep the P temporary small (a full (R, C) compare also trips a
    # Mosaic relayout limitation on broadcasting a (1, C) slice).
    c = lrow_ref.shape[1]
    d = xg_ref.shape[1]
    r_ids = jax.lax.broadcasted_iota(jnp.int32, (row_block, edge_sub), 0)

    def body(i, acc):
        sl = pl.ds(i * edge_sub, edge_sub)
        lrow = jnp.broadcast_to(lrow_ref[t, sl], (row_block, edge_sub))
        vals = jnp.broadcast_to(
            vals_ref[t, sl], (row_block, edge_sub)).astype(compute_dtype)
        p = jnp.where(lrow == r_ids, vals, jnp.zeros((), compute_dtype))
        xg = xg_ref[sl, :].astype(compute_dtype)
        return acc + jnp.dot(p, xg, preferred_element_type=jnp.float32)

    tile = jax.lax.fori_loop(
        0, c // edge_sub, body,
        jnp.zeros((row_block, d), jnp.float32))

    first = jnp.logical_or(t == 0, block_ref[t] != block_ref[t - 1])

    @pl.when(first)
    def _():
        # First tile of this block's run: fold in the carried value (the
        # pre-call accumulator — zeros on the first chunk, the running sum
        # when a block run spans a chunk boundary).
        out_ref[:] = acc_ref[:] + tile

    @pl.when(jnp.logical_not(first))
    def _():
        out_ref[:] = out_ref[:] + tile


def tile_reduce_pallas(block, vals, lrow, xg, acc,
                       row_block: int, compute_dtype=jnp.bfloat16,
                       interpret: bool = False) -> jax.Array:
    """Accumulate every tile's contribution onto `acc` (donated).

    Args:
      block: (T,) int32 tile -> row-block map, non-decreasing.
      vals/lrow: (T, C) edge tiles (lrow == row_block marks padding).
      xg: (T*C, D) gathered neighbor rows, tile-major.
      acc: (n_rows_padded, D) fp32 running output; rows of blocks with no
        tiles pass through unchanged.
    """
    t_tiles, c = vals.shape
    d = xg.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t_tiles,),
        in_specs=[
            pl.BlockSpec((t_tiles, c), lambda t, blk: (0, 0)),
            pl.BlockSpec((t_tiles, c), lambda t, blk: (0, 0)),
            pl.BlockSpec((c, d), lambda t, blk: (t, 0)),
            pl.BlockSpec((row_block, d), lambda t, blk: (blk[t], 0)),
        ],
        out_specs=pl.BlockSpec((row_block, d), lambda t, blk: (blk[t], 0)),
    )
    kernel = functools.partial(_tile_reduce_kernel, row_block=row_block,
                               edge_sub=min(c, 512),
                               compute_dtype=compute_dtype)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(acc.shape, jnp.float32),
        input_output_aliases={4: 0},   # acc (operand 4 incl. prefetch) -> out
        interpret=interpret,
    )(block, vals, lrow, xg, acc)


@functools.partial(jax.jit, static_argnames=(
    "row_block", "n_rows_padded", "compute_dtype_name", "group",
    "interpret"))
def _spmm_pallas_impl(cols, vals, lrow, block, x, row_block: int,
                      n_rows_padded: int, compute_dtype_name: str,
                      group: int, interpret: bool = False):
    compute_dtype = jnp.dtype(compute_dtype_name)
    d = x.shape[1]
    t_tiles, c = cols.shape
    x = x.astype(compute_dtype)

    gcols = cols.reshape(t_tiles // group, group * c)
    gvals = vals.reshape(t_tiles // group, group, c)
    glrow = lrow.reshape(t_tiles // group, group, c)
    gblock = block.reshape(t_tiles // group, group)

    def step(out, tile):
        tcols, tvals, tlrow, tblk = tile
        xg = jnp.take(x, tcols, axis=0, mode="clip")     # (group*C, D)
        out = tile_reduce_pallas(tblk, tvals, tlrow, xg, out,
                                 row_block, compute_dtype,
                                 interpret=interpret)
        return out, None

    out = jnp.zeros((n_rows_padded, d), dtype=jnp.float32)
    out, _ = jax.lax.scan(step, out, (gcols, gvals, glrow, gblock))
    return out


def spmm_pallas(g: TiledGraph, x: jax.Array, compute_dtype=None,
                interpret: bool = False) -> jax.Array:
    """Tiled SpMM through the Pallas tile-reduce kernel (API = ops.spmm)."""
    if compute_dtype is None:
        compute_dtype = jnp.bfloat16 if x.dtype == jnp.float32 else x.dtype
    if g.gather_axis is not None:
        x = jax.lax.all_gather(x, g.gather_axis, axis=0, tiled=True)
    from maxk_tpu.ops.spmm import _group_count
    group = _group_count(g.n_tiles, g.edge_tile)
    out = _spmm_pallas_impl(g.cols, g.vals, g.lrow, g.block, x,
                            g.row_block, g.n_rows_padded,
                            jnp.dtype(compute_dtype).name, group, interpret)
    return out[: g.n_nodes].astype(x.dtype)
