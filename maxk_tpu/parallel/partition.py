"""1-D row partitioning of graphs + node arrays across a device mesh.

Each shard owns an equal, contiguous block of (padded) rows of the
adjacency and the matching rows of features/labels/masks. Column indices
stay GLOBAL: inside shard_map, ops all-gather the operand over the graph
axis (dense for plain SpMM, CBSR-compressed for the MaxK path) and compute
only their local row block. Gradient all-reduce falls out of
differentiating shard_map with replicated parameters.

This is the new capability vs the single-GPU reference (SURVEY.md
section 2.4); partitioning happens once on host at load time.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from maxk_tpu.ops.graph import CSRGraph, TiledGraph
from maxk_tpu.ops.tiling import build_tiles_fast
from maxk_tpu.models.models import GraphBundle
from maxk_tpu.parallel.mesh import GRAPH_AXIS


@struct.dataclass
class ShardedTiles:
    """Stacked per-shard tile metadata: leading axis = shard.

    cols/vals/lrow: (S, T, C); block: (S, T). Shards are padded to a common
    tile count T with all-padding tiles. Statics mirror TiledGraph plus the
    global node count.

    Halo mode (send_idx is not None): tile columns are remapped into each
    shard's [local rows | halo buffer] table space, tiles are ordered
    local-first with the split at n_local_tiles, and send_idx (S, S, H)
    carries each shard's per-peer send lists (parallel.halo). Ops then
    exchange only needed rows instead of all-gathering the node space.
    """

    cols: jax.Array
    vals: jax.Array
    lrow: jax.Array
    block: jax.Array
    n_shards: int = struct.field(pytree_node=False)
    rows_per_shard: int = struct.field(pytree_node=False)
    n_nodes_global: int = struct.field(pytree_node=False)
    n_nodes_padded: int = struct.field(pytree_node=False)
    n_edges: int = struct.field(pytree_node=False)
    row_block: int = struct.field(pytree_node=False)
    edge_tile: int = struct.field(pytree_node=False)
    send_idx: Optional[jax.Array] = None
    halo_rows: int = struct.field(pytree_node=False, default=0)
    n_local_tiles: int = struct.field(pytree_node=False, default=0)

    def local(self, axis_name: str = GRAPH_AXIS) -> TiledGraph:
        """Inside shard_map: view this device's (1, ...) slice as a local
        TiledGraph (halo exchange when planned, else full all-gather over
        `axis_name`)."""
        halo = None
        gather_axis = axis_name
        if self.send_idx is not None:
            from maxk_tpu.parallel.halo import HaloSpec
            halo = HaloSpec(send_idx=self.send_idx[0],
                            n_local=self.rows_per_shard,
                            halo_rows=self.halo_rows,
                            n_local_tiles=self.n_local_tiles,
                            axis=axis_name)
            gather_axis = None
        elif self.halo_rows == 0 and self.n_local_tiles == self.cols.shape[1]:
            # Fully local partition (no cross-shard edges): no collective.
            gather_axis = None
        return TiledGraph(
            cols=self.cols[0], vals=self.vals[0], lrow=self.lrow[0],
            block=self.block[0],
            n_nodes=self.rows_per_shard,
            n_edges=self.n_edges,
            row_block=self.row_block,
            edge_tile=self.edge_tile,
            n_rows_padded=self.rows_per_shard,
            gather_axis=gather_axis,
            halo=halo,
        )


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pad_nodes(arr: np.ndarray, n_nodes_padded: int,
              fill=0) -> np.ndarray:
    """Pad a (V, ...) node array to the partitioned node count."""
    pad = n_nodes_padded - arr.shape[0]
    if pad == 0:
        return arr
    widths = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, widths, constant_values=fill)


def shard_graph(csr: CSRGraph, n_shards: int,
                row_block: Optional[int] = None,
                edge_tile: Optional[int] = None,
                halo: bool = True) -> ShardedTiles:
    """Partition a CSR graph's rows into n_shards equal blocks of tiles.

    halo=True (default) additionally plans the neighbor-selective halo
    exchange (parallel.halo): per-peer send lists, [local | halo] column
    remapping, and local-first tile ordering for comm/compute overlap.
    halo=False keeps the full all-gather execution mode.
    """
    from maxk_tpu.ops.tiling import choose_tile_sizes
    if row_block is None or edge_tile is None:
        rb, et = choose_tile_sizes(csr.n_nodes, csr.n_edges)
        row_block = row_block or rb
        edge_tile = edge_tile or et

    v = csr.n_nodes
    rows_per_shard = _round_up(_round_up(v, n_shards) // n_shards, row_block)
    v_pad = rows_per_shard * n_shards

    # Extend indptr for padded (empty) rows.
    indptr = np.concatenate([
        csr.indptr,
        np.full(v_pad - v, csr.indptr[-1], dtype=csr.indptr.dtype)])

    shard_sets = []
    for s in range(n_shards):
        r0, r1 = s * rows_per_shard, (s + 1) * rows_per_shard
        e0, e1 = int(indptr[r0]), int(indptr[r1])
        local_indptr = indptr[r0:r1 + 1] - e0
        ts = build_tiles_fast(local_indptr, csr.indices[e0:e1],
                              csr.values[e0:e1], row_block=row_block,
                              edge_tile=edge_tile)
        assert ts.n_rows_padded == rows_per_shard
        shard_sets.append(ts)

    send_idx = None
    halo_rows = 0
    n_local_tiles = 0
    planned = False
    if halo and n_shards > 1:
        from maxk_tpu.parallel.halo import plan_halo
        tiles = [(ts.cols, ts.vals, ts.lrow, ts.block) for ts in shard_sets]
        tiles, send_np, halo_rows, n_local_tiles = plan_halo(
            tiles, row_block, n_shards, rows_per_shard)
        if send_np is not None:
            send_idx = jnp.asarray(send_np)
        planned = True
    else:
        tiles = [(ts.cols, ts.vals, ts.lrow, ts.block) for ts in shard_sets]
    t_max = max(t[0].shape[0] for t in tiles)

    def stack(i, fill):
        out = []
        for t in tiles:
            a = t[i]
            pad = t_max - a.shape[0]
            if pad:
                widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
                a = np.pad(a, widths, constant_values=fill)
            out.append(a)
        return jnp.asarray(np.stack(out))

    stacked = {"cols": stack(0, 0), "vals": stack(1, 0.0),
               "lrow": stack(2, row_block),  # padding -> garbage row
               "block": stack(3, 0)}
    if planned and send_idx is None:
        # plan_halo found zero cross-shard edges: columns are already
        # local per shard, so run with no collective at all.
        n_local_tiles = t_max

    return ShardedTiles(
        **stacked,
        n_shards=n_shards,
        rows_per_shard=rows_per_shard,
        n_nodes_global=v,
        n_nodes_padded=v_pad,
        n_edges=csr.n_edges,
        row_block=row_block,
        edge_tile=edge_tile,
        send_idx=send_idx,
        halo_rows=halo_rows,
        n_local_tiles=n_local_tiles,
    )


@struct.dataclass
class ShardedGraphBundle:
    """Sharded analog of models.GraphBundle (entries None when unused)."""

    g_mean: Optional[ShardedTiles]
    g_mean_t: Optional[ShardedTiles]
    g_sum: Optional[ShardedTiles]
    g_sum_t: Optional[ShardedTiles]
    g_sym: Optional[ShardedTiles]
    g_sym_t: Optional[ShardedTiles]

    @property
    def _any(self) -> ShardedTiles:
        for g in (self.g_mean, self.g_sum, self.g_sym):
            if g is not None:
                return g
        raise ValueError("empty ShardedGraphBundle")

    @property
    def n_nodes_padded(self) -> int:
        return self._any.n_nodes_padded

    @property
    def n_nodes_global(self) -> int:
        return self._any.n_nodes_global

    @property
    def rows_per_shard(self) -> int:
        return self._any.rows_per_shard


def shard_bundle(csr: CSRGraph, n_shards: int,
                 row_block: Optional[int] = None,
                 edge_tile: Optional[int] = None,
                 norms=("mean", "sum", "sym"),
                 halo: bool = True) -> ShardedGraphBundle:
    def sg(c):
        return shard_graph(c, n_shards, row_block=row_block,
                           edge_tile=edge_tile, halo=halo)

    built = {}
    for norm in norms:
        base = csr.normalize("none" if norm == "sum" else norm)
        built[f"g_{norm}"] = sg(base)
        built[f"g_{norm}_t"] = sg(base.transpose())
    return ShardedGraphBundle(
        g_mean=built.get("g_mean"), g_mean_t=built.get("g_mean_t"),
        g_sum=built.get("g_sum"), g_sum_t=built.get("g_sum_t"),
        g_sym=built.get("g_sym"), g_sym_t=built.get("g_sym_t"))


def local_bundle(sharded: ShardedGraphBundle,
                 axis_name: str = GRAPH_AXIS) -> GraphBundle:
    """Inside shard_map: per-device GraphBundle view (models use it
    unchanged — ops all-gather over `axis_name` internally)."""
    def loc(g):
        return None if g is None else g.local(axis_name)

    return GraphBundle(
        g_mean=loc(sharded.g_mean), g_mean_t=loc(sharded.g_mean_t),
        g_sum=loc(sharded.g_sum), g_sum_t=loc(sharded.g_sum_t),
        g_sym=loc(sharded.g_sym), g_sym_t=loc(sharded.g_sym_t))


def shard_node_array(arr: np.ndarray, sharded: ShardedTiles | int,
                     fill=0) -> np.ndarray:
    """Pad a (V, ...) node array to the sharded padded length."""
    n_pad = sharded if isinstance(sharded, int) else sharded.n_nodes_padded
    return pad_nodes(np.asarray(arr), n_pad, fill=fill)
