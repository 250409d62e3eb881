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


@struct.dataclass
class ShardedPartedTiles:
    """Column-parted variant of ShardedTiles (built by shard_graph when a
    shard's [local | halo] gather table exceeds the fast-gather row count
    — the distributed analog of ops.graph.PartedGraph).

    parts_local / parts_halo: per-part (cols, vals, lrow, block) tuples,
    each array stacked over shards with leading axis S and columns
    LOCALIZED to the part's table range. statics_local / statics_halo:
    per-part (row_block, edge_tile, n_rows_padded).
    """

    parts_local: tuple
    parts_halo: tuple
    send_idx: Optional[jax.Array]
    statics_local: tuple = struct.field(pytree_node=False)
    statics_halo: tuple = struct.field(pytree_node=False)
    n_shards: int = struct.field(pytree_node=False)
    rows_per_shard: int = struct.field(pytree_node=False)
    n_nodes_global: int = struct.field(pytree_node=False)
    n_nodes_padded: int = struct.field(pytree_node=False)
    n_edges: int = struct.field(pytree_node=False)
    halo_rows: int = struct.field(pytree_node=False)
    col_part_rows: int = struct.field(pytree_node=False)

    def local(self, axis_name: str = GRAPH_AXIS):
        """Inside shard_map: this device's slice as a HaloPartedGraph."""
        from maxk_tpu.parallel.halo import HaloSpec, HaloPartedGraph

        def tg(arrs, statics):
            cols, vals, lrow, block = arrs
            rb, et, nrp = statics
            return TiledGraph(
                cols=cols[0], vals=vals[0], lrow=lrow[0], block=block[0],
                n_nodes=self.rows_per_shard, n_edges=self.n_edges,
                row_block=rb, edge_tile=et, n_rows_padded=nrp)

        spec = None
        if self.send_idx is not None:
            spec = HaloSpec(send_idx=self.send_idx[0],
                            n_local=self.rows_per_shard,
                            halo_rows=self.halo_rows,
                            n_local_tiles=0,  # unused in parted mode
                            axis=axis_name)
        return HaloPartedGraph(
            local_parts=tuple(tg(a, st) for a, st in
                              zip(self.parts_local, self.statics_local)),
            halo_parts=tuple(tg(a, st) for a, st in
                             zip(self.parts_halo, self.statics_halo)),
            spec=spec,
            n_nodes=self.rows_per_shard,
            n_local=self.rows_per_shard,
            col_part_rows=self.col_part_rows)


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


def _part_sharded_tiles(tiles, send_np, halo_rows: int, row_block: int,
                        n_shards: int, rows_per_shard: int, part_rows: int,
                        v: int, v_pad: int, n_edges: int
                        ) -> ShardedPartedTiles:
    """Column-part each shard's remapped tiles (host side).

    tiles: per-shard (cols, vals, lrow, block) with columns in the
    [local | halo] table space (plan_halo output). Edges are re-tiled per
    column part of <= part_rows table rows so every device gather hits a
    table in the fast-descriptor regime; parts over the local range stay
    data-independent of the exchange (comm/compute overlap preserved).
    """
    from maxk_tpu.ops.tiling import choose_tile_sizes

    halo_table = n_shards * halo_rows
    n_lp = max(1, -(-rows_per_shard // part_rows))
    n_hp = -(-halo_table // part_rows) if halo_table else 0

    # [region][q][s] -> (grow, col_local, val)
    edges = {"local": [[None] * n_shards for _ in range(n_lp)],
             "halo": [[None] * n_shards for _ in range(n_hp)]}
    for s, (cols, vals, lrow, block) in enumerate(tiles):
        real = lrow < row_block
        grow = (block[:, None] * row_block + lrow)[real].astype(np.int64)
        col = cols[real].astype(np.int64)
        val = vals[real]
        for region, base, n_parts in (("local", 0, n_lp),
                                      ("halo", rows_per_shard, n_hp)):
            for q in range(n_parts):
                lo = base + q * part_rows
                hi = min(lo + part_rows,
                         base + (rows_per_shard if region == "local"
                                 else halo_table))
                m = (col >= lo) & (col < hi)
                edges[region][q][s] = (grow[m], (col[m] - lo), val[m])

    def build_region(region, n_parts):
        arrs, statics = [], []
        for q in range(n_parts):
            e_max = max(len(e[0]) for e in edges[region][q])
            rb, et = choose_tile_sizes(rows_per_shard, max(1, e_max))
            group = max(1, min(64, 65536 // et))
            sets = []
            for s in range(n_shards):
                grow, col, val = edges[region][q][s]
                cg = CSRGraph.from_coo(grow, col.astype(np.int32),
                                       rows_per_shard, values=val)
                sets.append(build_tiles_fast(cg.indptr, cg.indices,
                                             cg.values, row_block=rb,
                                             edge_tile=et))
            t_max = _round_up(max(ts.cols.shape[0] for ts in sets), group)

            def stack(i, fill):
                out = []
                for ts in sets:
                    a = ts[i]
                    pad = t_max - a.shape[0]
                    if pad:
                        widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
                        a = np.pad(a, widths, constant_values=fill)
                    out.append(a)
                return jnp.asarray(np.stack(out))

            arrs.append((stack(0, 0), stack(1, 0.0), stack(2, rb),
                         stack(3, 0)))
            statics.append((rb, et, sets[0].n_rows_padded))
        return tuple(arrs), tuple(statics)

    parts_local, statics_local = build_region("local", n_lp)
    parts_halo, statics_halo = build_region("halo", n_hp)
    return ShardedPartedTiles(
        parts_local=parts_local, parts_halo=parts_halo,
        send_idx=None if send_np is None else jnp.asarray(send_np),
        statics_local=statics_local, statics_halo=statics_halo,
        n_shards=n_shards, rows_per_shard=rows_per_shard,
        n_nodes_global=v, n_nodes_padded=v_pad, n_edges=n_edges,
        halo_rows=halo_rows, col_part_rows=part_rows)


def shard_graph(csr: CSRGraph, n_shards: int,
                row_block: Optional[int] = None,
                edge_tile: Optional[int] = None,
                halo: bool = True,
                col_part_rows: Optional[int] = None) -> ShardedTiles:
    """Partition a CSR graph's rows into n_shards equal blocks of tiles.

    halo=True (default) additionally plans the neighbor-selective halo
    exchange (parallel.halo): per-peer send lists, [local | halo] column
    remapping, and local-first tile ordering for comm/compute overlap.
    halo=False keeps the full all-gather execution mode.

    col_part_rows: None = auto (column-part each shard's tiles when its
    [local | halo] gather table would exceed the fast-gather row count —
    ops.graph.COL_PART_ROWS); 0 = never part. Parting requires halo mode.
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
        table_rows = rows_per_shard + n_shards * halo_rows
        if col_part_rows is None:
            from maxk_tpu.ops.graph import COL_PART_ROWS, _PART_THRESHOLD
            cpr = COL_PART_ROWS if table_rows > _PART_THRESHOLD else 0
        else:
            cpr = col_part_rows
        if cpr and table_rows > cpr:
            return _part_sharded_tiles(
                tiles, send_np, halo_rows, row_block, n_shards,
                rows_per_shard, cpr, v, v_pad, csr.n_edges)
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
                 halo: bool = True,
                 col_part_rows: Optional[int] = None) -> ShardedGraphBundle:
    def sg(c):
        return shard_graph(c, n_shards, row_block=row_block,
                           edge_tile=edge_tile, halo=halo,
                           col_part_rows=col_part_rows)

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
