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

    def local(self, axis_name: str = GRAPH_AXIS) -> TiledGraph:
        """Inside shard_map: view this device's (1, ...) slice as a local
        TiledGraph that all-gathers its operand over `axis_name`."""
        return TiledGraph(
            cols=self.cols[0], vals=self.vals[0], lrow=self.lrow[0],
            block=self.block[0],
            n_nodes=self.rows_per_shard,
            n_edges=self.n_edges,
            row_block=self.row_block,
            edge_tile=self.edge_tile,
            n_rows_padded=self.rows_per_shard,
            gather_axis=axis_name,
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
                edge_tile: Optional[int] = None) -> ShardedTiles:
    """Partition a CSR graph's rows into n_shards equal blocks of tiles."""
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

    t_max = max(ts.cols.shape[0] for ts in shard_sets)

    def stack(attr, fill):
        out = []
        for ts in shard_sets:
            a = getattr(ts, attr)
            pad = t_max - a.shape[0]
            if pad:
                widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
                a = np.pad(a, widths, constant_values=fill)
            out.append(a)
        return jnp.asarray(np.stack(out))

    return ShardedTiles(
        cols=stack("cols", 0),
        vals=stack("vals", 0.0),
        lrow=stack("lrow", row_block),  # padding -> garbage row
        block=stack("block", 0),
        n_shards=n_shards,
        rows_per_shard=rows_per_shard,
        n_nodes_global=v,
        n_nodes_padded=v_pad,
        n_edges=csr.n_edges,
        row_block=row_block,
        edge_tile=edge_tile,
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
                 norms=("mean", "sum", "sym")) -> ShardedGraphBundle:
    def sg(c):
        return shard_graph(c, n_shards, row_block=row_block,
                           edge_tile=edge_tile)

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
