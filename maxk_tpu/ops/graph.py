"""Graph containers: host-side CSR and the device-side TiledGraph pytree.

The reference keeps graphs as raw CSR arrays read straight into CUDA
managed memory (reference kernels/util.h:8-24, kernels/main.cu:56-71) and
recomputes scheduling metadata from disk on every kernel call
(reference kernels/spmm_maxk.cu:117). Here the graph is loaded once into a
host CSRGraph, all derived structure (transpose, normalization, row-block
tiles) is computed once, and the result is a JAX pytree (TiledGraph) that
can be jit-traced, donated, and sharded like any other array data.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from maxk_tpu.ops.tiling import TileSet, build_tiles_fast


# ---------------------------------------------------------------------------
# Host-side CSR graph
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class CSRGraph:
    """Host (numpy) CSR adjacency.

    indptr:  (V+1,) int64/int32 row pointers
    indices: (E,)   int32 column indices (sorted within each row not required)
    values:  (E,)   float32 edge values (defaults to 1.0)
    """

    indptr: np.ndarray
    indices: np.ndarray
    values: Optional[np.ndarray] = None

    def __post_init__(self):
        self.indptr = np.asarray(self.indptr, dtype=np.int64)
        self.indices = np.asarray(self.indices, dtype=np.int32)
        if self.values is None:
            self.values = np.ones(self.indices.shape[0], dtype=np.float32)
        else:
            self.values = np.asarray(self.values, dtype=np.float32)

    @property
    def n_nodes(self) -> int:
        return int(self.indptr.shape[0]) - 1

    @property
    def n_edges(self) -> int:
        return int(self.indices.shape[0])

    @property
    def out_degrees(self) -> np.ndarray:
        return np.diff(self.indptr).astype(np.int64)

    @property
    def in_degrees(self) -> np.ndarray:
        return np.bincount(self.indices, minlength=self.n_nodes).astype(np.int64)

    @property
    def avg_degree(self) -> float:
        return self.n_edges / max(1, self.n_nodes)

    # -- constructors -------------------------------------------------------

    @staticmethod
    def from_coo(src: np.ndarray, dst: np.ndarray, n_nodes: int,
                 values: Optional[np.ndarray] = None) -> "CSRGraph":
        """Rows = src, columns = dst (stable in input order).

        Native O(V+E) counting sort when available — numpy's stable
        argsort costs minutes at 100M+ edges (measured 525 s for the
        reddit-shaped synthetic graph)."""
        src = np.asarray(src, dtype=np.int64)
        dst = np.asarray(dst, dtype=np.int32)
        if values is None:
            values = np.ones(src.shape[0], dtype=np.float32)
        try:
            from maxk_tpu.native import tilepack_native
            if tilepack_native.available():
                ip, ix, vv = tilepack_native.coo_to_csr(
                    src, dst, values, n_nodes)
                return CSRGraph(ip, ix, vv)
        except ImportError:
            pass
        order = np.argsort(src, kind="stable")
        src_s, dst_s = src[order], dst[order]
        vals_s = np.asarray(values, np.float32)[order]
        counts = np.bincount(src_s, minlength=n_nodes)
        indptr = np.zeros(n_nodes + 1, dtype=np.int64)
        np.cumsum(counts, out=indptr[1:])
        return CSRGraph(indptr, dst_s, vals_s)

    def to_coo(self) -> tuple[np.ndarray, np.ndarray]:
        rows = np.repeat(np.arange(self.n_nodes, dtype=np.int64),
                         np.diff(self.indptr))
        return rows, self.indices.astype(np.int64)

    # -- structural transforms ---------------------------------------------

    def transpose(self) -> "CSRGraph":
        """CSC of A == CSR of A^T, carrying edge values across.

        Native O(V+E) counting sort when available (numpy's stable
        argsort costs tens of seconds at 100M+ edges), numpy fallback."""
        try:
            from maxk_tpu.native import tilepack_native
            if tilepack_native.available():
                ip, ix, vv = tilepack_native.transpose_csr(
                    self.indptr, self.indices, self.values)
                return CSRGraph(ip, ix, vv)
        except ImportError:
            pass
        rows, cols = self.to_coo()
        return CSRGraph.from_coo(cols, rows.astype(np.int32), self.n_nodes,
                                 values=self.values)

    def remove_self_loops(self) -> "CSRGraph":
        rows, cols = self.to_coo()
        keep = rows != cols
        return CSRGraph.from_coo(rows[keep], cols[keep].astype(np.int32),
                                 self.n_nodes, values=self.values[keep])

    def add_self_loops(self, dedup: bool = True) -> "CSRGraph":
        """Add i->i edges with value 1.0 (reference uses DGL AddSelfLoop,
        which removes existing self-loops first — maxk_gnn_dgl.py:138-140)."""
        g = self.remove_self_loops() if dedup else self
        rows, cols = g.to_coo()
        loop = np.arange(g.n_nodes, dtype=np.int64)
        rows = np.concatenate([rows, loop])
        cols = np.concatenate([cols, loop.astype(np.int32)])
        vals = np.concatenate([g.values, np.ones(g.n_nodes, np.float32)])
        return CSRGraph.from_coo(rows, cols.astype(np.int32), g.n_nodes, vals)

    def with_values(self, values: np.ndarray) -> "CSRGraph":
        return CSRGraph(self.indptr, self.indices, values)

    # -- normalizations (aggregator semantics) ------------------------------

    def normalize(self, mode: str) -> "CSRGraph":
        """Return a graph whose values implement an aggregation rule.

        mode='none': raw values (sum aggregation).
        mode='mean': value[e] /= out_degree(row(e)) — mean over neighbors,
            matching the reference SAGE fallback aggregation
            (utils/models.py:270, sparse.mm / deg).
        mode='sym':  value[e] /= sqrt(d_in(col) * d_out(row)) — the GCN
            'both' normalization of dgl.nn.GraphConv used by GCN/GNN_res.
        """
        if mode == "none":
            return self
        rows, cols = self.to_coo()
        if mode == "mean":
            deg = np.maximum(np.diff(self.indptr), 1).astype(np.float32)
            vals = self.values / deg[rows]
        elif mode == "sym":
            # DGL norm='both' uses out-degree for source, in-degree for dest;
            # on the (symmetric) benchmark graphs these coincide.
            d_out = np.maximum(np.diff(self.indptr), 1).astype(np.float32)
            d_in = np.maximum(self.in_degrees, 1).astype(np.float32)
            vals = self.values / (np.sqrt(d_out[rows]) * np.sqrt(d_in[cols]))
        else:
            raise ValueError(f"unknown normalization mode: {mode}")
        return self.with_values(vals.astype(np.float32))


# ---------------------------------------------------------------------------
# Device-side tiled graph pytree
# ---------------------------------------------------------------------------

@struct.dataclass
class TiledGraph:
    """Jit-traceable tiled CSR graph (see maxk_tpu.ops.tiling for layout).

    Array leaves (pytree data):
      cols/vals/lrow: (T, C) edge tiles; block: (T,) row-block ids.
    Static fields (hashable aux data):
      n_nodes, n_edges, row_block, edge_tile, n_rows_padded.
    """

    cols: jax.Array
    vals: jax.Array
    lrow: jax.Array
    block: jax.Array
    n_nodes: int = struct.field(pytree_node=False)
    n_edges: int = struct.field(pytree_node=False)
    row_block: int = struct.field(pytree_node=False)
    edge_tile: int = struct.field(pytree_node=False)
    n_rows_padded: int = struct.field(pytree_node=False)
    # When set (inside shard_map over a row-partitioned graph), ops first
    # all-gather their dense/CBSR operand over this mesh axis: cols index
    # the GLOBAL node space while block/lrow address the LOCAL row shard.
    gather_axis: Optional[str] = struct.field(pytree_node=False, default=None)
    # Neighbor-selective alternative to gather_axis (parallel.halo.HaloSpec):
    # cols index the [local rows | halo buffer] table and ops exchange only
    # the rows each shard actually needs (all_to_all over spec.axis).
    halo: Optional[object] = None
    # Hub-column densification (see split_hub_columns): edges into these
    # high-in-degree columns are NOT in the tiles; their contribution is
    # hub_dense @ x[hub_ids], one MXU matmul off the descriptor-bound
    # gather. None when the graph has no hub split.
    hub_ids: Optional[jax.Array] = None      # (H,) int32 hub node ids
    hub_dense: Optional[jax.Array] = None    # (V, H) f32 dense slab

    @property
    def n_tiles(self) -> int:
        return self.cols.shape[0]


def _tileset_to_device(ts: TileSet, n_nodes: int, n_edges: int) -> TiledGraph:
    return TiledGraph(
        cols=jnp.asarray(ts.cols),
        vals=jnp.asarray(ts.vals),
        lrow=jnp.asarray(ts.lrow),
        block=jnp.asarray(ts.block),
        n_nodes=n_nodes,
        n_edges=n_edges,
        row_block=ts.row_block,
        edge_tile=ts.edge_tile,
        n_rows_padded=ts.n_rows_padded,
    )


@struct.dataclass
class PartedGraph:
    """Column-partitioned tiled graph: A = sum_p A_p, part p holding the
    edges whose column falls in rows [p*col_part_rows, (p+1)*col_part_rows)
    with LOCALIZED column ids.

    Exists because the v5e random row-gather runs ~5x faster against
    tables confined to a <=32 MiB address range (BASELINE.md machine
    model); ops.spmm gathers each part against a materialized slice of
    the feature matrix and accumulates parts into one output.
    """

    parts: tuple    # tuple[TiledGraph, ...], cols localized per part
    n_nodes: int = struct.field(pytree_node=False)
    n_edges: int = struct.field(pytree_node=False)
    col_part_rows: int = struct.field(pytree_node=False)
    gather_axis: Optional[str] = struct.field(pytree_node=False, default=None)
    # Hub-column densification (split applied BEFORE column parting; the
    # parts cover the residual edges only). See TiledGraph.hub_ids.
    hub_ids: Optional[jax.Array] = None
    hub_dense: Optional[jax.Array] = None

    @property
    def n_parts(self) -> int:
        return len(self.parts)

    def replace_gather_axis(self, axis):
        return self.replace(gather_axis=axis)


# Column-part row count: the round-2 probe sweep (tools/probe_gather2.py)
# shows the random row-gather cliff is keyed on the table's ROW COUNT, not
# its byte size: tables of <= 131072 rows gather at the ~565 M rows/s
# descriptor floor for any row width <= 96 int32 lanes, while 262144-row
# tables collapse to ~120 M rows/s even at 24 lanes (24 MiB). Parts are
# therefore exactly 131072 rows, and any graph beyond that is parted.
COL_PART_ROWS = 131072
_PART_THRESHOLD = 131072

# ---------------------------------------------------------------------------
# Hub-column densification
# ---------------------------------------------------------------------------
#
# The tiled SpMM's cost is the per-edge HBM row gather (~2.8 ns/edge
# in-kernel on v5e — descriptor-bound, BASELINE.md machine model). On
# power-law graphs a few high-IN-degree "hub" columns receive a large
# fraction of all edges; those edges can leave the sparse format
# entirely: collect them into a dense (V, H) slab (slab column h = hub
# node hub_ids[h], entries = edge values) and resolve them as ONE MXU
# matmul, hub_dense @ x[hub_ids]. Per hub column the slab costs
#   V * (4 B / HBM_BW  +  2*D flops / MXU_peak)  ~=  V * 7.5 ps   (D=256)
# while each edge it absorbs saves one ~2.8 ns gather descriptor — the
# TPU hybrid analog of the reference's hot-row warp splitting
# (kernels/generate_meta.py splits ROWS at 64 nz for load balance).
#
# MEASURED OUTCOME (tools/probe_hub.py, v5e, syn_big_d100 V=131k
# E=26.2M): NO WIN — 0.98-1.01x at H=512..4096 covering 7-16% of edges.
# The slab matmul itself is as cheap as modeled (0.7-3.9 ms), but the
# residual SpMM does not shrink with the removed edges: hub edges are
# spread thinly across every row, so per-row edge counts rarely cross a
# tile-slot boundary (ceil(row_nz / edge_tile) is unchanged) and the
# scan still runs the same padded slots. The mechanism is therefore an
# OPT-IN (hub_cols > 0, or MAXK_HUB_AUTO=1 for the machine-model gate),
# kept correctness-validated (tests/test_spmm.py hub tests) for graphs
# whose skew concentrates in few ROWS as well as columns, where slots do
# collapse.
#
# The slab stays f32 (not bf16): validation paths compute in exact f32
# and the slab read is bandwidth-cheap relative to the descriptors it
# replaces. Sharded builds (parallel.partition) never engage hubs — the
# slab would shard by rows but its columns index the global node space.

HUB_MIN_NODES = 32768       # below this the whole graph gathers fast
HUB_MIN_COLS = 128          # don't dispatch a slab matmul for fewer
HUB_MIN_DEG = 128           # auto-gate floor on hub IN-DEGREE (distinct
                            # from HUB_MIN_COLS, which bounds slab width;
                            # split_hub_columns' 128-rounding enforces the
                            # width implicitly — keep the gates separate
                            # so tuning one cannot silently move the other)
_HUB_BREAK_EVEN_FRAC = 1.0 / 300.0   # in-degree >= V*frac pays for itself
_HUB_BUDGET_MB = float(os.environ.get("MAXK_HUB_BUDGET_MB", "256"))
_HUB_AUTO = os.environ.get("MAXK_HUB_AUTO", "0") == "1"


def split_hub_columns(csr: CSRGraph, max_cols: int, break_even_deg: int
                      ) -> Optional[tuple[np.ndarray, np.ndarray, CSRGraph]]:
    """Split off hub-column edges: (hub_ids, slab, residual) or None.

    hub_ids: (H,) int32 sorted node ids with in-degree >= break_even_deg
    (top-max_cols by in-degree, H rounded down to a lane multiple of 128);
    slab: (V, H) float32 with slab[r, h] = sum of values of edges
    r -> hub_ids[h]; residual: CSRGraph holding every other edge (CSR
    order preserved — no re-sort).
    """
    in_deg = csr.in_degrees
    cand = np.nonzero(in_deg >= max(1, break_even_deg))[0]
    if len(cand) > max_cols:
        cand = cand[np.argsort(-in_deg[cand], kind="stable")[:max_cols]]
    h = (len(cand) // 128) * 128
    if h == 0:
        return None
    if h < len(cand):
        cand = cand[np.argsort(-in_deg[cand], kind="stable")[:h]]
    hub_ids = np.sort(cand).astype(np.int32)

    v = csr.n_nodes
    pos = np.full(v, -1, np.int32)
    pos[hub_ids] = np.arange(h, dtype=np.int32)
    hub_edge = pos[csr.indices] >= 0
    rows = np.repeat(np.arange(v, dtype=np.int64), np.diff(csr.indptr))

    slab = np.zeros((v, h), np.float32)
    np.add.at(slab, (rows[hub_edge], pos[csr.indices[hub_edge]]),
              csr.values[hub_edge])

    keep = ~hub_edge
    resid_counts = np.diff(csr.indptr) - np.bincount(
        rows[hub_edge], minlength=v)
    indptr_r = np.zeros(v + 1, np.int64)
    np.cumsum(resid_counts, out=indptr_r[1:])
    residual = CSRGraph(indptr_r, csr.indices[keep], csr.values[keep])
    return hub_ids, slab, residual


def _auto_hub(csr: CSRGraph, hub_cols: Optional[int]):
    """Resolve the hub_cols knob: None = default (OFF unless
    MAXK_HUB_AUTO=1 opts into the machine-model gate — measured no-win
    on the synthetic suite, see module note), 0 = off, >0 = force up to
    that many hub columns (tests/tuning)."""
    if hub_cols == 0:
        return None
    v = csr.n_nodes
    if hub_cols is not None:
        return split_hub_columns(csr, hub_cols, break_even_deg=1)
    if not _HUB_AUTO or v < HUB_MIN_NODES:
        return None
    budget_cols = int(_HUB_BUDGET_MB * 2**20 / (4 * v))
    break_even = max(HUB_MIN_DEG, int(v * _HUB_BREAK_EVEN_FRAC))
    return split_hub_columns(csr, budget_cols, break_even)


def build_tiled_graph(csr: CSRGraph,
                      row_block: Optional[int] = None,
                      edge_tile: Optional[int] = None,
                      col_part_rows: Optional[int] = None,
                      hub_cols: Optional[int] = None):
    """Host CSR -> device TiledGraph / PartedGraph (built once, on host).

    col_part_rows: None = auto (partition columns when the node count
    exceeds the fast-gather footprint); 0 = never partition.
    hub_cols: None = auto hub-column densification (machine-model gate;
    see split_hub_columns); 0 = off; >0 = force up to that many columns.
    """
    n_edges_total = csr.n_edges   # tiles + hub slab (for rate reporting)
    hub = _auto_hub(csr, hub_cols)
    hub_kw = {}
    if hub is not None:
        hub_ids, slab, csr = hub[0], hub[1], hub[2]
        hub_kw = dict(hub_ids=jnp.asarray(hub_ids),
                      hub_dense=jnp.asarray(slab))
    if col_part_rows is None:
        col_part_rows = COL_PART_ROWS if csr.n_nodes > _PART_THRESHOLD else 0
    if col_part_rows and csr.n_nodes > col_part_rows:
        from maxk_tpu.ops.tiling import (split_csr_columns,
                                         choose_tile_sizes,
                                         choose_tile_sizes_exact,
                                         low_fill_part)
        parts = []
        for indptr_p, idx_p, val_p in split_csr_columns(
                csr.indptr, csr.indices, csr.values, col_part_rows):
            e_p = int(idx_p.shape[0])
            # Per-part sizes: the measured-optimal heuristic where blocks
            # fill their tiles, the round-4 re-priced exact chooser where
            # padding dominates (low_fill_part — pre-shrink fill gate;
            # see its docstring for the regime boundary and the measured
            # wins: s24_dd 65.2 -> 47.3 ms, amazon0505 144 -> 89 ms,
            # yelp 201 -> 174 ms, com_amazon 67 -> exact layouts). At
            # moderate+ fill the big-tile heuristic stays: the exact
            # model's MAC/gather constants mis-price that regime and its
            # picks (reddit parts: (128, 4-6k) vs the measured-optimal
            # (32-64, 8192)) regressed the reddit-shape training step
            # 1.74x when briefly applied to every part. Parts may differ
            # in R/C; ops.spmm handles heterogeneous parts.
            if low_fill_part(csr.n_nodes, e_p):
                rb_p, et_p = choose_tile_sizes_exact(indptr_p)
            else:
                rb_p, et_p = choose_tile_sizes(csr.n_nodes, max(1, e_p))
            ts = build_tiles_fast(indptr_p, idx_p, val_p,
                                  row_block=row_block or rb_p,
                                  edge_tile=edge_tile or et_p)
            parts.append(_tileset_to_device(ts, csr.n_nodes, e_p))
        return PartedGraph(parts=tuple(parts), n_nodes=csr.n_nodes,
                           n_edges=n_edges_total,
                           col_part_rows=col_part_rows, **hub_kw)
    ts = build_tiles_fast(csr.indptr, csr.indices, csr.values,
                          row_block=row_block, edge_tile=edge_tile)
    g = _tileset_to_device(ts, csr.n_nodes, n_edges_total)
    return g.replace(**hub_kw) if hub_kw else g
