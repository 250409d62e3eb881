"""Row-block tile scheduling metadata for TPU sparse kernels.

This is the TPU-native replacement for the reference's offline warp-metadata
generator (reference kernels/generate_meta.py: one (row, loc, len, pad)
quadruple per CUDA warp, each warp owning <=64 consecutive nonzeros of one
CSR row). On TPU there are no warps and no atomics, so the scheduling
contract is different:

- Rows are grouped into *row blocks* of ``row_block`` rows. A row block is
  the unit of output accumulation (the analog of the reference's per-warp
  shared-memory ``out_cache``, kernels/spmm_maxk.cu:110 — here it is a VMEM
  accumulator tile of shape (row_block, dim)).
- The edges of each row block are packed into *edge tiles* of exactly
  ``edge_tile`` edge slots (padded with null edges). An edge tile never
  spans two row blocks, so every tile's contribution lands in a single
  output tile: accumulation is race-free by construction instead of
  relying on atomicAdd (reference kernels/spmm_maxk.cu:101-105).
- Local row ids within a tile live in [0, row_block); padding slots get
  local row id ``row_block`` which accumulates into a discarded garbage
  row (branch-free padding, no masks needed in the inner loop).

The generator runs on host at graph-load time (numpy; an optional C++
implementation lives in maxk_tpu/native for large graphs) and its output is
carried in the TiledGraph pytree — unlike the reference, which re-reads
.warp4 files from disk inside the autograd hot path
(reference kernels/spmm_maxk.cu:117).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import numpy as np


class TileSet(NamedTuple):
    """Host-side tiled CSR scheduling metadata.

    Attributes:
      cols:  (T, C) int32 — column index of each edge slot (0 for padding).
      vals:  (T, C) float32 — edge value of each slot (0 for padding).
      lrow:  (T, C) int32 — local row id in [0, row_block]; row_block marks
             a padding slot (accumulates into the garbage row).
      block: (T,) int32 — row-block index of each tile; tiles are sorted by
             block, so output-block revisiting is monotone.
      row_block: static row-block height R.
      edge_tile: static edge-tile width C.
      n_rows_padded: V rounded up to a multiple of row_block.
      pad_ratio: fraction of edge slots that are padding (diagnostic).
    """

    cols: np.ndarray
    vals: np.ndarray
    lrow: np.ndarray
    block: np.ndarray
    row_block: int
    edge_tile: int
    n_rows_padded: int
    pad_ratio: float


# Tiles per ~64k-slot HBM gather group, capped at 64 to bound the
# unrolled sub-tile loop in ops.spmm._scan_tiles (program size / compile
# time — raising the cap to 128 doubled per-step program size for every
# auto-sized small graph (the C=512 floor) and tripped the 40 s XLA CPU
# collective watchdog on the 8-device virtual mesh). The 256-slot
# low-fill tiles from choose_tile_sizes_exact therefore gather 16k slots
# per scan step instead of the 64k optimum — a secondary cost next to
# their 3-4x padded-slot reduction. MUST stay in sync with
# native/tilepack.cpp round_tiles().
def gather_group(edge_tile: int, target_edges: int = 65536) -> int:
    """Gather-group size for an edge-tile width (before divisibility)."""
    return max(1, min(64, target_edges // max(1, edge_tile)))


def choose_tile_sizes(n_nodes: int, n_edges: int,
                      dim_hint: int = 256) -> tuple[int, int]:
    """Pick (row_block, edge_tile) for a graph.

    Heuristic: the MXU segment-sum matmul costs (row_block+1) * dim MACs per
    edge slot, so row_block should shrink for high-degree graphs (few rows
    per tile) and grow for low-degree graphs (avoid padding waste when a
    tile is truncated at a row-block boundary). edge_tile is kept large
    enough to amortize gather/dispatch overhead and keep the MXU busy.
    """
    avg_degree = max(1.0, n_edges / max(1, n_nodes))
    # Measured on v5e (clean single-process sweeps, see BASELINE.md):
    # C=8192 wins at moderate+ degrees (64k-slot gather groups amortize
    # scan dispatch; smaller C measured 2x slower even at lower padding).
    # R balances the one-hot MXU cost ((R+1)*D MACs per SLOT) against
    # padding: R ~ 2*C/degree rounded DOWN (deg=100 -> R=128 measured
    # best; deg_part=4 -> R=512), capped at 512 where the MXU term
    # overtakes the gather.
    edge_tile = 1 << max(9, min(13, int(math.ceil(math.log2(max(
        512.0, n_edges / 4.0))))))
    span = 2.0 * edge_tile / avg_degree
    row_block = 1 << max(5, min(9, int(math.floor(math.log2(max(
        32.0, min(span, n_nodes)))))))
    # Very low degree (column parts of huge sparse graphs, e.g. the
    # products shape: 19 parts of per-part degree ~2.7): a 512-row block
    # holds only R*deg edges, so a C=8192 tile would be mostly padding
    # (~83% measured -> 30x per-edge slowdown + HBM blowup). Shrink C
    # toward the expected block fill instead.
    fill = row_block * avg_degree
    if fill < edge_tile / 2.0:
        edge_tile = 1 << max(9, min(13, int(math.ceil(math.log2(max(
            512.0, fill * 1.3))))))
    return int(row_block), int(edge_tile)


# Measured v5e per-slot cost constants (BASELINE.md machine model):
# - gather+unpack of one 128-lane packed row, fused into the dot:
#   ~2.7 ns/slot against fast tables (<= 131072 rows with XLA's in-kernel
#   fusion at moderate+ fill), ~4.7 ns/slot in the parted low-fill
#   regime (round-4 in-situ attribution, tools/probe_attrib.py: 21 ms of
#   random-gather excess over 4.44M slots at s24_dd);
# - one-hot MXU reduce: (R+1)*D MACs/slot at ~98.5 TMAC/s bf16;
# - output tile read-modify-write: 2*R*D*4 bytes/tile at ~819 GB/s;
# - PLUS a fixed ~2.2 us per tile: the dynamic-slice/update-slice pair
#   that accumulates each tile's partial into its output block costs
#   ~2.2-2.4 us regardless of size (round-4 attribution: the no_rmw
#   ablation removed 35.5 of 65.5 ms over 12640 tiles at s24_dd; the
#   same-slot (R,C) ladder isolates ~2.2 us/tile). This term is what
#   the round-3 chooser was missing — it priced 256-slot tiles as
#   nearly free and picked layouts with 6x more tiles than optimal.
_GATHER_NS_FAST = 2.7
_GATHER_NS_PARTED = 4.7
_MAC_NS = 256.0 / 98.5e3          # per (R+1), at dim 256
_RMW_NS_PER_ROW = 2 * 256 * 4 / 819.0  # per tile row, at dim 256
_TILE_FIXED_NS = 2200.0           # DS/DUS pair per tile (round-4 measured)


def low_fill_part(n_nodes: int, n_edges: int) -> bool:
    """Gate between the measured big-tile heuristic and the four-phase
    exact chooser for a column part: True = padding-dominated regime.

    Tested against the heuristic's PRE-shrink edge tile (the natural
    8192-slot tile for any serious part), not its post-shrink size: the
    post-shrink test left borderline parts (fill just above half the
    *shrunk* tile) on the heuristic — s24_com_amazon's deg-4.3 parts
    kept (512, 4096) at 47% mean padding and measured 67 ms where the
    near-identical s24_dd (gated exact, (512, 2048)) measured 48 ms.
    "Blocks cannot fill half the natural big tile" is the regime
    boundary the round-4 attribution measured (random-read gather,
    per-tile fixed cost dominant), independent of how far the shrink
    clause happened to round down.
    """
    avg_degree = max(1.0, n_edges / max(1, n_nodes))
    edge_tile = 1 << max(9, min(13, int(math.ceil(math.log2(max(
        512.0, n_edges / 4.0))))))
    span = 2.0 * edge_tile / avg_degree
    row_block = 1 << max(5, min(9, int(math.floor(math.log2(max(
        32.0, min(span, n_nodes)))))))
    return row_block * avg_degree < edge_tile / 2.0


def choose_tile_sizes_exact(indptr: np.ndarray,
                            gather_ns: float = _GATHER_NS_PARTED,
                            row_blocks=(64, 128, 256, 512, 1024),
                            edge_tiles=(256, 512, 1024, 1536, 2048, 3072,
                                        4096, 6144, 8192)
                            ) -> tuple[int, int]:
    """Pick (row_block, edge_tile) by exact padded-slot counts.

    Unlike choose_tile_sizes (mean-degree heuristic), this evaluates the
    candidate grid against the graph's actual per-block edge counts —
    power-law degree skew makes mean-fill padding estimates off by 2x —
    and minimizes the measured serial cost model:

        slots(R,C) * (gather_ns + (R+1)*mac)
          + tiles(R,C) * (R * rmw + tile_fixed)

    Runs in O(V/R) per candidate on host. Used for low-fill column parts
    where padding dominates; the default sizing keeps the measured-optimal
    heuristic for the moderate/high-fill regime. The tile_fixed term
    (per-tile DS/DUS cost) pushes the optimum toward C ~ 1.3 * R * deg —
    one tile per row block — instead of the round-3 tiny tiles
    (s24_dd: (128, 256) -> (512, 2048), measured 65.2 -> ~35 ms).
    """
    indptr = np.asarray(indptr, dtype=np.int64)
    n = int(indptr.shape[0]) - 1
    best = None
    for r in row_blocks:
        bounds = indptr[np.minimum(np.arange(0, n + r, r), n)]
        cnt = np.diff(bounds)
        for c in edge_tiles:
            tiles = int(np.sum(-(-cnt // c)))
            if tiles == 0:
                tiles = 1
            cost = tiles * c * (gather_ns + (r + 1) * _MAC_NS) \
                + tiles * (r * _RMW_NS_PER_ROW + _TILE_FIXED_NS)
            if best is None or cost < best[0]:
                best = (cost, r, c)
    return best[1], best[2]


def build_tiles(indptr: np.ndarray,
                indices: np.ndarray,
                values: Optional[np.ndarray] = None,
                row_block: Optional[int] = None,
                edge_tile: Optional[int] = None) -> TileSet:
    """Build row-block tile metadata from CSR arrays (numpy, host-side)."""
    indptr = np.asarray(indptr, dtype=np.int64)
    indices = np.asarray(indices, dtype=np.int32)
    n_nodes = int(indptr.shape[0]) - 1
    n_edges = int(indices.shape[0])
    if values is None:
        values = np.ones(n_edges, dtype=np.float32)
    else:
        values = np.asarray(values, dtype=np.float32)

    if row_block is None or edge_tile is None:
        rb, et = choose_tile_sizes(n_nodes, n_edges)
        row_block = row_block or rb
        edge_tile = edge_tile or et
    R, C = int(row_block), int(edge_tile)

    n_blocks = max(1, -(-n_nodes // R))
    n_rows_padded = n_blocks * R

    # Edges per row block and tiles per block.
    blk_starts = indptr[np.minimum(np.arange(n_blocks) * R, n_nodes)]
    blk_ends = indptr[np.minimum((np.arange(n_blocks) + 1) * R, n_nodes)]
    blk_counts = (blk_ends - blk_starts).astype(np.int64)
    tiles_per_block = np.maximum(0, -(-blk_counts // C)).astype(np.int64)
    n_tiles = int(tiles_per_block.sum())
    if n_tiles == 0:
        n_tiles = 1
        tiles_per_block = tiles_per_block.copy()
        tiles_per_block[0] = 1
    # Round the tile count up to a multiple of the gather-group size
    # (ops.spmm groups ~64k edge slots per HBM gather): trailing all-padding
    # tiles accumulate zeros into the last block's garbage row, keeping the
    # tile->block map monotone.
    group = gather_group(C)
    n_tiles = -(-n_tiles // group) * group

    cols = np.zeros((n_tiles, C), dtype=np.int32)
    vals = np.zeros((n_tiles, C), dtype=np.float32)
    lrow = np.full((n_tiles, C), R, dtype=np.int32)
    block = np.full((n_tiles,), n_blocks - 1, dtype=np.int32)

    # Global row id per edge.
    degrees = np.diff(indptr)
    rows = np.repeat(np.arange(n_nodes, dtype=np.int32), degrees)

    t = 0
    for b in range(n_blocks):
        e0, e1 = int(blk_starts[b]), int(blk_ends[b])
        nt = int(tiles_per_block[b])
        for j in range(nt):
            s = e0 + j * C
            e = min(s + C, e1)
            n = e - s
            cols[t, :n] = indices[s:e]
            vals[t, :n] = values[s:e]
            lrow[t, :n] = rows[s:e] - b * R
            block[t] = b
            t += 1

    pad_ratio = 1.0 - (n_edges / float(n_tiles * C)) if n_tiles * C else 0.0
    return TileSet(cols=cols, vals=vals, lrow=lrow, block=block,
                   row_block=R, edge_tile=C,
                   n_rows_padded=n_rows_padded, pad_ratio=pad_ratio)


def split_csr_columns(indptr: np.ndarray, indices: np.ndarray,
                      values: np.ndarray, part_rows: int
                      ) -> list[tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Split a CSR matrix into column-range parts with LOCALIZED indices.

    Part p holds the edges with column in [p*part_rows, (p+1)*part_rows),
    column ids rebased to the part. Row space is unchanged. Used to keep
    each part's gather table under the v5e fast-gather footprint
    (measured: random row-gather runs at ~560 M rows/s against tables in
    a <=32 MiB address range and collapses to ~117 M rows/s beyond
    ~128 MiB — see BASELINE.md).
    """
    indptr = np.asarray(indptr, dtype=np.int64)
    indices = np.asarray(indices, dtype=np.int32)
    values = np.asarray(values, dtype=np.float32)
    n_nodes = int(indptr.shape[0]) - 1
    n_parts = max(1, -(-n_nodes // part_rows))
    try:
        from maxk_tpu.native import tilepack_native
        if tilepack_native.available():
            return tilepack_native.split_csr_columns(
                indptr, indices, values, part_rows)
    except ImportError:
        pass
    rows = np.repeat(np.arange(n_nodes, dtype=np.int64), np.diff(indptr))
    out = []
    for p in range(n_parts):
        lo, hi = p * part_rows, min((p + 1) * part_rows, n_nodes)
        m = (indices >= lo) & (indices < hi)
        rows_p = rows[m]
        counts = np.bincount(rows_p, minlength=n_nodes)
        indptr_p = np.zeros(n_nodes + 1, dtype=np.int64)
        np.cumsum(counts, out=indptr_p[1:])
        out.append((indptr_p, (indices[m] - lo).astype(np.int32), values[m]))
    return out


def build_tiles_fast(indptr, indices, values=None,
                     row_block=None, edge_tile=None) -> TileSet:
    """Tile builder dispatch: native C++ when available, else numpy.

    The per-block Python loop in build_tiles is O(n_blocks); for graphs in
    the 24-graph suite (V up to ~2.5M) the native path keeps load time low.
    """
    try:
        from maxk_tpu.native import tilepack_native
        if tilepack_native.available():
            return tilepack_native.build_tiles(
                indptr, indices, values, row_block, edge_tile)
    except ImportError:
        pass
    return build_tiles(indptr, indices, values, row_block, edge_tile)
