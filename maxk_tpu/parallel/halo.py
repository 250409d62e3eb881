"""Neighbor-selective halo exchange for row-partitioned graphs.

Replaces the full-node-space all-gather (O(V*D) bytes per chip per
aggregation regardless of partition locality) with an exchange of exactly
the remote rows each shard's edges touch (SURVEY.md section 2.4 halo row):

- At shard time (host), shard s computes, per peer p, the sorted unique
  global columns of its edges that fall in p's row range. That list is
  simultaneously p's SEND list to s and the layout of s's receive buffer;
  tile column ids are remapped once into the concatenated
  [local rows | halo buffer] table space.
- At run time (inside shard_map), each shard gathers its send rows and
  exchanges them with one ``jax.lax.all_to_all`` over the graph axis.
  Payload per shard: S*H*D*4 bytes (H = max rows any pair exchanges) —
  proportional to the edge cut, not to V.
- Tiles are reordered LOCAL-FIRST at shard time: tiles whose columns all
  fall in the shard's own range scan against the local feature block and
  are data-independent of the collective, so XLA's latency-hiding
  scheduler can overlap the all_to_all with local compute (the TPU analog
  of the reference-era comm/compute overlap goal). Halo tiles scan against
  the concatenated table afterwards.
- On the MaxK path the exchange moves CBSR (values + selectors) instead of
  dense rows — k*(4+4)/(D*4) of the dense halo bytes before selector
  packing — realizing the CBSR wire-compression payoff of the paper's
  format at chip granularity.

The reference has no distributed analog (single GPU); this is new
capability built TPU-first over XLA collectives.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class HaloSpec:
    """Per-shard exchange plan (stacked over shards in ShardedTiles).

    send_idx: (S, H) int32 — LOCAL row ids this shard sends to each peer
        (padded with 0; the receiver never references padded slots because
        tile columns were remapped only to real positions).
    n_local: rows owned by each shard (== rows_per_shard).
    halo_rows: H, the padded per-pair exchange size.
    n_local_tiles: tiles (per shard, padded count) whose columns are all
        local — they run before/concurrently with the exchange.
    axis: mesh axis name the exchange runs over.
    """

    send_idx: jax.Array
    n_local: int = struct.field(pytree_node=False)
    halo_rows: int = struct.field(pytree_node=False)
    n_local_tiles: int = struct.field(pytree_node=False)
    axis: str = struct.field(pytree_node=False)

    @property
    def n_shards(self) -> int:
        return self.send_idx.shape[-2] if self.send_idx.ndim >= 2 else 0


def halo_exchange(x_local: jax.Array, spec: HaloSpec) -> jax.Array:
    """Exchange halo rows of a (n_local, ...) node array.

    Returns the concatenated (n_local + S*H, ...) gather table whose row
    layout matches the remapped tile columns (local rows first, then peer
    p's rows at offset n_local + p*H).
    """
    send = jnp.take(x_local, spec.send_idx, axis=0)      # (S, H, ...)
    recv = jax.lax.all_to_all(send, spec.axis, split_axis=0, concat_axis=0,
                              tiled=False)
    return jnp.concatenate(
        [x_local, recv.reshape((-1,) + x_local.shape[1:])], axis=0)


def halo_nbytes(spec: HaloSpec, dim: int, itemsize: int = 4) -> int:
    """Per-shard exchange payload in bytes (for scaling reports)."""
    s = spec.send_idx.shape[-2]
    return s * spec.halo_rows * dim * itemsize


@struct.dataclass
class HaloPartedGraph:
    """Per-device runtime view of a column-parted row shard.

    The distributed twin of ops.graph.PartedGraph: when a shard's gather
    table ([local rows | halo buffer]) exceeds the v5e fast-gather row
    count (~131072 rows, BASELINE.md machine model), its tiles are split
    at shard-build time into column parts of <= col_part_rows rows each,
    and ops gather every part against a materialized compact slice of the
    table. Parts over the local row range are data-independent of the
    halo exchange (they run first, overlappable with the all_to_all);
    parts over the halo range scan against slices of the received rows.

    local_parts / halo_parts: tuples of TiledGraph whose cols are
    LOCALIZED to the part's row range ([q*P, ...) of the local table and
    [n_local + q*P, ...) of the concatenated table respectively).
    spec: the HaloSpec exchange plan (None when there are no cross-shard
    edges — halo_parts is then empty).
    """

    local_parts: tuple
    halo_parts: tuple
    spec: Optional[HaloSpec]
    n_nodes: int = struct.field(pytree_node=False)       # real local rows
    n_local: int = struct.field(pytree_node=False)       # padded local rows
    col_part_rows: int = struct.field(pytree_node=False)

    @property
    def n_rows_padded(self) -> int:
        return max(p.n_rows_padded for p in self.local_parts + self.halo_parts)


def plan_halo(shard_tiles: list, row_block: int, n_shards: int,
              rows_per_shard: int):
    """Host-side halo plan over all shards' tile sets.

    Args:
      shard_tiles: per-shard (cols, vals, lrow, block) numpy tuples with
        GLOBAL column ids (padding slots have lrow == row_block).
    Returns (new_shard_tiles, send_idx, halo_rows, n_local_tiles):
      - new_shard_tiles: per-shard (cols, vals, lrow, block) with columns
        remapped into [local | halo] table space and tiles reordered
        local-first, every shard padded to the same (n_local_tiles,
        n_halo_tiles) split (multiples of 8 for gather grouping);
      - send_idx: (S, S, H) int32 — send_idx[s, p] = local row ids shard s
        sends to peer p (0-padded);
      - halo_rows: H, 0 when no shard needs any remote row.
    """
    s_count = n_shards
    needed = [[None] * s_count for _ in range(s_count)]  # [dst][src]
    remaps = []
    remotes = []
    for s, (cols, vals, lrow, block) in enumerate(shard_tiles):
        pad = lrow == row_block
        new_cols = np.zeros_like(cols)
        remote_any = np.zeros(cols.shape[0], dtype=bool)
        for p in range(s_count):
            lo, hi = p * rows_per_shard, (p + 1) * rows_per_shard
            m = (cols >= lo) & (cols < hi) & ~pad
            if p == s:
                new_cols[m] = cols[m] - lo
                needed[s][p] = np.zeros(0, np.int64)
            else:
                uniq = np.unique(cols[m].astype(np.int64))
                new_cols[m] = np.searchsorted(uniq, cols[m])  # provisional
                needed[s][p] = uniq
                remote_any |= m.any(axis=1)
        remaps.append(new_cols)
        remotes.append(remote_any)

    h = max((len(needed[s][p]) for s in range(s_count) for p in range(s_count)
             if p != s), default=0)
    if h == 0:
        # No cross-shard edges: every tile is local, no exchange needed —
        # but columns still need the global -> local rebase.
        out = []
        for s, (cols, vals, lrow, block) in enumerate(shard_tiles):
            nc = remaps[s]
            nc[lrow == row_block] = 0
            out.append((nc, vals, lrow, block))
        return out, None, 0, shard_tiles[0][0].shape[0]
    h = -(-h // 8) * 8

    # Final column offsets: remote ref -> rows_per_shard + p*H + pos.
    for s, (cols, vals, lrow, block) in enumerate(shard_tiles):
        pad = lrow == row_block
        for p in range(s_count):
            if p == s:
                continue
            lo, hi = p * rows_per_shard, (p + 1) * rows_per_shard
            m = (cols >= lo) & (cols < hi) & ~pad
            remaps[s][m] += rows_per_shard + p * h
        remaps[s][pad] = 0

    # Local-first reorder with a common (L, Ht) split across shards.
    l_max = max(int((~r).sum()) for r in remotes)
    ht_max = max(int(r.sum()) for r in remotes)
    l_max = -(-max(l_max, 1) // 8) * 8
    ht_max = -(-max(ht_max, 1) // 8) * 8
    c = shard_tiles[0][0].shape[1]
    out_tiles = []
    for s, (cols, vals, lrow, block) in enumerate(shard_tiles):
        loc = np.nonzero(~remotes[s])[0]
        rem = np.nonzero(remotes[s])[0]
        t2 = l_max + ht_max
        cols2 = np.zeros((t2, c), np.int32)
        vals2 = np.zeros((t2, c), np.float32)
        lrow2 = np.full((t2, c), row_block, np.int32)
        block2 = np.zeros((t2,), np.int32)
        cols2[: len(loc)] = remaps[s][loc]
        vals2[: len(loc)] = vals[loc]
        lrow2[: len(loc)] = lrow[loc]
        block2[: len(loc)] = block[loc]
        cols2[l_max: l_max + len(rem)] = remaps[s][rem]
        vals2[l_max: l_max + len(rem)] = vals[rem]
        lrow2[l_max: l_max + len(rem)] = lrow[rem]
        block2[l_max: l_max + len(rem)] = block[rem]
        out_tiles.append((cols2, vals2, lrow2, block2))

    send_idx = np.zeros((s_count, s_count, h), np.int32)
    for src in range(s_count):
        for dst in range(s_count):
            if src == dst:
                continue
            rows = needed[dst][src] - src * rows_per_shard  # local ids
            send_idx[src, dst, : len(rows)] = rows.astype(np.int32)
    return out_tiles, send_idx, h, l_max
