"""Per-kernel roofline audit for the sparse aggregation ops.

The reference ships wall-clock timing only (reference kernels/util.h:4-9,
spmm_base.h:58-74). Here every benchmark can be audited against a machine
model of the actual bottlenecks measured on TPU v5e:

- HBM streaming floor (contiguous reads/writes) at ``hbm_gbps``;
- the random row-gather, which is bound by gathered *elements* per second
  (``gather_elem_per_s``, ~71 G/s measured for unpacked rows; packed
  int32 lanes reach ~185 GB/s effective) — the reason ops.spmm packs
  bf16 pairs into int32 lanes;
- the MXU one-hot segment reduce at ``mxu_tflops``.

``audit_spmm`` returns two references: ``floor_ms`` (max of the phases —
the ideal-overlap lower bound) and ``serial_ms`` (their sum — the
no-overlap model XLA currently executes close to). ``efficiency`` is
measured against the serial model, so regressions show up as a ratio,
not a vibe.
"""

from __future__ import annotations

import dataclasses


# Measured device model (TPU v5e defaults; override per chip).
# gather_ns_parted / tile_fixed_ns: round-4 in-situ attribution
# (tools/probe_attrib.py at s24_dd — see ops/tiling.py constants).
V5E = dict(hbm_gbps=819.0, gather_elem_per_s=71e9, mxu_tflops=197.0,
           gather_ns_parted=4.7, tile_fixed_ns=2200.0)


@dataclasses.dataclass
class RooflineReport:
    time_ms: float
    floor_ms: float              # max of phases (ideal overlap)
    serial_ms: float             # sum of phases (no overlap)
    efficiency: float            # serial_ms / achieved (1.0 = at model)
    gather_ms: float
    stream_ms: float
    mxu_ms: float
    bound: str                   # 'gather' | 'stream' | 'mxu' | 'dispatch'
    achieved_gnnz_s: float
    dispatch_ms: float = 0.0     # per-tile fixed DS/DUS cost (round 4)

    def summary(self) -> str:
        return (f"{self.time_ms:.2f} ms vs serial model "
                f"{self.serial_ms:.2f} ms / overlap floor "
                f"{self.floor_ms:.2f} ms ({100*self.efficiency:.0f}% of "
                f"model, {self.bound}-bound: gather {self.gather_ms:.2f} / "
                f"stream {self.stream_ms:.2f} / mxu {self.mxu_ms:.2f} / "
                f"dispatch {self.dispatch_ms:.2f} ms)")


def audit_spmm(n_nodes: int, n_edges: int, dim: int, time_ms: float,
               row_block: int, edge_tile: int, n_tiles: int,
               value_bytes: int = 2, pack: int = 2,
               model: dict = V5E) -> RooflineReport:
    """Roofline audit of one tiled-SpMM execution (ops.spmm), single
    homogeneous tile layout. For PartedGraphs with heterogeneous per-part
    (R, C) use audit_spmm_layouts — the round-3 suite records computed
    parted audits with part 0's sizes and the total tile count, which
    misstates slots by up to 4x on low-degree graphs."""
    return audit_spmm_layouts(n_nodes, n_edges, dim, time_ms,
                              [(row_block, edge_tile, n_tiles)],
                              pack=pack, model=model)


def audit_spmm_layouts(n_nodes: int, n_edges: int, dim: int, time_ms: float,
                       layouts, pack: int = 2, parted: bool = False,
                       model: dict = V5E) -> RooflineReport:
    """Roofline audit summed over tile layouts.

    Args:
      layouts: [(row_block, edge_tile, n_tiles), ...] or
        [(row_block, edge_tile, n_tiles, n_edges_part), ...] — one entry
        per part of a PartedGraph (heterogeneous sizes), or one entry.
      pack: logical values per gathered int32 lane (2 for bf16 pairs,
        4 for int8 quads, 1 for unpacked).
      parted: column-parted execution. The slow ~4.7 ns/slot random-read
        rate (round-4 attribution) applies only to LOW-FILL parts
        (blocks fill under half a tile — the same gate the tile chooser
        uses); high-fill parts keep gather reuse and run at the fused
        element-bound rate (s24_reddit parts measure ~2 ns/slot, not
        4.7). 4-tuple layouts make the per-part gate exact; 3-tuples
        fall back to treating every part as low-fill.
    """
    lanes_per_row = -(-dim // pack)
    gather_s = stream_s = mxu_s = dispatch_s = 0.0
    # The packed-x table is built once per spmm call: read x f32, write
    # packed lanes. When parted, each part barrier-materializes its
    # column-range slice of the packed table (ops.spmm._spmm_parted);
    # the slices are disjoint row ranges, so together they re-read and
    # re-write the packed table exactly once more.
    stream_bytes = n_nodes * dim * (4 + 4 / pack)
    if parted:
        stream_bytes += n_nodes * dim * (4 / pack) * 2
    for layout in layouts:
        row_block, edge_tile, n_tiles = layout[:3]
        part_edges = layout[3] if len(layout) > 3 else None
        slots = n_tiles * edge_tile                  # incl. padding
        low_fill = True
        if part_edges is not None:
            from maxk_tpu.ops.tiling import low_fill_part
            low_fill = low_fill_part(n_nodes, part_edges)
        if parted and low_fill:
            gather_s += slots * model["gather_ns_parted"] * 1e-9
        else:
            # Random gather: element-count bound (v5e measurement;
            # packing more values per lane reduces gathered elements).
            gather_s += slots * lanes_per_row / model["gather_elem_per_s"]
        stream_bytes += (
            slots * (4 + 4 + 4)                      # cols/vals/lrow
            + n_tiles * row_block * dim * 4 * 2      # out block rd+wr
        )
        # MXU: (R+1) x C x D MACs per tile.
        macs = n_tiles * (row_block + 1) * edge_tile * dim
        mxu_s += 2 * macs / (model["mxu_tflops"] * 1e12)
        # Fixed per-tile DS/DUS accumulate cost (round-4 attribution:
        # ~2.2 us/tile, tools/probe_attrib.py — the dominant term the
        # round-3 model missed on small-tile layouts).
        dispatch_s += n_tiles * model["tile_fixed_ns"] * 1e-9
    stream_s = stream_bytes / (model["hbm_gbps"] * 1e9)

    parts = {"gather": gather_s, "stream": stream_s, "mxu": mxu_s,
             "dispatch": dispatch_s}
    bound = max(parts, key=parts.get)
    serial_s = gather_s + stream_s + mxu_s + dispatch_s
    return RooflineReport(
        time_ms=time_ms, floor_ms=max(parts.values()) * 1e3,
        serial_ms=serial_s * 1e3,
        efficiency=min(1.0, (serial_s * 1e3) / max(time_ms, 1e-9)),
        gather_ms=gather_s * 1e3, stream_ms=stream_s * 1e3,
        mxu_ms=mxu_s * 1e3, bound=bound,
        achieved_gnnz_s=n_edges / (time_ms * 1e-3) / 1e9,
        dispatch_ms=dispatch_s * 1e3)


def sharded_gather_slots(st) -> int:
    """Padded gather slots per shard of a ShardedTiles /
    ShardedPartedTiles — the measured cost driver of the tiled SpMM
    (slots x lanes at the in-kernel per-slot rate)."""
    if getattr(st, "parts_local", None) is not None:
        arrs = list(st.parts_local) + list(st.parts_halo)
        return sum(int(a[0].shape[1] * a[0].shape[2]) for a in arrs)
    return int(st.cols.shape[1] * st.cols.shape[2])


# Public per-chip aggregate ICI bandwidth, GB/s. Google's v5e spec sheet
# lists 1,600 Gbps of interchip interconnect per chip (4 links, 2D torus)
# = 200 GB/s aggregate. Override for other generations / DCN.
V5E_ICI_GBPS = 200.0

# Measured in-kernel cost of one padded gather slot at 128 int32 lanes
# (D=256 bf16-packed): ~2.8 ns on v5e (BASELINE.md machine model). The
# projection scales it linearly in gathered lanes (element-bound regime).
NS_PER_SLOT_D256 = 2.8


def project_multichip(n_shards: int, slots_per_shard: int,
                      slots_single: int, halo_rows: int, dim: int, k: int,
                      n_aggregations: int,
                      ici_gbps: float = V5E_ICI_GBPS,
                      ns_per_slot_d256: float = NS_PER_SLOT_D256) -> dict:
    """First-order multi-chip scaling projection for row-partitioned
    training (the BASELINE.md north-star metric this environment cannot
    measure: only one physical chip is reachable).

    Grounded in measured quantities only: per-slot aggregation cost from
    the single-chip machine model, and the actual planned halo payload of
    the shard build (parallel.halo send lists — edge-cut-proportional,
    not V-proportional). Everything else is the public ICI spec.

    Model, per aggregation (one tiled SpMM; a training step runs
    ``n_aggregations`` of them = 2 per layer, forward + transpose):
      compute_ms = slots_per_shard * lanes(dim) * ns_per_slot
      comm_ms    = per-chip all_to_all payload / ici_gbps
        dense wire: (S-1) * halo_rows rows of dim * 2 bytes (bf16 pairs)
        CBSR wire:  (S-1) * halo_rows rows of 3k bytes (bf16 vals +
                    int8 selectors — ops.spgemm._cbsr_wire_exchange)
    Reported as two bounds: serial (compute + comm) and overlap
    (max(compute, comm) — the local-first tile order makes the local
    scan data-independent of the exchange, so XLA may overlap them).

    Returns a dict of projected per-step ms and speedup/efficiency
    bounds vs the single-chip projection of the same model.
    """
    lanes = -(-dim // 2)                       # bf16-pair packed lanes
    ns_per_slot = ns_per_slot_d256 * lanes / 128.0
    comp_ms = slots_per_shard * ns_per_slot * 1e-6
    comp1_ms = slots_single * ns_per_slot * 1e-6

    peer_rows = (n_shards - 1) * halo_rows
    comm_dense_ms = peer_rows * dim * 2 / (ici_gbps * 1e9) * 1e3
    comm_cbsr_ms = peer_rows * 3 * k / (ici_gbps * 1e9) * 1e3

    def step(comm_ms):
        serial = n_aggregations * (comp_ms + comm_ms)
        overlap = n_aggregations * max(comp_ms, comm_ms)
        t1 = n_aggregations * comp1_ms
        return dict(
            step_serial_ms=round(serial, 4),
            step_overlap_ms=round(overlap, 4),
            speedup_serial=round(t1 / serial, 3) if serial else float("inf"),
            speedup_overlap=round(t1 / overlap, 3) if overlap else
            float("inf"),
            efficiency_serial=round(t1 / serial / n_shards, 3) if serial
            else 1.0,
            efficiency_overlap=round(t1 / overlap / n_shards, 3) if overlap
            else 1.0)

    return dict(
        n_shards=n_shards,
        compute_ms_per_agg=round(comp_ms, 4),
        comm_dense_ms_per_agg=round(comm_dense_ms, 4),
        comm_cbsr_ms_per_agg=round(comm_cbsr_ms, 4),
        wire_reduction=round(comm_dense_ms / comm_cbsr_ms, 2)
        if comm_cbsr_ms else float("inf"),
        dense=step(comm_dense_ms), cbsr=step(comm_cbsr_ms))
