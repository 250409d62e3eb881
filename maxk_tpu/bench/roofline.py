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
V5E = dict(hbm_gbps=819.0, gather_elem_per_s=71e9, mxu_tflops=197.0)


@dataclasses.dataclass
class RooflineReport:
    time_ms: float
    floor_ms: float              # max of phases (ideal overlap)
    serial_ms: float             # sum of phases (no overlap)
    efficiency: float            # serial_ms / achieved (1.0 = at model)
    gather_ms: float
    stream_ms: float
    mxu_ms: float
    bound: str                   # 'gather' | 'stream' | 'mxu'
    achieved_gnnz_s: float

    def summary(self) -> str:
        return (f"{self.time_ms:.2f} ms vs serial model "
                f"{self.serial_ms:.2f} ms / overlap floor "
                f"{self.floor_ms:.2f} ms ({100*self.efficiency:.0f}% of "
                f"model, {self.bound}-bound: gather {self.gather_ms:.2f} / "
                f"stream {self.stream_ms:.2f} / mxu {self.mxu_ms:.2f} ms)")


def audit_spmm(n_nodes: int, n_edges: int, dim: int, time_ms: float,
               row_block: int, edge_tile: int, n_tiles: int,
               value_bytes: int = 2, pack: int = 2,
               model: dict = V5E) -> RooflineReport:
    """Roofline audit of one tiled-SpMM execution (ops.spmm).

    Args:
      value_bytes: gathered element size after packing (int32 lanes = 4
        bytes carrying ``pack`` logical values).
      pack: logical values per gathered lane (2 for bf16 pairs, 4 for
        int8 quads, 1 for unpacked).
    """
    slots = n_tiles * edge_tile                      # incl. padding
    lanes_per_row = -(-dim // pack)

    # Random gather: element-count bound (v5e measurement; packing more
    # logical values per 32-bit lane reduces gathered elements directly).
    g_elems = slots * lanes_per_row
    gather_s = g_elems / model["gather_elem_per_s"]

    # Streaming: edge metadata in, packed x once, accumulator traffic.
    stream_bytes = (
        slots * (4 + 4 + 4)                          # cols/vals/lrow
        + n_nodes * dim * (4 + 4 / pack)             # read x + write packed
        + n_tiles * row_block * dim * 4 * 2          # out block read+write
    )
    stream_s = stream_bytes / (model["hbm_gbps"] * 1e9)

    # MXU: (R+1) x C x D MACs per tile.
    macs = n_tiles * (row_block + 1) * edge_tile * dim
    mxu_s = 2 * macs / (model["mxu_tflops"] * 1e12)

    parts = {"gather": gather_s, "stream": stream_s, "mxu": mxu_s}
    bound = max(parts, key=parts.get)
    serial_s = gather_s + stream_s + mxu_s
    return RooflineReport(
        time_ms=time_ms, floor_ms=max(parts.values()) * 1e3,
        serial_ms=serial_s * 1e3,
        efficiency=min(1.0, (serial_s * 1e3) / max(time_ms, 1e-9)),
        gather_ms=gather_s * 1e3, stream_ms=stream_s * 1e3,
        mxu_ms=mxu_s * 1e3, bound=bound,
        achieved_gnnz_s=n_edges / (time_ms * 1e-3) / 1e9)
