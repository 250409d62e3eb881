"""GNNAdvisor-analog SAG baseline: neighbor-group SpMM.

A structurally faithful TPU analog of the reference's second comparator
kernel (reference kernels/spmm_gnna.cu): the host splits each row's
neighbor list into fixed-size groups of ``part_size = avg_degree``
(`build_part`, spmm_gnna.cu:20-58,149-152), the kernel accumulates a
partial feature sum per group and flushes the partials into the output
row with atomics (spmm_gnna.cu:60-140). Here:

- ``build_parts``: same host-side neighbor-group splitting (one
  (row, cols[part_size]) record per group, zero-weight padding slots);
- ``spmm_gnna``: per-group gather + within-group sum (the partial), then
  a scatter-add of group partials into rows (jnp .at[].add — the
  deterministic XLA stand-in for the exchange-loop atomicAdd_F,
  spmm_gnna.cu:13-18).

Like the reference SAG kernel it is UNWEIGHTED (pure neighbor sum,
ignores edge values) and exists as a benchmark comparator, not a
production path — the production SpMM is ops.spmm.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from maxk_tpu.ops.graph import CSRGraph


@dataclasses.dataclass
class NeighborParts:
    """Host-built neighbor groups (the build_part output analog)."""

    cols: np.ndarray      # (G, P) int32 neighbor ids (0 on padding slots)
    weight: np.ndarray    # (G, P) float32 1.0 real / 0.0 padding
    row: np.ndarray       # (G,) int32 destination row per group
    part_size: int
    n_nodes: int

    @property
    def n_groups(self) -> int:
        return int(self.cols.shape[0])


def build_parts(csr: CSRGraph, part_size: Optional[int] = None,
                chunk_groups: int = 8192) -> NeighborParts:
    """Split every row's neighbors into groups of part_size
    (reference build_part, spmm_gnna.cu:20-58; partSize = average degree,
    main.cu usage via spmm_gnna.h)."""
    if part_size is None:
        part_size = max(1, int(round(csr.avg_degree)))
    deg = np.diff(csr.indptr).astype(np.int64)
    groups_per_row = -(-deg // part_size)
    g = int(groups_per_row.sum())
    g_pad = max(chunk_groups, -(-g // chunk_groups) * chunk_groups)

    row = np.zeros(g_pad, np.int32)
    cols = np.zeros((g_pad, part_size), np.int32)
    weight = np.zeros((g_pad, part_size), np.float32)

    rows_nz = np.nonzero(groups_per_row)[0]
    row[:g] = np.repeat(rows_nz, groups_per_row[rows_nz]).astype(np.int32)
    # Padding groups carry the LAST real row id, not 0: the flush is a
    # segment_sum with indices_are_sorted=True, and a 0 after ascending
    # real rows would violate the sorted contract (their partials are
    # all-zero either way, so the target row is unaffected).
    if g and g < g_pad:
        row[g:] = row[g - 1]
    starts = np.concatenate([[0], np.cumsum(groups_per_row)[:-1]])
    intra = (np.arange(g) - np.repeat(starts[rows_nz],
                                      groups_per_row[rows_nz])) * part_size
    e0 = csr.indptr[row[:g].astype(np.int64)] + intra
    count = np.minimum(deg[row[:g].astype(np.int64)] - intra, part_size)
    # Slot-fill per group (vectorized over the fixed part_size).
    for j in range(part_size):
        live = j < count
        idx = np.minimum(e0 + j, csr.n_edges - 1)
        cols[:g, j] = np.where(live, csr.indices[idx], 0)
        weight[:g, j] = live.astype(np.float32)
    return NeighborParts(cols=cols, weight=weight, row=row,
                         part_size=part_size, n_nodes=csr.n_nodes)


@partial(jax.jit, static_argnames=("n_nodes", "chunk"))
def _spmm_gnna_impl(cols, weight, row, x, n_nodes: int, chunk: int):
    g, p = cols.shape
    d = x.shape[1]
    ccols = cols.reshape(g // chunk, chunk * p)
    cweight = weight.reshape(g // chunk, chunk, p)

    def step(i, partials):
        xg = jnp.take(x, ccols[i], axis=0, mode="clip").reshape(chunk, p, d)
        ps = (cweight[i][:, :, None] * xg).sum(axis=1)     # (chunk, D)
        return jax.lax.dynamic_update_slice(partials, ps, (i * chunk, 0))

    # Stage 1: per-group partial sums (the SAG kernel's shared-memory
    # accumulation); stage 2: one sorted segment-sum flush of all
    # partials into rows (the atomicAdd_F flush, spmm_gnna.cu:125-139,
    # as a deterministic reduction — groups are emitted row-ordered).
    partials = jnp.zeros((g, d), x.dtype)
    partials = jax.lax.fori_loop(0, g // chunk, step, partials)
    return jax.ops.segment_sum(partials, row, num_segments=n_nodes,
                               indices_are_sorted=True)


def spmm_gnna(parts: NeighborParts, x: jax.Array) -> jax.Array:
    """Unweighted neighbor-sum SpMM over neighbor groups (SAG kernel
    analog, reference spmm_gnna.cu:60-140).

    Groups are scanned in chunks of ~64k edge slots (power of two so the
    chunk divides the padded group count) to bound the gather working set.
    """
    chunk = 1 << max(0, (65536 // max(1, parts.part_size)).bit_length() - 1)
    chunk = min(chunk, 8192)
    while parts.n_groups % chunk:
        chunk //= 2
    return _spmm_gnna_impl(jnp.asarray(parts.cols),
                           jnp.asarray(parts.weight),
                           jnp.asarray(parts.row), x,
                           parts.n_nodes, chunk)
