"""ctypes wrapper around the C++ tile packer (tilepack.cpp).

Drop-in replacement for maxk_tpu.ops.tiling.build_tiles; dispatched via
tiling.build_tiles_fast. Compiled lazily on first import by build.py;
``available()`` reports whether the shared library could be built/loaded.
"""

from __future__ import annotations

import ctypes
from typing import Optional

import numpy as np

from maxk_tpu.native.build import load_library

_LIB = load_library()

if _LIB is not None:
    _LIB.mk_count_tiles.restype = ctypes.c_int64
    _LIB.mk_count_tiles.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64]
    _LIB.mk_fill_tiles.restype = None
    _LIB.mk_fill_tiles.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
    _LIB.mk_transpose.restype = None
    _LIB.mk_transpose.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float)]
    _LIB.mk_split_columns.restype = None
    _LIB.mk_split_columns.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64)]
    _LIB.mk_coo_to_csr.restype = None
    _LIB.mk_coo_to_csr.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float)]


def available() -> bool:
    return _LIB is not None


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def build_tiles(indptr, indices, values=None,
                row_block: Optional[int] = None,
                edge_tile: Optional[int] = None):
    """Native TileSet builder; same contract as tiling.build_tiles."""
    from maxk_tpu.ops.tiling import TileSet, choose_tile_sizes

    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    n_nodes = int(indptr.shape[0]) - 1
    n_edges = int(indices.shape[0])
    if values is None:
        values = np.ones(n_edges, dtype=np.float32)
    else:
        values = np.ascontiguousarray(values, dtype=np.float32)

    if row_block is None or edge_tile is None:
        rb, et = choose_tile_sizes(n_nodes, n_edges)
        row_block = row_block or rb
        edge_tile = edge_tile or et
    R, C = int(row_block), int(edge_tile)

    n_tiles = int(_LIB.mk_count_tiles(_ptr(indptr, ctypes.c_int64),
                                      n_nodes, R, C))
    cols = np.empty((n_tiles, C), dtype=np.int32)
    vals = np.empty((n_tiles, C), dtype=np.float32)
    lrow = np.empty((n_tiles, C), dtype=np.int32)
    block = np.empty((n_tiles,), dtype=np.int32)
    _LIB.mk_fill_tiles(
        _ptr(indptr, ctypes.c_int64), _ptr(indices, ctypes.c_int32),
        _ptr(values, ctypes.c_float), n_nodes, R, C, n_tiles,
        _ptr(cols, ctypes.c_int32), _ptr(vals, ctypes.c_float),
        _ptr(lrow, ctypes.c_int32), _ptr(block, ctypes.c_int32))

    n_blocks = max(1, -(-n_nodes // R))
    pad_ratio = 1.0 - (n_edges / float(n_tiles * C)) if n_tiles * C else 0.0
    return TileSet(cols=cols, vals=vals, lrow=lrow, block=block,
                   row_block=R, edge_tile=C,
                   n_rows_padded=n_blocks * R, pad_ratio=pad_ratio)


def transpose_csr(indptr, indices, values):
    """O(V+E) counting-sort CSR transpose (indptr_t, indices_t, values_t)."""
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    values = np.ascontiguousarray(values, dtype=np.float32)
    n_nodes = int(indptr.shape[0]) - 1
    n_edges = int(indices.shape[0])
    out_indptr = np.zeros(n_nodes + 1, dtype=np.int64)
    out_indices = np.empty(n_edges, dtype=np.int32)
    out_values = np.empty(n_edges, dtype=np.float32)
    _LIB.mk_transpose(
        _ptr(indptr, ctypes.c_int64), _ptr(indices, ctypes.c_int32),
        _ptr(values, ctypes.c_float), n_nodes,
        _ptr(out_indptr, ctypes.c_int64), _ptr(out_indices, ctypes.c_int32),
        _ptr(out_values, ctypes.c_float))
    return out_indptr, out_indices, out_values


def coo_to_csr(src, dst, values, n_nodes):
    """O(V+E) counting-sort COO->CSR (indptr, indices, values)."""
    src = np.ascontiguousarray(src, dtype=np.int64)
    dst = np.ascontiguousarray(dst, dtype=np.int32)
    values = np.ascontiguousarray(values, dtype=np.float32)
    n_edges = int(src.shape[0])
    out_indptr = np.zeros(n_nodes + 1, dtype=np.int64)
    out_indices = np.empty(n_edges, dtype=np.int32)
    out_values = np.empty(n_edges, dtype=np.float32)
    _LIB.mk_coo_to_csr(
        _ptr(src, ctypes.c_int64), _ptr(dst, ctypes.c_int32),
        _ptr(values, ctypes.c_float), n_nodes, n_edges,
        _ptr(out_indptr, ctypes.c_int64), _ptr(out_indices, ctypes.c_int32),
        _ptr(out_values, ctypes.c_float))
    return out_indptr, out_indices, out_values


def split_csr_columns(indptr, indices, values, part_rows):
    """Native column-range split; same contract as
    tiling.split_csr_columns."""
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    values = np.ascontiguousarray(values, dtype=np.float32)
    n_nodes = int(indptr.shape[0]) - 1
    n_edges = int(indices.shape[0])
    n_parts = max(1, -(-n_nodes // part_rows))
    out_indptr = np.zeros((n_parts, n_nodes + 1), dtype=np.int64)
    out_indices = np.empty(n_edges, dtype=np.int32)
    out_values = np.empty(n_edges, dtype=np.float32)
    out_offsets = np.zeros(n_parts + 1, dtype=np.int64)
    _LIB.mk_split_columns(
        _ptr(indptr, ctypes.c_int64), _ptr(indices, ctypes.c_int32),
        _ptr(values, ctypes.c_float), n_nodes, part_rows, n_parts,
        _ptr(out_indptr, ctypes.c_int64), _ptr(out_indices, ctypes.c_int32),
        _ptr(out_values, ctypes.c_float), _ptr(out_offsets, ctypes.c_int64))
    return [(out_indptr[p].copy(),
             out_indices[out_offsets[p]:out_offsets[p + 1]].copy(),
             out_values[out_offsets[p]:out_offsets[p + 1]].copy())
            for p in range(n_parts)]
