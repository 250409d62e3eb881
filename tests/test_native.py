"""Native C++ tile packer == numpy tile packer, bit for bit."""

import numpy as np
import pytest

from maxk_tpu.ops import tiling
from tests.conftest import random_graph

native = pytest.importorskip("maxk_tpu.native.tilepack_native")

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable")


@pytest.mark.parametrize("n,deg,power", [(100, 8.0, False), (300, 20.0, True),
                                         (1000, 3.0, True), (37, 1.0, False)])
@pytest.mark.parametrize("rb,et", [(8, 32), (16, 64), (32, 256)])
def test_matches_numpy(n, deg, power, rb, et):
    g = random_graph(n_nodes=n, avg_degree=deg, seed=n, power_law=power)
    ref = tiling.build_tiles(g.indptr, g.indices, g.values,
                             row_block=rb, edge_tile=et)
    out = native.build_tiles(g.indptr, g.indices, g.values,
                             row_block=rb, edge_tile=et)
    assert out.row_block == ref.row_block
    assert out.edge_tile == ref.edge_tile
    assert out.n_rows_padded == ref.n_rows_padded
    np.testing.assert_array_equal(out.cols, ref.cols)
    np.testing.assert_array_equal(out.vals, ref.vals)
    np.testing.assert_array_equal(out.lrow, ref.lrow)
    np.testing.assert_array_equal(out.block, ref.block)


def test_empty_graph():
    indptr = np.zeros(11, dtype=np.int64)
    indices = np.zeros(0, dtype=np.int32)
    ref = tiling.build_tiles(indptr, indices, None, row_block=8, edge_tile=32)
    out = native.build_tiles(indptr, indices, None, row_block=8, edge_tile=32)
    np.testing.assert_array_equal(out.cols, ref.cols)
    np.testing.assert_array_equal(out.lrow, ref.lrow)


def test_default_sizes_dispatch():
    g = random_graph(n_nodes=200, avg_degree=10.0, seed=7)
    ref = tiling.build_tiles(g.indptr, g.indices, g.values)
    out = tiling.build_tiles_fast(g.indptr, g.indices, g.values)
    np.testing.assert_array_equal(out.cols, ref.cols)
    np.testing.assert_array_equal(out.block, ref.block)


def test_transpose_matches_numpy():
    for seed, power in [(1, False), (2, True)]:
        g = random_graph(n_nodes=200, avg_degree=12.0, seed=seed,
                         power_law=power)
        rows, cols = g.to_coo()
        from maxk_tpu.ops.graph import CSRGraph
        ref = CSRGraph.from_coo(cols, rows.astype(np.int32), g.n_nodes,
                                values=g.values)
        ip, ix, vv = native.transpose_csr(g.indptr, g.indices, g.values)
        np.testing.assert_array_equal(ip, ref.indptr)
        np.testing.assert_array_equal(ix, ref.indices)
        np.testing.assert_array_equal(vv, ref.values)


def test_coo_to_csr_matches_numpy():
    rng = np.random.default_rng(5)
    src = rng.integers(0, 100, size=1500)
    dst = rng.integers(0, 100, size=1500).astype(np.int32)
    vals = rng.normal(size=1500).astype(np.float32)
    order = np.argsort(src, kind="stable")
    ip, ix, vv = native.coo_to_csr(src, dst, vals, 100)
    counts = np.bincount(src[order], minlength=100)
    ref_ip = np.zeros(101, dtype=np.int64)
    np.cumsum(counts, out=ref_ip[1:])
    np.testing.assert_array_equal(ip, ref_ip)
    np.testing.assert_array_equal(ix, dst[order])
    np.testing.assert_array_equal(vv, vals[order])


def test_split_columns_matches_numpy():
    from maxk_tpu.ops import tiling
    g = random_graph(n_nodes=150, avg_degree=15.0, seed=8, power_law=True)
    nat = native.split_csr_columns(g.indptr, g.indices, g.values, 40)
    # numpy reference (the in-module fallback path)
    rows = np.repeat(np.arange(g.n_nodes, dtype=np.int64),
                     np.diff(g.indptr))
    for p, (ip, ix, vv) in enumerate(nat):
        lo, hi = p * 40, min((p + 1) * 40, g.n_nodes)
        m = (g.indices >= lo) & (g.indices < hi)
        counts = np.bincount(rows[m], minlength=g.n_nodes)
        ref_ip = np.zeros(g.n_nodes + 1, dtype=np.int64)
        np.cumsum(counts, out=ref_ip[1:])
        np.testing.assert_array_equal(ip, ref_ip)
        np.testing.assert_array_equal(ix, g.indices[m] - lo)
        np.testing.assert_array_equal(vv, g.values[m])
