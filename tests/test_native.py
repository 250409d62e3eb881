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
