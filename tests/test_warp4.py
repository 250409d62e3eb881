"""warp4 wire-format parity: generator semantics, round-trip, validation."""

import numpy as np
import pytest

from maxk_tpu.data.warp4 import (generate_warp4, save_warp4, load_warp4,
                                 validate_warp4, WARP_MAX_NZ)
from maxk_tpu.ops.graph import CSRGraph
from tests.conftest import random_graph


def _reference_generate(indptr, warp_max_nz=64):
    """Direct transcription of the reference loop semantics
    (reference kernels/generate_meta.py:28-48) for oracle comparison."""
    warp_row, warp_loc, warp_len = [], [], []
    cur_loc = 0
    for i in range(len(indptr) - 1):
        cur_degree = int(indptr[i + 1] - indptr[i])
        if cur_degree == 0:
            continue
        tmp_loc = 0
        while True:
            warp_row.append(i)
            warp_loc.append(cur_loc)
            if cur_degree - tmp_loc <= warp_max_nz:
                warp_len.append(cur_degree - tmp_loc)
                cur_loc += cur_degree - tmp_loc
                break
            warp_len.append(warp_max_nz)
            cur_loc += warp_max_nz
            tmp_loc += warp_max_nz
    out = np.zeros((len(warp_row), 4), dtype=np.int32)
    out[:, 0], out[:, 1], out[:, 2] = warp_row, warp_loc, warp_len
    return out


@pytest.mark.parametrize("n,deg,power", [(50, 5.0, False), (200, 30.0, True),
                                         (64, 100.0, True)])
def test_matches_reference_semantics(n, deg, power):
    g = random_graph(n_nodes=n, avg_degree=deg, seed=n, power_law=power)
    np.testing.assert_array_equal(generate_warp4(g),
                                  _reference_generate(g.indptr))


def test_roundtrip_and_validate(tmp_path):
    g = random_graph(n_nodes=150, avg_degree=20.0, seed=3, power_law=True)
    w = generate_warp4(g)
    p = save_warp4(w, tmp_path, "testgraph")
    assert p.name == "testgraph.warp4"
    w2 = load_warp4(p)
    np.testing.assert_array_equal(w, w2)
    validate_warp4(w2, g)


def test_validate_rejects_wrong_graph():
    g = random_graph(n_nodes=100, avg_degree=10.0, seed=1)
    g2 = random_graph(n_nodes=100, avg_degree=12.0, seed=2)
    w = generate_warp4(g)
    with pytest.raises(ValueError):
        validate_warp4(w, g2)


def test_zero_degree_rows_skipped():
    indptr = np.array([0, 0, 3, 3, 5], dtype=np.int64)
    indices = np.array([0, 1, 2, 0, 3], dtype=np.int32)
    g = CSRGraph(indptr, indices)
    w = generate_warp4(g)
    assert set(w[:, 0]) == {1, 3}
    validate_warp4(w, g)


def test_long_row_split():
    indptr = np.array([0, 130], dtype=np.int64)
    indices = np.arange(130, dtype=np.int32) % 1
    g = CSRGraph(indptr, indices)
    w = generate_warp4(g)
    assert w.shape[0] == 3
    np.testing.assert_array_equal(w[:, 2], [64, 64, 2])
    np.testing.assert_array_equal(w[:, 1], [0, 64, 128])
    assert (w[:, 2] <= WARP_MAX_NZ).all()
