"""Pallas tile-reduce SpMM backend vs oracles (interpret mode on CPU)."""

import numpy as np
import pytest
import jax.numpy as jnp

from maxk_tpu.ops.graph import build_tiled_graph
from maxk_tpu.ops.pallas_spmm import spmm_pallas
from maxk_tpu.ops.spmm import spmm_dense_oracle
from tests.conftest import random_graph


def _features(n, d, seed=0):
    return np.random.default_rng(seed).normal(size=(n, d)).astype(np.float32)


@pytest.mark.parametrize("n,deg,power,rb,et", [
    (100, 8.0, False, 8, 32),
    (300, 20.0, True, 16, 64),     # multiple tiles per hub block
    (64, 2.0, False, 32, 128),     # single tile, mostly padding
])
def test_matches_oracle(n, deg, power, rb, et):
    g = random_graph(n_nodes=n, avg_degree=deg, seed=n, power_law=power)
    x = _features(n, 128, seed=1)
    ref = spmm_dense_oracle(g, x)
    tg = build_tiled_graph(g, row_block=rb, edge_tile=et)
    out = np.asarray(spmm_pallas(tg, jnp.asarray(x),
                                 compute_dtype=jnp.float32, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_block_run_split_across_chunks():
    """A hub row whose tiles span multiple gather chunks must accumulate,
    not reinitialize, across chunk boundaries."""
    n = 32
    rng = np.random.default_rng(0)
    # node 0 has 600 in-edges -> many tiles of one block with C=64
    src = np.concatenate([np.zeros(600, np.int64),
                          rng.integers(0, n, size=100)])
    dst = np.concatenate([rng.integers(0, n, size=600),
                          rng.integers(0, n, size=100)]).astype(np.int32)
    from maxk_tpu.ops.graph import CSRGraph
    g = CSRGraph.from_coo(src, dst, n)
    x = _features(n, 128, seed=2)
    ref = spmm_dense_oracle(g, x)
    tg = build_tiled_graph(g, row_block=8, edge_tile=64)
    # group at C=64 is capped at 16 -> 600/64 = 10 tiles of block 0 mix
    # with later blocks across chunks
    out = np.asarray(spmm_pallas(tg, jnp.asarray(x),
                                 compute_dtype=jnp.float32, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_empty_blocks_pass_through():
    # rows 8..15 have no edges at all (their block is never visited)
    from maxk_tpu.ops.graph import CSRGraph
    indptr = np.concatenate([np.arange(9, dtype=np.int64),
                             np.full(8, 8, dtype=np.int64)])
    indices = np.arange(8, dtype=np.int32)
    g = CSRGraph(indptr, indices)
    x = _features(16, 128, seed=3)
    ref = spmm_dense_oracle(g, x)
    tg = build_tiled_graph(g, row_block=8, edge_tile=32)
    out = np.asarray(spmm_pallas(tg, jnp.asarray(x),
                                 compute_dtype=jnp.float32, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)
    assert np.all(out[8:] == 0.0)
