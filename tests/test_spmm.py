"""SpMM correctness: tiled MXU path and segment baseline vs dense oracle.

Test strategy mirrors the reference's validation protocol (mean abs err
< 1e-3, per-element flag at 0.1 — reference kernels/main.cu:19-48) but
runs as real pytest property tests against an exact dense oracle, which
the reference lacks (SURVEY.md section 4).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from maxk_tpu.ops.graph import CSRGraph, build_tiled_graph
from maxk_tpu.ops.spmm import spmm, spmm_segment, spmm_dense_oracle, spmm_coo
from maxk_tpu.ops.tiling import build_tiles

from conftest import random_graph


def _features(n, d, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(0, 1, size=(n, d)).astype(np.float32)


@pytest.mark.parametrize("row_block,edge_tile", [(8, 32), (16, 64), (64, 256)])
def test_spmm_tiled_matches_oracle(small_graph, row_block, edge_tile):
    x = _features(small_graph.n_nodes, 48)
    ref = spmm_dense_oracle(small_graph, x)
    g = build_tiled_graph(small_graph, row_block=row_block,
                          edge_tile=edge_tile)
    out = np.asarray(spmm(g, jnp.asarray(x), compute_dtype=jnp.float32))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_spmm_scan_unroll_matches_oracle(small_graph):
    """The MAXK_SCAN_UNROLL pipelining knob must not change numerics
    (same body, inlined N consecutive scan steps)."""
    import importlib
    import jax
    spmm_mod = importlib.import_module("maxk_tpu.ops.spmm")
    x = _features(small_graph.n_nodes, 48)
    ref = spmm_dense_oracle(small_graph, x)
    g = build_tiled_graph(small_graph, row_block=16, edge_tile=64)
    old = spmm_mod._SCAN_UNROLL
    try:
        spmm_mod._SCAN_UNROLL = 2
        jax.clear_caches()
        out = np.asarray(spmm(g, jnp.asarray(x), compute_dtype=jnp.float32))
    finally:
        spmm_mod._SCAN_UNROLL = old
        jax.clear_caches()
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_spmm_segment_matches_oracle(small_graph):
    x = _features(small_graph.n_nodes, 32)
    ref = spmm_dense_oracle(small_graph, x)
    g = build_tiled_graph(small_graph, row_block=16, edge_tile=64)
    out = np.asarray(spmm_segment(g, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_spmm_skewed_degrees(skewed_graph):
    x = _features(skewed_graph.n_nodes, 64)
    ref = spmm_dense_oracle(skewed_graph, x)
    g = build_tiled_graph(skewed_graph)  # auto tile sizes
    out = np.asarray(spmm(g, jnp.asarray(x), compute_dtype=jnp.float32))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_spmm_bf16_within_tolerance(small_graph):
    """bf16 MXU inputs with fp32 accumulation stay inside the reference's
    validation tolerance (mean abs err < 1e-3 on uniform(0,1) data)."""
    x = _features(small_graph.n_nodes, 64)
    ref = spmm_dense_oracle(small_graph, x)
    g = build_tiled_graph(small_graph, row_block=16, edge_tile=64)
    out = np.asarray(spmm(g, jnp.asarray(x), compute_dtype=jnp.bfloat16))
    scale = np.maximum(1.0, np.abs(ref))
    assert np.mean(np.abs(out - ref) / scale) < 1e-2


def test_spmm_t_forward_and_grad(small_graph):
    """spmm_t (explicit-transpose backward) matches spmm forward and
    autodiff gradients — the custom VJP that keeps XLA from transposing
    the edge gather into a scatter-add in the training step."""
    import jax
    from maxk_tpu.ops.spmm import spmm_t
    x = jnp.asarray(_features(small_graph.n_nodes, 48))
    g = build_tiled_graph(small_graph, row_block=16, edge_tile=64)
    g_t = build_tiled_graph(small_graph.transpose(), row_block=16,
                            edge_tile=64)
    f0 = np.asarray(spmm(g, x, compute_dtype=jnp.float32))
    f1 = np.asarray(spmm_t(g, g_t, x, compute_dtype=jnp.float32))
    np.testing.assert_array_equal(f0, f1)

    loss_auto = lambda x: (spmm(g, x, compute_dtype=jnp.float32) ** 2).sum()
    loss_vjp = lambda x: (spmm_t(g, g_t, x,
                                 compute_dtype=jnp.float32) ** 2).sum()
    ga = np.asarray(jax.grad(loss_auto)(x))
    gv = np.asarray(jax.grad(loss_vjp)(x))
    np.testing.assert_allclose(gv, ga, rtol=1e-4, atol=1e-4)


def test_spmm_coo_matches_oracle(small_graph):
    x = _features(small_graph.n_nodes, 32)
    ref = spmm_dense_oracle(small_graph, x)
    rows, cols = small_graph.to_coo()
    out = np.asarray(spmm_coo(jnp.asarray(rows.astype(np.int32)),
                              jnp.asarray(cols.astype(np.int32)),
                              jnp.asarray(small_graph.values),
                              jnp.asarray(x), small_graph.n_nodes))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_empty_rows_and_zero_degree_nodes():
    # Nodes 0 and 7 have no out-edges.
    indptr = np.array([0, 0, 2, 2, 3, 5, 5, 6, 6], dtype=np.int64)
    indices = np.array([1, 3, 0, 2, 7, 4], dtype=np.int32)
    gcsr = CSRGraph(indptr, indices)
    x = _features(8, 16, seed=3)
    ref = spmm_dense_oracle(gcsr, x)
    g = build_tiled_graph(gcsr, row_block=8, edge_tile=8)
    out = np.asarray(spmm(g, jnp.asarray(x), compute_dtype=jnp.float32))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_tile_metadata_invariants(skewed_graph):
    ts = build_tiles(skewed_graph.indptr, skewed_graph.indices,
                     skewed_graph.values, row_block=32, edge_tile=128)
    # Every real edge appears exactly once.
    real = ts.lrow < ts.row_block
    assert int(real.sum()) == skewed_graph.n_edges
    # Padding slots have zero value.
    assert np.all(ts.vals[~real] == 0.0)
    # Tiles are sorted by row block (monotone output revisiting).
    assert np.all(np.diff(ts.block) >= 0)
    # Local rows stay inside the block.
    assert ts.lrow.min() >= 0 and ts.lrow.max() <= ts.row_block
    # Value totals preserved.
    np.testing.assert_allclose(ts.vals.sum(), skewed_graph.values.sum(),
                               rtol=1e-5)


def test_transpose_roundtrip(small_graph):
    gt = small_graph.transpose()
    gtt = gt.transpose()
    x = _features(small_graph.n_nodes, 8)
    np.testing.assert_allclose(spmm_dense_oracle(gtt, x),
                               spmm_dense_oracle(small_graph, x),
                               rtol=1e-5, atol=1e-5)
    # A^T oracle == (x^T A)^T
    ref_t = spmm_dense_oracle(small_graph, np.eye(small_graph.n_nodes,
                                                  dtype=np.float32)).T
    out_t = spmm_dense_oracle(gt, np.eye(small_graph.n_nodes,
                                         dtype=np.float32))
    np.testing.assert_allclose(out_t, ref_t, rtol=1e-4, atol=1e-4)


def test_parted_graph_matches_oracle(skewed_graph):
    """Column-partitioned tiling (forced small parts) == dense oracle."""
    from maxk_tpu.ops.graph import PartedGraph
    x = _features(skewed_graph.n_nodes, 16)
    g = build_tiled_graph(skewed_graph, row_block=16, edge_tile=64,
                          col_part_rows=64)
    assert isinstance(g, PartedGraph)
    assert g.n_parts == -(-skewed_graph.n_nodes // 64)
    assert sum(p.n_edges for p in g.parts) == skewed_graph.n_edges
    out = np.asarray(spmm(g, jnp.asarray(x), compute_dtype=jnp.float32))
    np.testing.assert_allclose(out, spmm_dense_oracle(skewed_graph, x),
                               rtol=2e-4, atol=2e-4)


def test_parted_fused_maxk_spgemm_and_grad(skewed_graph):
    """Fused MaxK SpGEMM over parted graphs, forward + gradient."""
    import jax
    from maxk_tpu.ops.spgemm import maxk_spgemm
    from maxk_tpu.ops.maxk import maxk
    k = 4
    x = _features(skewed_graph.n_nodes, 16, seed=9)
    g = build_tiled_graph(skewed_graph, row_block=16, edge_tile=64,
                          col_part_rows=64)
    g_t = build_tiled_graph(skewed_graph.transpose(), row_block=16,
                            edge_tile=64, col_part_rows=64)
    xj = jnp.asarray(x)
    y = maxk_spgemm(g, g_t, xj, k, compute_dtype=jnp.float32)
    ref = spmm_dense_oracle(skewed_graph, np.asarray(maxk(xj, k)))
    np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-4, atol=2e-4)

    def loss(x):
        return (maxk_spgemm(g, g_t, x, k, compute_dtype=jnp.float32) ** 2).sum()

    def loss_dense(x):
        gd = build_tiled_graph(skewed_graph, col_part_rows=0)
        from maxk_tpu.ops.spmm import spmm as _spmm
        return (_spmm(gd, maxk(x, k), compute_dtype=jnp.float32) ** 2).sum()

    gfused = jax.grad(loss)(xj)
    gdense = jax.grad(loss_dense)(xj)
    np.testing.assert_allclose(np.asarray(gfused), np.asarray(gdense),
                               rtol=1e-3, atol=1e-3)


def test_gnna_neighbor_groups_match_unweighted_sum(skewed_graph):
    """The GNNAdvisor-analog baseline (neighbor groups + scatter flush)
    must equal the unweighted neighbor sum (reference spmm_gnna.cu is the
    SAG kernel: pure sum, ignores edge values)."""
    import jax.numpy as jnp
    from maxk_tpu.ops.gnna import build_parts, spmm_gnna
    from maxk_tpu.ops.spmm import spmm_dense_oracle

    csr = skewed_graph.with_values(
        np.ones(skewed_graph.n_edges, np.float32))
    x = np.random.default_rng(3).normal(
        size=(csr.n_nodes, 64)).astype(np.float32)
    parts = build_parts(csr)
    assert parts.part_size == max(1, int(round(csr.avg_degree)))
    # every real edge appears exactly once across groups
    assert int(parts.weight.sum()) == csr.n_edges
    out = np.asarray(spmm_gnna(parts, jnp.asarray(x)))
    ref = spmm_dense_oracle(csr, x)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_gnna_small_part_size(small_graph):
    import jax.numpy as jnp
    from maxk_tpu.ops.gnna import build_parts, spmm_gnna
    from maxk_tpu.ops.spmm import spmm_dense_oracle
    csr = small_graph.with_values(np.ones(small_graph.n_edges, np.float32))
    x = np.random.default_rng(4).normal(
        size=(csr.n_nodes, 32)).astype(np.float32)
    for ps in (1, 3, 7):
        parts = build_parts(csr, part_size=ps)
        out = np.asarray(spmm_gnna(parts, jnp.asarray(x)))
        np.testing.assert_allclose(out, spmm_dense_oracle(csr, x),
                                   rtol=2e-4, atol=2e-4)


def test_choose_tile_sizes_exact_beats_heuristic_on_skew():
    """The exact chooser must never pick a (R, C) with more padded slots
    than needed for a low-fill power-law part, and its choice must build
    and validate."""
    import numpy as np
    from maxk_tpu.data.loaders import synthetic_graph
    from maxk_tpu.ops.tiling import (choose_tile_sizes,
                                     choose_tile_sizes_exact)

    csr = synthetic_graph(8192, 3.0, seed=5)

    def slots(rb, et):
        b = csr.indptr[np.minimum(np.arange(0, 8192 + rb, rb), 8192)]
        cnt = np.diff(b)
        return int(np.sum(-(-cnt // et)) * et)

    rb_h, et_h = choose_tile_sizes(csr.n_nodes, csr.n_edges)
    rb_e, et_e = choose_tile_sizes_exact(csr.indptr)
    assert slots(rb_e, et_e) <= slots(rb_h, et_h)

    from maxk_tpu.ops.graph import build_tiled_graph
    from maxk_tpu.ops.spmm import spmm, spmm_dense_oracle
    import jax.numpy as jnp
    g = build_tiled_graph(csr, row_block=rb_e, edge_tile=et_e)
    x = np.random.default_rng(6).normal(size=(8192, 32)).astype(np.float32)
    out = spmm(g, jnp.asarray(x), compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), spmm_dense_oracle(csr, x),
                               rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# Hub-column densification (ops.graph.split_hub_columns)
# ---------------------------------------------------------------------------

def test_hub_split_partition_is_exact(skewed_graph):
    """Hub slab + residual tiles must partition the edge set exactly."""
    from maxk_tpu.ops.graph import split_hub_columns
    split = split_hub_columns(skewed_graph, max_cols=128, break_even_deg=1)
    assert split is not None
    hub_ids, slab, residual = split
    assert slab.shape == (skewed_graph.n_nodes, len(hub_ids))
    # Every edge is in exactly one of the two halves (values conserved).
    assert residual.n_edges + np.count_nonzero(
        np.isin(skewed_graph.indices, hub_ids)) == skewed_graph.n_edges
    np.testing.assert_allclose(
        slab.sum() + residual.values.sum(), skewed_graph.values.sum(),
        rtol=1e-5)
    # Residual holds no hub-column edges; hub ids all exceed the cut.
    assert not np.isin(residual.indices, hub_ids).any()
    deg = skewed_graph.in_degrees
    assert deg[hub_ids].min() >= 1


def test_hub_spmm_matches_oracle(skewed_graph):
    x = _features(skewed_graph.n_nodes, 48, seed=3)
    ref = spmm_dense_oracle(skewed_graph, x)
    g = build_tiled_graph(skewed_graph, row_block=16, edge_tile=64,
                          hub_cols=128)
    assert g.hub_ids is not None and g.hub_dense.shape[1] == 128
    out = np.asarray(spmm(g, jnp.asarray(x), compute_dtype=jnp.float32))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
    # n_edges still reports the FULL edge count (rate denominators).
    assert g.n_edges == skewed_graph.n_edges


def test_hub_parted_spmm_matches_oracle(skewed_graph):
    x = _features(skewed_graph.n_nodes, 32, seed=4)
    ref = spmm_dense_oracle(skewed_graph, x)
    g = build_tiled_graph(skewed_graph, col_part_rows=128, hub_cols=128)
    from maxk_tpu.ops.graph import PartedGraph
    assert isinstance(g, PartedGraph) and g.hub_ids is not None
    out = np.asarray(spmm(g, jnp.asarray(x), compute_dtype=jnp.float32))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_hub_fused_maxk_spgemm_and_grad(skewed_graph):
    """Fused MaxK SpGEMM forward + custom-VJP grad on a hub-densified
    graph must match the hub-free dense reference."""
    import jax
    from maxk_tpu.ops.spgemm import maxk_spgemm
    from maxk_tpu.ops.maxk import maxk

    k, d = 8, 32
    x = _features(skewed_graph.n_nodes, d, seed=5)
    g = build_tiled_graph(skewed_graph, row_block=16, edge_tile=64,
                          hub_cols=128)
    gt = build_tiled_graph(skewed_graph.transpose(), row_block=16,
                           edge_tile=64, hub_cols=128)
    assert g.hub_ids is not None and gt.hub_ids is not None

    def f(xx):
        return (maxk_spgemm(g, gt, xx, k,
                            compute_dtype=jnp.float32) ** 2).sum()

    def f_ref(xx):
        return ((spmm_dense_oracle(skewed_graph, np.asarray(maxk(
            jnp.asarray(xx), k)))) ** 2).sum()

    y = maxk_spgemm(g, gt, jnp.asarray(x), k, compute_dtype=jnp.float32)
    y_ref = spmm_dense_oracle(skewed_graph,
                              np.asarray(maxk(jnp.asarray(x), k)))
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-4, atol=1e-4)

    grad = np.asarray(jax.grad(f)(jnp.asarray(x)))
    eps, i, j = 1e-3, 7, 11
    xp, xm = x.copy(), x.copy()
    xp[i, j] += eps
    xm[i, j] -= eps
    fd = (f_ref(xp) - f_ref(xm)) / (2 * eps)
    np.testing.assert_allclose(grad[i, j], fd, rtol=5e-2, atol=5e-3)


def test_hub_rejected_by_segment_oracle(skewed_graph):
    g = build_tiled_graph(skewed_graph, hub_cols=128)
    with pytest.raises(TypeError):
        spmm_segment(g, jnp.asarray(_features(skewed_graph.n_nodes, 16)))


def test_hub_default_off(small_graph, skewed_graph):
    # Hub split is opt-in (measured no-win on the synthetic suite — see
    # ops.graph module note): the default build never engages it, so
    # training goldens and benches keep bit-identical numerics.
    assert build_tiled_graph(small_graph).hub_ids is None
    assert build_tiled_graph(skewed_graph).hub_ids is None
    # Explicit off always wins.
    assert build_tiled_graph(skewed_graph, hub_cols=0).hub_ids is None


def test_low_fill_part_gate_regimes():
    """The chooser gate (ops.tiling.low_fill_part) must send
    padding-dominated parts to the exact chooser and keep high-fill
    parts on the measured big-tile heuristic.

    Pins the two regressions it guards against: (a) round-4's brief
    all-parts-exact rule regressed reddit-shape training 1.74x (high
    fill must gate False); (b) the post-shrink gate left borderline
    deg~4.3 parts (s24_com_amazon) on the heuristic at 47% padding
    (67.3 vs 48.2 ms against near-identical s24_dd) — fill just above
    half the SHRUNK tile must still gate True."""
    from maxk_tpu.ops.tiling import low_fill_part

    v = 334863
    # com_amazon-class borderline part: deg 4.28 -> fill 2192 vs the
    # post-shrink (512, 4096) tile; must be low-fill under the
    # pre-shrink (8192) gate.
    assert low_fill_part(v, int(v * 4.28))
    # reddit-class part: deg 277 fills any tile -> heuristic.
    assert not low_fill_part(232965, int(232965 * 277))
    # proteins-class part 0: deg 150 -> heuristic.
    assert not low_fill_part(132534, int(132534 * 150))
    # yeast-class ultra-sparse part: deg 0.3 -> exact.
    assert low_fill_part(1714644, int(1714644 * 0.3))
