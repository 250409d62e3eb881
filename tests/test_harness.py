"""Benchmark harness: output protocol, validation, speedup analysis,
roofline audit (CPU, tiny graphs, 1+1 timing via monkeypatched protocol
is unnecessary — time_fn's chained protocol runs fine on CPU)."""

import json

import numpy as np
import pytest

from maxk_tpu.bench import harness
from maxk_tpu.bench.roofline import audit_spmm
from tests.conftest import random_graph


@pytest.fixture(scope="module")
def bench_result():
    g = random_graph(n_nodes=200, avg_degree=60.0, seed=5, power_law=True)
    lines = []
    res = harness.benchmark_graph(g, "tiny", dim=64, ks=(8, 16),
                                  validate=True, run_gnna=True,
                                  log=lines.append)
    return res, lines


def test_output_protocol(bench_result):
    res, lines = bench_result
    # Reference stdout format: num graph dim_origin dim_k kernel time(ms)
    kernels = {}
    for ln in lines:
        if ln.startswith("#"):
            continue
        parts = ln.split()
        assert len(parts) == 6
        assert parts[1] == "tiny"
        assert int(parts[2]) == 64
        float(parts[5])
        kernels.setdefault(parts[4], []).append(int(parts[3]))
    assert "baseline_spmm" in kernels
    assert "gnna_sag" in kernels
    assert sorted(kernels["maxk"]) == [8, 16]
    assert sorted(kernels["maxk_backward"]) == [8, 16]
    assert sorted(kernels["topk"]) == [8, 16]


def test_validation_passes(bench_result):
    res, _ = bench_result
    assert res.validation is not None
    assert res.validation["passed"], res.validation
    assert res.validation["mean_err"] < 1e-3
    assert res.validation["bwd_mean_err"] < 1e-3


def test_result_json_and_speedups(bench_result):
    res, _ = bench_result
    d = res.as_json()
    json.dumps(d)   # serializable
    assert d["avg_degree"] > 50
    assert set(d["speedups"]) == {8, 16}
    assert res.speedup(8) is not None
    assert res.roofline["floor_ms"] > 0


def test_analyze_speedups(bench_result):
    res, _ = bench_result
    lines = []
    summary = harness.analyze_speedups([res], log=lines.append)
    assert set(summary) == {"forward", "backward"}
    assert set(summary["forward"]) == {8, 16}
    # The backward column exists: backward_baseline_ms was measured.
    assert set(summary["backward"]) == {8, 16}
    assert res.backward_baseline_ms and res.backward_speedup(8)
    assert any("geomean forward" in ln for ln in lines)
    assert any("geomean backward" in ln for ln in lines)
    # Low-degree graphs are excluded.
    low = harness.analyze_speedups(
        [res], min_degree=res.avg_degree + 1, log=lines.append)
    assert low == {}


def test_roofline_model():
    r = audit_spmm(n_nodes=131072, n_edges=13107200, dim=256, time_ms=42.7,
                   row_block=256, edge_tile=8192, n_tiles=1848)
    assert r.floor_ms < r.time_ms
    assert 0 < r.efficiency <= 1.0
    assert r.bound in ("gather", "stream", "mxu")
    assert "ms" in r.summary()


def test_project_multichip():
    from maxk_tpu.bench.roofline import project_multichip
    # reddit-like shard: 8 shards, 16M slots each, 20k-row halo, D=256 k=32
    p = project_multichip(n_shards=8, slots_per_shard=16_000_000,
                          slots_single=128_000_000, halo_rows=20_000,
                          dim=256, k=32, n_aggregations=8)
    # CBSR wire is (dim*2)/(3k) = 5.33x smaller than the dense wire.
    assert p["wire_reduction"] == pytest.approx(256 * 2 / (3 * 32),
                                                abs=0.01)
    assert p["comm_cbsr_ms_per_agg"] < p["comm_dense_ms_per_agg"]
    for wire in ("dense", "cbsr"):
        s = p[wire]
        assert s["step_overlap_ms"] <= s["step_serial_ms"]
        assert 0 < s["efficiency_serial"] <= s["efficiency_overlap"] <= 1.0
    # CBSR's smaller wire must project at least as efficient as dense.
    assert (p["cbsr"]["efficiency_serial"]
            >= p["dense"]["efficiency_serial"])
    # More halo -> lower projected efficiency.
    worse = project_multichip(n_shards=8, slots_per_shard=16_000_000,
                              slots_single=128_000_000, halo_rows=200_000,
                              dim=256, k=32, n_aggregations=8)
    assert (worse["dense"]["efficiency_serial"]
            < p["dense"]["efficiency_serial"])
    # Zero halo (fully local) -> perfect scaling of the model.
    local = project_multichip(n_shards=8, slots_per_shard=16_000_000,
                              slots_single=128_000_000, halo_rows=0,
                              dim=256, k=32, n_aggregations=8)
    assert local["dense"]["efficiency_serial"] == pytest.approx(1.0)


def test_synthetic_suite_shapes():
    suite = harness.synthetic_suite()
    assert len(suite) >= 5
    names = [n for n, _ in suite]
    assert len(set(names)) == len(names)
    for _, csr in suite:
        assert csr.n_edges > 0


def test_suite24_specs():
    # 24 shape stand-ins, unique names, resolvable via synthetic_by_name.
    assert len(harness.SUITE24_SPECS) == 24
    names = [n for n, _, _ in harness.SUITE24_SPECS]
    assert len(set(names)) == len(names)
    g = harness.synthetic_by_name("s24_cora")
    assert g is not None and g.n_nodes == 2708


def test_gnna_padding_rows_sorted():
    """Padding groups must not break segment_sum's sorted-indices
    contract (they carry the LAST real row id, not 0) and must not
    perturb the result."""
    from maxk_tpu.ops.gnna import build_parts, spmm_gnna
    from maxk_tpu.ops.spmm import spmm_dense_oracle
    import jax.numpy as jnp

    g = random_graph(n_nodes=300, avg_degree=7.0, seed=3, power_law=True)
    parts = build_parts(g, chunk_groups=64)   # force padding groups
    assert parts.n_groups % 64 == 0
    assert np.all(np.diff(parts.row.astype(np.int64)) >= 0)
    x = np.random.default_rng(0).normal(
        size=(g.n_nodes, 16)).astype(np.float32)
    out = np.asarray(spmm_gnna(parts, jnp.asarray(x)))
    # GNNA SAG is the unweighted neighbor sum.
    ref = spmm_dense_oracle(g.with_values(np.ones(g.n_edges, np.float32)), x)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_fill_coo_augments_rows_in_place(tmp_path):
    """kernel_bench --fill-coo measures ONLY coo_ms for rows lacking it,
    leaving every other column (and stale-protocol rows) untouched."""
    import argparse
    import importlib.util
    from pathlib import Path

    row = harness.GraphBenchResult(
        graph="s24_cora", n_nodes=2708, n_edges=21664, avg_degree=8.0,
        dim=32, baseline_ms=1.0, gnna_ms=None, topk_ms={8: 1.0},
        forward_ms={8: 1.0}, backward_ms={8: 1.0}, validation=None)
    stale = dict(row.as_json(), graph="stale_row", protocol=1)
    p = tmp_path / "suite.json"
    p.write_text(json.dumps(dict(protocol=harness.PROTOCOL,
                                 results=[row.as_json(), stale],
                                 partial=True)))

    spec = importlib.util.spec_from_file_location(
        "kernel_bench", Path(harness.__file__).parents[2] / "kernel_bench.py")
    kb = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(kb)
    args = argparse.Namespace(json=str(p), resume_json=str(p),
                              graphs=str(tmp_path / "nodir"),
                              ks=[8], only=None)
    assert kb._fill_coo(args) == 0

    d = json.loads(p.read_text())
    by_name = {r["graph"]: r for r in d["results"]}
    assert by_name["s24_cora"]["coo_ms"] > 0
    assert by_name["s24_cora"]["forward_ms"] == {"8": 1.0}   # untouched
    assert by_name["stale_row"].get("coo_ms") is None        # left alone
    assert d.get("partial") is True                          # key preserved

    # --only restricts the pass; a second run with coo_ms present no-ops.
    args.only = ["s24_nothere"]
    assert kb._fill_coo(args) == 0


def test_protocol_stamp_and_resume_invalidation(bench_result, tmp_path):
    """--resume-json must drop rows from older timing protocols (the
    round-3 suite kept jitter-era rows because resume skipped by name)."""
    res, _ = bench_result
    d_new = res.as_json()
    assert d_new["protocol"] == harness.PROTOCOL
    d_old = dict(d_new, graph="old_row")
    del d_old["protocol"]                       # pre-stamp record
    d_stale = dict(d_new, graph="stale_row", protocol=1)

    # from_json: missing protocol is protocol-1, never current.
    assert harness.GraphBenchResult.from_json(d_old).protocol == 1

    import importlib.util
    from pathlib import Path
    spec = importlib.util.spec_from_file_location(
        "kernel_bench", Path(harness.__file__).parents[2] / "kernel_bench.py")
    kb = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(kb)
    p = tmp_path / "suite.json"
    p.write_text(json.dumps(dict(results=[d_new, d_old, d_stale])))
    keep, stale = kb._resume_rows(str(p))
    assert [r.graph for r in keep] == ["tiny"]
    assert stale == ["old_row", "stale_row"]
