"""Tests for the repo-level reporting tools (tools/suite_report.py,
tools/reaudit_suite.py) — the scripts that turn BENCH_SUITE24.json into
the BASELINE.md tables. They are plain scripts, so these tests run them
as subprocesses against fixture records."""

import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def _row(graph, base=10.0, eff=0.9, roofline=True):
    r = dict(graph=graph, n_nodes=1000, n_edges=8000, avg_degree=8.0,
             dim=256, baseline_ms=base, gnna_ms=50.0,
             topk_ms={"16": 1.0}, forward_ms={"16": 5.0},
             backward_ms={"16": 4.0},
             validation=dict(k=16, mean_err=1e-9, max_err=1e-6,
                             n_flagged=0, bwd_mean_err=1e-8, passed=True),
             backward_baseline_ms=9.0, coo_ms=None, protocol=2)
    if roofline:
        r["roofline"] = dict(time_ms=base, floor_ms=4.0, serial_ms=9.0,
                             efficiency=eff, gather_ms=4.0, stream_ms=2.0,
                             mxu_ms=3.0, bound="gather",
                             achieved_gnnz_s=0.8, dispatch_ms=0.5)
    return r


def test_suite_report_renders_all_rows(tmp_path):
    """Every graph must appear in the per-graph table — including rows
    with no roofline record (a ternary-precedence bug once replaced the
    whole row with ' | - |')."""
    rec = dict(protocol=2,
               results=[_row("g_with"), _row("g_without", roofline=False)])
    p = tmp_path / "suite.json"
    p.write_text(json.dumps(rec))
    out = subprocess.run(
        [sys.executable, str(ROOT / "tools" / "suite_report.py"), str(p)],
        capture_output=True, text=True, check=True).stdout
    for g in ("g_with", "g_without"):
        line = next(ln for ln in out.splitlines() if g in ln)
        assert "2.00x" in line           # 10/5 forward speedup present
        assert "2.25x" in line           # 9/4 backward speedup present
    assert "| 0.90 |" in out             # eff cell for g_with
    # g_without renders '-' in the eff column, not a gutted row
    gutted = next(ln for ln in out.splitlines() if "g_without" in ln)
    assert gutted.strip().endswith("| - |")


def test_reaudit_rewrites_only_rooflines(tmp_path):
    """reaudit_suite must recompute audits from regenerated layouts and
    leave every measured field untouched."""
    rec = dict(protocol=2, results=[_row("syn_small_d8", base=0.7)])
    p = tmp_path / "suite.json"
    p.write_text(json.dumps(rec))
    subprocess.run(
        [sys.executable, str(ROOT / "tools" / "reaudit_suite.py"), str(p)],
        capture_output=True, text=True, check=True,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
             "PYTHONPATH": str(ROOT)})
    out = json.loads(p.read_text())["results"][0]
    assert out["baseline_ms"] == 0.7                 # measurement untouched
    assert out["forward_ms"] == {"16": 5.0}
    rf = out["roofline"]
    assert rf["time_ms"] == 0.7
    assert 0 < rf["efficiency"] <= 1.0
    assert rf["serial_ms"] > 0


def test_suite_report_rmat_delta_table(tmp_path):
    """--rmat pairs '<name>@rmat' rows with their power-law stand-ins and
    prints signed per-phase deltas plus a max-|delta| bound line."""
    base = dict(protocol=2, results=[_row("s24_x", base=10.0)])
    rmat = dict(protocol=2, results=[
        dict(_row("s24_x@rmat", base=12.0),
             forward_ms={"16": 4.0}, backward_ms={"16": 5.0}),
        _row("s24_orphan@rmat"),        # no power twin: renders, no delta
    ])
    pb, pr = tmp_path / "b.json", tmp_path / "r.json"
    pb.write_text(json.dumps(base))
    pr.write_text(json.dumps(rmat))
    out = subprocess.run(
        [sys.executable, str(ROOT / "tools" / "suite_report.py"),
         "--rmat", str(pr), str(pb)],
        capture_output=True, text=True, check=True).stdout
    line = next(ln for ln in out.splitlines() if ln.startswith("| s24_x "))
    assert "+20%" in line                # baseline 10 -> 12
    assert "-20%" in line                # fwd16 5 -> 4
    assert "+25%" in line                # bwd16 4 -> 5
    assert any(ln.startswith("| s24_orphan ") for ln in out.splitlines())
    assert "max |delta|" in out


def test_suite_report_coo_table(tmp_path):
    """--coo renders CSR-vs-COO rows and skips rows without coo_ms."""
    rec = dict(protocol=2, results=[
        dict(_row("g_coo", base=5.0), coo_ms=50.0),
        _row("g_nocoo"),
    ])
    p = tmp_path / "coo.json"
    p.write_text(json.dumps(rec))
    out = subprocess.run(
        [sys.executable, str(ROOT / "tools" / "suite_report.py"),
         "--coo", str(p)],
        capture_output=True, text=True, check=True).stdout
    assert "g_coo" in out and "0.10x" in out
    assert "g_nocoo" not in out
