#!/usr/bin/env python
"""Kernel benchmark CLI — the TPU replica of the reference's benchmark
drivers (`./maxk_kernel_test [graph]`, reference kernels/main.cu:187-222,
and `python main_runner_direct.py [graph]`, main_runner_direct.py:215-307).

Usage:
  python kernel_bench.py                      # all graphs in --graphs dir,
                                              # or synthetic suite if absent
  python kernel_bench.py reddit.dgl           # one graph
  python kernel_bench.py --json out.json      # export results

Graphs are the reference wire format: <name>.indptr/<name>.indices int32
binaries (kernels/util.h:8-24).
"""

import argparse
import json
import sys


def _resume_rows(path):
    """Load a --resume-json record, keeping only rows measured under the
    CURRENT timing protocol. Pre-protocol / stale-protocol rows are
    dropped (re-measured): the round-3 record mixed jitter-era sub-ms
    timings into reruns because resume skipped by name alone."""
    import os.path
    from maxk_tpu.bench.harness import GraphBenchResult, PROTOCOL
    if not path or not os.path.exists(path):
        return [], []
    with open(path) as f:
        prior = json.load(f).get("results", [])
    rows = [GraphBenchResult.from_json(r) for r in prior]
    keep = [r for r in rows if r.protocol == PROTOCOL]
    stale = sorted(r.graph for r in rows if r.protocol != PROTOCOL)
    return keep, stale


def _fill_column(args, label, lacks, measure):
    """Measure ONE missing column for resume-JSON rows that lack it.

    Regenerates each graph by name (binary dir first, synthetic suite
    fallback — same resolution as the main path), runs ONLY `measure`
    (which mutates the row in place), and rewrites --json with the
    augmented rows after every graph. Backs --fill-fused-mask and
    --fill-coo: targeted augmentation of a multi-hour suite record
    without re-measuring its other columns."""
    import os.path
    from maxk_tpu.bench.harness import synthetic_by_name
    from maxk_tpu.data.loaders import load_csr_binary, available_graphs

    src = args.resume_json or args.json
    rows, stale = _resume_rows(src)
    with open(src) as f:
        record = json.load(f)   # preserve partial/geomean/protocol keys
    if stale:
        print(f"# fill: {len(stale)} stale-protocol rows left untouched: "
              f"{', '.join(stale)}", file=sys.stderr)
    only = set(args.only or [])
    todo = [r for r in rows if lacks(r)
            and (not only or r.graph in only)]
    print(f"# fill-{label}: {len(todo)}/{len(rows)} rows to measure",
          file=sys.stderr)
    binaries = set(available_graphs(args.graphs)) \
        if os.path.isdir(args.graphs) else set()
    for r in todo:
        stem, gen = (r.graph.rsplit("@", 1) if "@" in r.graph
                     else (r.graph, "power"))
        if stem in binaries:
            csr = load_csr_binary(args.graphs, stem)
        else:
            csr = synthetic_by_name(stem, generator=gen)
        if csr is None:
            print(f"# {r.graph}: no graph source, skipped", file=sys.stderr)
            continue
        print(f"# {r.graph}: V={csr.n_nodes} E={csr.n_edges}",
              file=sys.stderr)
        try:
            measure(r, csr)
        except Exception as e:  # noqa: BLE001 — keep filling other rows
            print(f"# {r.graph}: FAILED ({type(e).__name__}: "
                  f"{str(e)[:200]})", file=sys.stderr)
            continue
        if args.json:
            # Only the measured rows change in place (stale-protocol rows
            # pass through untouched); partial/geomean keys keep their
            # original (row-completeness) semantics.
            filled = {x.graph: x.as_json() for x in rows}
            record["results"] = [filled.get(orig.get("graph"), orig)
                                 for orig in record["results"]]
            with open(args.json, "w") as f:
                json.dump(record, f, indent=2)
    return 0


def _fill_fused_mask(args):
    from maxk_tpu.bench.harness import measure_fused_mask

    def measure(r, csr):
        ks = sorted(r.forward_ms) or list(args.ks)
        r.fused_mask_ms = measure_fused_mask(csr, dim=r.dim, ks=ks)

    return _fill_column(args, "fused-mask",
                        lambda r: not r.fused_mask_ms, measure)


def _fill_coo(args):
    from maxk_tpu.bench.harness import measure_coo

    def measure(r, csr):
        r.coo_ms = measure_coo(csr, dim=r.dim)

    return _fill_column(args, "coo", lambda r: not r.coo_ms, measure)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("graph", nargs="?", default=None,
                    help="single graph name (default: traverse all)")
    ap.add_argument("--graphs", default="./graphs",
                    help="dir with <name>.indptr/.indices binaries")
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--ks", type=int, nargs="+", default=[16, 32, 64])
    ap.add_argument("--no-validate", action="store_true")
    ap.add_argument("--no-gnna", action="store_true")
    ap.add_argument("--coo", action="store_true",
                    help="also time the COO SpMM baseline (the reference's "
                         "cuSPARSE COO path; slow scatter-add comparator)")
    ap.add_argument("--no-fused-mask", action="store_true",
                    help="skip the mask-path fused forward column "
                         "(fused_mask_ms: the production training route)")
    ap.add_argument("--fill-fused-mask", action="store_true",
                    help="targeted augmentation: measure ONLY fused_mask_ms "
                         "for rows in --resume-json that lack it, rewrite "
                         "--json, and exit (no other columns touched)")
    ap.add_argument("--fill-coo", action="store_true",
                    help="targeted augmentation: measure ONLY coo_ms "
                         "for rows in --resume-json that lack it (same "
                         "contract as --fill-fused-mask)")
    ap.add_argument("--only", nargs="+", default=None,
                    help="restrict a --fill-* pass to these row names "
                         "(e.g. the deg>50 core for --fill-coo)")
    ap.add_argument("--large", action="store_true",
                    help="include reddit/products-scale synthetic shapes "
                         "(minutes of host tiling + GBs of transfer)")
    ap.add_argument("--suite24", action="store_true",
                    help="run the 24-graph shape-stand-in suite "
                         "(harness.SUITE24_SPECS) instead of the default "
                         "synthetic suite — hours of TPU time")
    ap.add_argument("--json", default=None, help="write results JSON here")
    ap.add_argument("--resume-json", default=None,
                    help="load finished graphs from this results JSON and "
                         "skip them (continue an interrupted suite run); "
                         "typically the same path as --json")
    ap.add_argument("--generator", default="power",
                    choices=["power", "rmat"],
                    help="synthetic suite-graph generator: 'rmat' re-runs "
                         "the same (V, degree) shapes under R-MAT topology "
                         "to bound the stand-ins' topology sensitivity; "
                         "result names get an '@rmat' suffix")
    args = ap.parse_args()

    import os
    import jax
    # The axon sitecustomize overwrites JAX_PLATFORMS at import time;
    # honor an explicit env choice (CPU smoke runs) like train.py.
    from maxk_tpu.platform import honor_env_platforms
    honor_env_platforms()

    from maxk_tpu.data.loaders import load_csr_binary, available_graphs
    from maxk_tpu.bench.harness import (benchmark_graph, analyze_speedups,
                                        synthetic_suite)

    if args.fill_fused_mask:
        return _fill_fused_mask(args)
    if args.fill_coo:
        return _fill_coo(args)

    if args.graph:
        stem = args.graph.removesuffix(".indptr")
        if stem in available_graphs(args.graphs):
            graphs = [(stem, load_csr_binary(args.graphs, stem))]
        else:
            # Fall back to a synthetic-suite graph by name (e.g.
            # `kernel_bench.py syn_products_shape` for a targeted rerun).
            # A '@<generator>' suffix in the name selects that generator
            # (recorded row names round-trip: 's24_yelp@rmat' reruns the
            # R-MAT variant regardless of --generator).
            from maxk_tpu.bench.harness import synthetic_by_name
            generator = args.generator
            if "@" in stem:
                stem, generator = stem.rsplit("@", 1)
            g = synthetic_by_name(stem, generator=generator)
            if g is None:
                print(f"# {stem}: no binary under {args.graphs} and no "
                      f"synthetic suite graph of that name", file=sys.stderr)
                return 2
            if generator != "power":
                stem = f"{stem}@{generator}"
            graphs = [(stem, g)]
    elif args.suite24:
        from maxk_tpu.bench.harness import suite24
        keep, _ = _resume_rows(args.resume_json)
        graphs = suite24(skip=frozenset(r.graph for r in keep),
                         generator=args.generator)
    else:
        names = available_graphs(args.graphs)
        if names:
            graphs = [(n, load_csr_binary(args.graphs, n)) for n in names]
        else:
            print(f"# no binary graphs under {args.graphs}; "
                  f"using synthetic suite", file=sys.stderr)
            graphs = synthetic_suite(large=args.large)

    results = []
    done = set()
    if args.resume_json:
        results, stale = _resume_rows(args.resume_json)
        done = {r.graph for r in results}
        if done:
            print(f"# resume: {len(done)} graphs already measured "
                  f"({', '.join(sorted(done))})", file=sys.stderr)
        if stale:
            print(f"# resume: {len(stale)} stale-protocol rows dropped, "
                  f"will re-measure: {', '.join(stale)}", file=sys.stderr)

    print("num graph dim_origin dim_k kernel time(ms)")
    errors = []
    for name, csr in graphs:
        if name in done:
            continue
        print(f"# {name}: V={csr.n_nodes} E={csr.n_edges} "
              f"avg_deg={csr.avg_degree:.1f}", file=sys.stderr)
        try:
            results.append(benchmark_graph(
                csr, name, dim=args.dim, ks=tuple(args.ks),
                validate=not args.no_validate, run_gnna=not args.no_gnna,
                run_coo=args.coo, run_fused_mask=not args.no_fused_mask))
        except Exception as e:  # noqa: BLE001 — a multi-hour traversal
            # must not lose the remaining graphs to one OOM (the giants
            # can exceed HBM with the validation oracles resident; the
            # reference's own check is disabled in its loop,
            # kernels/main.cu:154-161). The failure is recorded and the
            # run continues; rerun the graph alone with --no-validate.
            import traceback
            print(f"# {name}: FAILED ({type(e).__name__}: "
                  f"{str(e)[:300]})", file=sys.stderr)
            traceback.print_exc(limit=8)
            errors.append(name)
            continue
        if args.json:
            # Rewrite after every graph: a multi-hour suite must not
            # lose finished results to a crash on a later graph (the
            # remote tunnel can drop mid-run).
            from maxk_tpu.bench.harness import PROTOCOL
            with open(args.json, "w") as f:
                json.dump(dict(protocol=PROTOCOL,
                               results=[r.as_json() for r in results],
                               partial=True), f, indent=2)

    summary = analyze_speedups(results)

    failed = [r.graph for r in results
              if r.validation and not r.validation["passed"]]
    if failed:
        print(f"\nVALIDATION FAILURES: {failed}", file=sys.stderr)

    if args.json:
        from maxk_tpu.bench.harness import PROTOCOL
        with open(args.json, "w") as f:
            json.dump(dict(protocol=PROTOCOL,
                           results=[r.as_json() for r in results],
                           geomean_speedups=summary), f, indent=2)
        print(f"# wrote {args.json}", file=sys.stderr)

    if errors:
        print(f"\nBENCH ERRORS (not measured): {errors}", file=sys.stderr)
    return 1 if (failed or errors) else 0


if __name__ == "__main__":
    sys.exit(main())
