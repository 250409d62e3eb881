#!/usr/bin/env python
"""Full-graph training epoch benchmark (the BASELINE.md "reddit epoch
time" north star).

Builds a reddit-shaped synthetic graph by default (V=233k, avg degree
~492, 602 features, 41 classes — the real dataset's shape; the binary
suite / preprocessed .npz is used instead when present), then times the
jitted training step and the full-graph evaluation forward separately.

Usage:
  python train_bench.py                    # reddit-shaped synthetic
  python train_bench.py --dataset reddit --data_path ./data/
  python train_bench.py --n-nodes 100000 --avg-degree 50
"""

import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default=None,
                    help="real dataset name (needs .npz under --data_path)")
    ap.add_argument("--data_path", default="./data/")
    ap.add_argument("--model", default="sage")
    ap.add_argument("--hidden_dim", type=int, default=256)
    ap.add_argument("--hidden_layers", type=int, default=4)
    ap.add_argument("--maxk", type=int, default=32)
    ap.add_argument("--nonlinear", default="maxk", choices=["maxk", "relu"])
    ap.add_argument("--n-nodes", type=int, default=232965)
    ap.add_argument("--avg-degree", type=float, default=246.0,
                    help="one-direction degree; symmetrization doubles it")
    ap.add_argument("--in-size", type=int, default=602)
    ap.add_argument("--n-classes", type=int, default=41)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--compute_dtype", default="bfloat16")
    args = ap.parse_args()

    import os
    import numpy as np
    import jax
    # The axon sitecustomize overwrites JAX_PLATFORMS at import time;
    # honor an explicit env choice (CPU smoke runs) like train.py.
    from maxk_tpu.platform import honor_env_platforms
    honor_env_platforms()

    from maxk_tpu.data.datasets import load_dataset, Dataset
    from maxk_tpu.data.loaders import synthetic_graph
    from maxk_tpu.train.loop import Trainer

    if args.dataset:
        ds = load_dataset(args.dataset, args.data_path)
        name = args.dataset
    else:
        rng = np.random.default_rng(123)
        csr = synthetic_graph(args.n_nodes, args.avg_degree, seed=123,
                              power_law=True, symmetric=True)
        v = csr.n_nodes
        ds = Dataset(
            name="synthetic-reddit", csr=csr,
            features=rng.normal(size=(v, args.in_size)).astype(np.float32),
            labels=rng.integers(0, args.n_classes, size=v),
            train_mask=rng.uniform(size=v) < 0.66,
            val_mask=rng.uniform(size=v) < 0.1,
            test_mask=rng.uniform(size=v) < 0.2,
            num_classes=args.n_classes, multilabel=False,
            metric="micro_f1", symmetric=True)
        name = ds.name
    print(f"# {name}: V={ds.csr.n_nodes} E={ds.csr.n_edges} "
          f"F={ds.in_size} backend={jax.default_backend()}", file=sys.stderr)

    class Cfg:
        pass
    cfg = Cfg()
    cfg.model = args.model
    cfg.hidden_dim = args.hidden_dim
    cfg.hidden_layers = args.hidden_layers
    cfg.maxk = args.maxk
    cfg.dropout = 0.5
    cfg.norm = True
    cfg.nonlinear = args.nonlinear
    cfg.w_lr = 0.01
    cfg.w_weight_decay = 0.0
    cfg.enable_lookahead = False
    cfg.seed = 97
    cfg.compute_dtype = args.compute_dtype

    t0 = time.perf_counter()
    tr = Trainer(cfg, ds)
    print(f"# graph build + device put: {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)

    state = tr.init_state()
    rng = jax.random.PRNGKey(0)

    # Chained-dispatch differencing protocol (maxk_tpu.bench.timing):
    # wall-clocking a dispatch loop measures the remote tunnel's per-call
    # overhead (~130 ms/step through axon), not the device. time_fn
    # subtracts it, matching how every kernel number is measured.
    from maxk_tpu.bench.timing import time_fn
    state, loss = tr._jit_step(state, rng)      # compile
    np.asarray(loss)
    t = time_fn(lambda: tr._jit_step(state, rng)[1],
                warmup=2, runs=max(2, args.epochs))
    step_ms = t.mean_ms

    np.asarray(tr._jit_logits(state))  # compile eval
    t = time_fn(lambda: tr._jit_logits(state), warmup=2, runs=4)
    eval_ms = t.mean_ms

    out = dict(metric="train_step_ms", graph=name,
               n_nodes=ds.csr.n_nodes, n_edges=ds.csr.n_edges,
               model=args.model, nonlinear=args.nonlinear, k=args.maxk,
               hidden=args.hidden_dim, layers=args.hidden_layers,
               train_step_ms=round(step_ms, 2),
               eval_forward_ms=round(eval_ms, 2),
               loss=float(loss))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
