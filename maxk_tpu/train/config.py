"""Training configuration: argparse flag set mirroring the reference's
TrainConfig (reference utils/config.py:10-191) plus TPU-specific flags
(mesh shape, fused-kernel toggles, checkpointing) that replace the
reference's --gpu device selection.
"""

from __future__ import annotations

import argparse
import json
import os
import time
from pathlib import Path


class TrainConfig(argparse.ArgumentParser):
    """ArgumentParser subclass, reference-compatible flag names."""

    def __init__(self):
        super().__init__(description="maxk_tpu Training Configuration")

        # Dataset
        self.add_argument("--dataset", type=str, default="reddit",
                          choices=["reddit", "flickr", "yelp", "ogbn-arxiv",
                                   "ogbn-products", "ogbn-proteins",
                                   "synthetic"])
        self.add_argument("--data_path", type=str, default="./data/")

        # Model
        self.add_argument("--model", type=str, default="sage",
                          choices=["sage", "sage_fused", "gcn", "gin",
                                   "gnn_res"])
        self.add_argument("--hidden_dim", type=int, default=256)
        self.add_argument("--hidden_layers", type=int, default=3)
        self.add_argument("--dropout", type=float, default=0.5)
        self.add_argument("--norm", action="store_true", default=False)

        # MaxK
        self.add_argument("--nonlinear", type=str, default="maxk",
                          choices=["maxk", "relu"])
        self.add_argument("--maxk", type=int, default=32)

        # Training
        self.add_argument("--epochs", type=int, default=1000)
        self.add_argument("--patience", type=int, default=0,
                          help="Early stop after N evals without val "
                               "improvement (reference integrated driver "
                               "uses 100, maxk_gnn_integrated.py:166-209; "
                               "0 = off)")
        self.add_argument("--w_lr", type=float, default=0.01)
        self.add_argument("--w_weight_decay", type=float, default=0.0)
        self.add_argument("--enable_lookahead", action="store_true",
                          default=False)
        self.add_argument("--seed", type=int, default=97)
        self.add_argument("--selfloop", action="store_true", default=False)

        # Output
        self.add_argument("--path", type=str, default=None)
        self.add_argument("--evaluate", type=str, default=None)
        self.add_argument("--log_every", type=int, default=1,
                          help="Epoch metric-log frequency")
        self.add_argument("--eval_every", type=int, default=1,
                          help="Eval frequency (the reference DGL driver "
                               "evaluates every epoch, maxk_gnn_dgl.py:101)")
        self.add_argument("--save_every", type=int, default=500,
                          help="Checkpoint frequency in epochs (0 = off)")
        self.add_argument("--resume", action="store_true", default=False,
                          help="Resume from the latest checkpoint in --path")

        # TPU execution (replaces the reference's --gpu flag)
        self.add_argument("--n_devices", type=int, default=0,
                          help="Devices in the graph mesh; >1 selects the "
                               "row-partitioned DistTrainer with halo "
                               "exchange, 0/1 = single-device trainer")
        self.add_argument("--model_parallel", type=int, default=1,
                          help="Tensor-parallel size over the feature dim "
                               "(second mesh axis); n_devices must be "
                               "divisible by it. 1 = graph-only mesh")
        # Multi-host (SURVEY §2.4 north star: N>=2 hosts). On a TPU pod
        # slice --distributed alone suffices (jax.distributed.initialize
        # autodetects); elsewhere pass the explicit coordinator triplet.
        self.add_argument("--distributed", action="store_true",
                          default=False,
                          help="Call jax.distributed.initialize before "
                               "backend init (multi-host training); "
                               "implied by --num_processes > 1")
        self.add_argument("--coordinator", type=str, default=None,
                          help="host:port of process 0 (omit on TPU pods "
                               "— autodetected from metadata)")
        self.add_argument("--num_processes", type=int, default=None,
                          help="total processes in the job")
        self.add_argument("--process_id", type=int, default=None,
                          help="this process's rank in [0, num_processes)")
        self.add_argument("--local_device_count", type=int, default=None,
                          help="force N virtual CPU devices per process "
                               "(multi-process emulation/testing)")
        self.add_argument("--no_halo", dest="halo", action="store_false",
                          default=True,
                          help="Disable the neighbor-selective halo "
                               "exchange (fall back to full all-gather)")
        self.add_argument("--compute_dtype", type=str, default="bfloat16",
                          choices=["bfloat16", "float32"],
                          help="SpMM MXU input dtype (accumulation is fp32)")
        self.add_argument("--profile", action="store_true", default=False,
                          help="Capture a jax.profiler trace of one epoch")
        self.add_argument("--timing", action="store_true", default=False,
                          help="Report per-epoch wall-clock timing")
        self.add_argument("--debug", action="store_true", default=False)

    def parse_args(self, args=None, namespace=None):
        config = super().parse_args(args, namespace)
        if config.nonlinear == "maxk" and config.maxk > config.hidden_dim:
            self.error(
                f"--maxk {config.maxk} exceeds --hidden_dim "
                f"{config.hidden_dim}: MaxK keeps k of the hidden "
                f"channels, so k must be <= hidden_dim (the reference's "
                f"torch.topk would fail the same way at the first layer)")
        if config.path is None:
            ts = time.strftime("%Y%m%d_%H%M%S")
            config.path = (f"experiments/{config.dataset}_{config.model}"
                           f"_maxk{config.maxk}_{ts}")
        Path(config.path).mkdir(parents=True, exist_ok=True)
        return config

    @staticmethod
    def save_config(config, filename: str = "config.json"):
        out = Path(config.path) / filename
        with open(out, "w") as f:
            json.dump(vars(config), f, indent=2, default=str)
        return out

    @staticmethod
    def as_markdown(config) -> str:
        lines = ["|name|value|", "|-|-|"]
        lines += [f"|{k}|{v}|" for k, v in sorted(vars(config).items())]
        return "\n".join(lines)


DEFAULT_CONFIG = {
    "dataset": "reddit",
    "model": "sage",
    "hidden_dim": 256,
    "hidden_layers": 3,
    "dropout": 0.5,
    "nonlinear": "maxk",
    "maxk": 32,
    "epochs": 1000,
    "w_lr": 0.01,
    "w_weight_decay": 0.0,
    "seed": 97,
}
