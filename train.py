#!/usr/bin/env python
"""maxk_tpu training CLI — the reference driver's role (maxk_gnn_dgl.py)
on TPU: full-graph node classification with MaxK models.

Usage (mirrors the reference launch scripts, scripts_train/*.sh):
  python train.py --dataset flickr --model sage --hidden_layers 3 \\
      --hidden_dim 256 --nonlinear maxk --maxk 32 --norm --selfloop \\
      --dropout 0.2 --w_lr 0.001 --epochs 400 --data_path ./data/
"""

import os

import numpy as np

from maxk_tpu.train.config import TrainConfig
from maxk_tpu.train.logging_utils import get_logger, MetricsWriter
from maxk_tpu.train.loop import Trainer
from maxk_tpu.data.datasets import load_dataset


def main():
    # The axon sitecustomize overwrites JAX_PLATFORMS at import time;
    # re-assert the user's env choice via jax.config (works pre-backend),
    # keeping the host cpu backend reachable (maxk_tpu.platform).
    from maxk_tpu.platform import honor_env_platforms
    honor_env_platforms()

    config = TrainConfig().parse_args()
    np.random.seed(config.seed)

    # Multi-host bootstrap BEFORE any backend initialization: after it,
    # jax.devices() is the pod-global list and the mesh spans hosts.
    import jax
    if (config.local_device_count or config.distributed
            or (config.num_processes or 0) > 1):
        # init_distributed also owns the virtual-device XLA flag (must
        # precede backend init); a local_device_count without a
        # multi-process job just sets the flag and returns.
        from maxk_tpu.parallel.mesh import init_distributed
        init_distributed(coordinator=config.coordinator,
                         num_processes=config.num_processes,
                         process_id=config.process_id,
                         local_device_count=config.local_device_count,
                         enable=bool(config.distributed
                                     or (config.num_processes or 0) > 1))
    proc0 = jax.process_index() == 0

    # Per-process side effects: every process computes, process 0 logs
    # and checkpoints (replicated state makes its shards addressable
    # everywhere, so one writer suffices and files never race).
    logger = get_logger(
        os.path.join(config.path, f"{config.dataset}.log")) if proc0 \
        else get_logger(None)
    writer = MetricsWriter(os.path.join(config.path, "tb")) if proc0 \
        else MetricsWriter(None)
    if proc0:
        writer.add_text("config", TrainConfig.as_markdown(config))
        TrainConfig.save_config(config)
        for k, v in sorted(vars(config).items()):
            logger.info(f"{k}={v}")
    logger.info(f"backend={jax.default_backend()} "
                f"process={jax.process_index()}/{jax.process_count()} "
                f"devices={len(jax.devices())} "
                f"local={len(jax.local_devices())}")
    if jax.default_backend() == "cpu" and config.compute_dtype == "bfloat16":
        logger.info("hint: bfloat16 matmuls are software-emulated on the "
                    "CPU backend (very slow; XLA's collective watchdog can "
                    "abort multi-device runs) — pass --compute_dtype "
                    "float32 for CPU validation runs")

    dataset = load_dataset(config.dataset, config.data_path,
                           selfloop=config.selfloop, seed=config.seed)
    logger.info(
        f"dataset={dataset.name} V={dataset.csr.n_nodes} "
        f"E={dataset.csr.n_edges} F={dataset.in_size} "
        f"classes={dataset.num_classes} multilabel={dataset.multilabel}")

    if (getattr(config, "n_devices", 0) > 1
            or getattr(config, "model_parallel", 1) > 1
            or jax.process_count() > 1):
        # Multi-chip training: row-partitioned graph mesh with
        # neighbor-selective halo exchange, optionally crossed with a
        # tensor-parallel model axis (maxk_tpu.parallel).
        from maxk_tpu.parallel.dist_train import DistTrainer
        trainer = DistTrainer(config, dataset, logger=logger, writer=writer)
        logger.info(f"distributed trainer: {trainer.n_shards}-way graph x "
                    f"{trainer.model_parallel}-way model mesh, "
                    f"halo exchange "
                    f"{'on' if trainer.sharded._any.send_idx is not None else 'off (no cross-shard edges)'}")
    else:
        trainer = Trainer(config, dataset, logger=logger, writer=writer)

    if config.evaluate:
        # Evaluate-only mode: restore the latest checkpoint under the given
        # experiment path and report train/val/test metrics.
        from maxk_tpu.train.checkpoint import CheckpointManager
        ckpt = CheckpointManager(os.path.join(config.evaluate, "ckpt"))
        state, step = ckpt.restore(trainer.init_state())
        state = trainer._place_state(state)   # re-replicate on a mesh
        ckpt.close()
        train_acc, val_acc, test_acc = trainer.evaluate_masks(state)
        logger.info(f"Evaluate-only @ epoch {step}: "
                    f"Train {train_acc:.4f} | Val {val_acc:.4f} | "
                    f"Test {test_acc:.4f}")
        writer.close()
        return dict(epoch=step, train=train_acc, val=val_acc, test=test_acc)

    logger.info("Training...")
    results = trainer.fit()

    logger.info("Testing...")
    logger.info(f"Best val accuracy {results.best_val:.4f} "
                f"(epoch {results.best_epoch})")
    logger.info(f"Best test accuracy {results.best_test:.4f}")
    logger.info(f"Test accuracy {results.final_test:.4f}")
    writer.close()
    return results


if __name__ == "__main__":
    main()
