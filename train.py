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
    config = TrainConfig().parse_args()
    np.random.seed(config.seed)

    logger = get_logger(os.path.join(config.path, f"{config.dataset}.log"))
    writer = MetricsWriter(os.path.join(config.path, "tb"))
    writer.add_text("config", TrainConfig.as_markdown(config))
    TrainConfig.save_config(config)
    for k, v in sorted(vars(config).items()):
        logger.info(f"{k}={v}")

    import jax
    logger.info(f"backend={jax.default_backend()} devices={jax.devices()}")

    dataset = load_dataset(config.dataset, config.data_path,
                           selfloop=config.selfloop, seed=config.seed)
    logger.info(
        f"dataset={dataset.name} V={dataset.csr.n_nodes} "
        f"E={dataset.csr.n_edges} F={dataset.in_size} "
        f"classes={dataset.num_classes} multilabel={dataset.multilabel}")

    trainer = Trainer(config, dataset, logger=logger, writer=writer)

    if config.evaluate:
        # Evaluate-only mode: restore the latest checkpoint under the given
        # experiment path and report train/val/test metrics.
        from maxk_tpu.train.checkpoint import CheckpointManager
        ckpt = CheckpointManager(os.path.join(config.evaluate, "ckpt"))
        state, step = ckpt.restore(trainer.init_state())
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
