from maxk_tpu.train.config import TrainConfig
from maxk_tpu.train.loop import Trainer, TrainResults
from maxk_tpu.train import metrics, optim

__all__ = ["TrainConfig", "Trainer", "TrainResults", "metrics", "optim"]
