from maxk_tpu.data.loaders import (
    load_csr_binary, save_csr_binary, available_graphs, synthetic_graph)
from maxk_tpu.data.datasets import Dataset, load_dataset, DATASET_REGISTRY

__all__ = [
    "load_csr_binary", "save_csr_binary", "available_graphs",
    "synthetic_graph", "Dataset", "load_dataset", "DATASET_REGISTRY",
]
