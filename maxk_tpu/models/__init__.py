from maxk_tpu.models.models import SAGE, GCN, GIN, GNNRes, build_model, GraphBundle

__all__ = ["SAGE", "GCN", "GIN", "GNNRes", "build_model", "GraphBundle"]
