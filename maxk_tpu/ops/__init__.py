from maxk_tpu.ops.graph import CSRGraph, TiledGraph, PartedGraph, \
    build_tiled_graph
from maxk_tpu.ops.spmm import spmm, spmm_dense_oracle, spmm_segment
from maxk_tpu.ops.maxk import maxk
from maxk_tpu.ops.cbsr import cbsr_topk, cbsr_expand
from maxk_tpu.ops.spgemm import maxk_spgemm
from maxk_tpu.ops.pallas_spmm import spmm_pallas
from maxk_tpu.ops.pallas_topk import maxk_pallas, cbsr_topk_pallas

__all__ = [
    "CSRGraph",
    "TiledGraph",
    "PartedGraph",
    "build_tiled_graph",
    "spmm",
    "spmm_dense_oracle",
    "spmm_segment",
    "maxk",
    "cbsr_topk",
    "cbsr_expand",
    "maxk_spgemm",
    "spmm_pallas",
    "maxk_pallas",
    "cbsr_topk_pallas",
]
