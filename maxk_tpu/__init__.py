"""maxk_tpu — a TPU-native sparse linear-algebra + GNN-training framework.

Built from scratch in JAX/XLA/Pallas, reproducing the capability set of
MaxK-GNN (reference: julius-sk/spgemm-new, ASPLOS'24) with a TPU-first
architecture:

- CSR/COO SpMM for full-graph aggregation, executed as row-block-tiled
  one-hot matmuls on the MXU (race-free by construction; no atomics).
- CBSR format: per-node top-k values + int32 column selectors (exact fp32
  TopK — fixes the reference's uint8-quantization defect,
  reference kernels/maxk_kernel.cu + cuda_kernel_bindings.cpp:211-231).
- Fused MaxK forward SpGEMM + backward sampled SSpMM under a single
  jax.custom_vjp (reference kernels/spmm_maxk.cu, spmm_maxk_backward.cu).
- SAGE / GCN / GIN / GNN_res models + full-graph training recipes
  (reference utils/models.py, maxk_gnn_dgl.py).
- Multi-chip scaling: row-partitioned adjacency with CBSR-compressed
  feature exchange over ICI via shard_map (new capability vs reference).
"""

__version__ = "0.1.0"

from maxk_tpu.ops.graph import CSRGraph, TiledGraph, PartedGraph, \
    build_tiled_graph
from maxk_tpu.ops.spmm import spmm, spmm_dense_oracle, spmm_segment
from maxk_tpu.ops.maxk import maxk
from maxk_tpu.ops.cbsr import cbsr_topk, cbsr_expand
from maxk_tpu.ops.spgemm import maxk_spgemm
from maxk_tpu.ops.pallas_spmm import spmm_pallas

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
    "__version__",
]
