"""GNN model family: SAGE / GCN / GIN / GNN_res, TPU-native.

Behavioral parity with the reference model zoo (utils/models.py:151-454),
re-designed as flax.linen modules over the maxk_tpu ops:

- SAGE  (reference utils/models.py:151-297, published-accuracy fallback
  path :274-290): lin_in -> per layer [nonlinear -> mean-neighbor
  aggregation; h = fc_self(x) + fc_neigh(x_agg); dropout; LayerNorm?]
  -> lin_out. With nonlinear='maxk' the aggregation is the fused
  maxk_spgemm custom-VJP op (TopK -> CBSR -> SpGEMM; backward SSpMM).
- GCN   (reference :300-345): lin_in.relu -> per layer [Linear ->
  MaxK/ReLU -> Dropout -> sym-normalized GraphConv (+bias) -> LayerNorm?]
  -> lin_out.
- GIN   (reference :347-392): same shell with GINConv(learn_eps):
  (1+eps)*x + sum-neighbor aggregation.
- GNNRes (reference :394-454): residual blocks
  [res=Linear(x); x=GraphConv(x); BatchNorm?; Linear; ReLU; Dropout;
   Linear; MaxK/ReLU; x=res+x; ReLU; Dropout] -> lin_out.

All models share the constructor signature
(in_size, hid_size, num_hid_layers, out_size, maxk, feat_drop, norm,
nonlinear) from the reference, take graphs as call-time pytree arguments
(jit/pjit-friendly — no graph state captured in parameters), and use
xavier-uniform kernel init (reference :188-192,321-326).

Aggregation normalizations are baked into graph edge values at load time
(CSRGraph.normalize): SAGE expects 'mean', GCN/GNNRes expect 'sym',
GIN expects 'none' (sum). GraphBundle carries all of them.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn
from flax import struct

from maxk_tpu.ops.graph import CSRGraph, TiledGraph, build_tiled_graph
from maxk_tpu.ops.maxk import maxk
from maxk_tpu.ops.spmm import spmm, spmm_t
from maxk_tpu.ops.spgemm import maxk_spgemm

_xavier = nn.initializers.xavier_uniform()


# Aggregations each model family consumes (the transpose of the same
# normalization backs the fused backward SSpMM).
MODEL_NORMS = {"sage": ("mean",), "sage_fused": ("mean",),
               "gcn": ("sym",), "gin": ("sum",), "gnn_res": ("sym",)}


@struct.dataclass
class GraphBundle:
    """Tiled graphs for every aggregation a model family may need.

    g_mean/g_sum/g_sym carry mean-, un-, and symmetric-normalized edge
    values; *_t are the matching transposes used by fused backward SSpMM.
    Built once at data-load time; a jit-traceable pytree. Pass
    ``norms=("mean",)`` etc. to build only what a model uses — tile
    metadata is ~12 bytes/edge per entry, so the full bundle costs
    6 x 12 B/edge of HBM (~8 GB at reddit scale) while one model needs
    a third of that.
    """

    g_mean: Optional[TiledGraph]
    g_mean_t: Optional[TiledGraph]
    g_sum: Optional[TiledGraph]
    g_sum_t: Optional[TiledGraph]
    g_sym: Optional[TiledGraph]
    g_sym_t: Optional[TiledGraph]

    @staticmethod
    def from_csr(csr: CSRGraph, row_block=None, edge_tile=None,
                 norms=("mean", "sum", "sym"),
                 symmetric: bool = False) -> "GraphBundle":
        """symmetric=True asserts A == A^T including edge values (undirected
        graph, uniform values). Then sum/sym-normalized matrices are their
        own transpose (aliased — no second build, half the HBM), and the
        mean transpose (D^-1 A)^T = A D^-1 shares A's sparsity structure,
        so it needs only a column-degree value rescale instead of the O(E)
        transpose counting sort."""
        import numpy as np

        def tg(c):
            return build_tiled_graph(c, row_block=row_block,
                                     edge_tile=edge_tile)

        # transpose(normalize(A)) == values-correct CSR of normalize(A)^T
        built = {}
        for norm in norms:
            base = csr.normalize("none" if norm == "sum" else norm)
            built[f"g_{norm}"] = tg(base)
            if symmetric and norm in ("sum", "sym"):
                built[f"g_{norm}_t"] = built[f"g_{norm}"]
            elif symmetric and norm == "mean":
                deg = np.maximum(np.diff(csr.indptr), 1).astype(np.float32)
                built[f"g_{norm}_t"] = tg(csr.with_values(
                    (csr.values / deg[csr.indices]).astype(np.float32)))
            else:
                built[f"g_{norm}_t"] = tg(base.transpose())
        return GraphBundle(
            g_mean=built.get("g_mean"), g_mean_t=built.get("g_mean_t"),
            g_sum=built.get("g_sum"), g_sum_t=built.get("g_sum_t"),
            g_sym=built.get("g_sym"), g_sym_t=built.get("g_sym_t"))

    @staticmethod
    def for_model(csr: CSRGraph, model_name: str,
                  row_block=None, edge_tile=None,
                  symmetric: bool = False) -> "GraphBundle":
        """Build only the aggregation(s) `model_name` consumes."""
        return GraphBundle.from_csr(
            csr, row_block=row_block, edge_tile=edge_tile,
            norms=MODEL_NORMS.get(model_name, ("mean", "sum", "sym")),
            symmetric=symmetric)


def _nonlinear(x, kind: str, k: int):
    if kind == "maxk":
        return maxk(x, k)
    if kind == "relu":
        return nn.relu(x)
    raise ValueError(f"unknown nonlinearity {kind!r}")


class SAGE(nn.Module):
    """GraphSAGE with fused MaxK aggregation.

    With nonlinear='maxk' the per-layer aggregation A_mean @ MaxK(x) runs
    through the fused maxk_spgemm (single TopK shared by the fc_self branch
    via x = MaxK(x) first — reference fallback semantics,
    utils/models.py:262-273, matching the published accuracy runs).
    """

    in_size: int
    hid_size: int
    num_hid_layers: int
    out_size: int
    maxk: int = 32
    feat_drop: float = 0.5
    norm: bool = False
    nonlinear: str = "maxk"
    compute_dtype: str = "bfloat16"   # SpMM MXU input dtype (fp32 accum)

    @nn.compact
    def __call__(self, graphs: GraphBundle, x, *, training: bool = False):
        x = nn.Dense(self.hid_size, kernel_init=_xavier, name="lin_in")(x)
        for i in range(self.num_hid_layers):
            if self.nonlinear == "maxk":
                # A @ MaxK(x) through the fused op — identical math to
                # maxk-then-spmm (same lax.top_k selection, same masked
                # gradient), but in distributed mode the halo exchange
                # moves CBSR instead of dense rows. fc_self still sees
                # the POST-MaxK x (published-accuracy semantics,
                # reference utils/models.py:262-273).
                x_agg = maxk_spgemm(graphs.g_mean, graphs.g_mean_t, x,
                                    self.maxk,
                                    compute_dtype=jnp.dtype(
                                        self.compute_dtype))
                x = maxk(x, self.maxk)
            else:
                x = nn.relu(x)
                x_agg = spmm_t(graphs.g_mean, graphs.g_mean_t, x,
                               compute_dtype=jnp.dtype(self.compute_dtype))
            h_self = nn.Dense(self.hid_size, use_bias=False,
                              kernel_init=_xavier, name=f"fc_self_{i}")(x)
            h_neigh = nn.Dense(self.hid_size, use_bias=False,
                               kernel_init=_xavier, name=f"fc_neigh_{i}")(x_agg)
            x = h_self + h_neigh
            x = nn.Dropout(self.feat_drop, deterministic=not training)(x)
            if self.norm:
                x = nn.LayerNorm(name=f"norm_{i}")(x)
        return nn.Dense(self.out_size, kernel_init=_xavier, name="lin_out")(x)


class SAGEFused(SAGE):
    """SAGE variant routing aggregation through the fused maxk_spgemm
    custom VJP (kernel-integrated path parity, utils/models.py:206-253:
    fc_self sees pre-MaxK x; aggregation is A_mean @ MaxK(x))."""

    @nn.compact
    def __call__(self, graphs: GraphBundle, x, *, training: bool = False):
        x = nn.Dense(self.hid_size, kernel_init=_xavier, name="lin_in")(x)
        for i in range(self.num_hid_layers):
            if self.nonlinear == "maxk":
                x_agg = maxk_spgemm(graphs.g_mean, graphs.g_mean_t,
                                    x, self.maxk,
                                    compute_dtype=jnp.dtype(self.compute_dtype))
            else:
                x = nn.relu(x)
                x_agg = spmm_t(graphs.g_mean, graphs.g_mean_t, x,
                               compute_dtype=jnp.dtype(self.compute_dtype))
            h_self = nn.Dense(self.hid_size, use_bias=False,
                              kernel_init=_xavier, name=f"fc_self_{i}")(x)
            h_neigh = nn.Dense(self.hid_size, use_bias=False,
                               kernel_init=_xavier, name=f"fc_neigh_{i}")(x_agg)
            x = h_self + h_neigh
            x = nn.Dropout(self.feat_drop, deterministic=not training)(x)
            if self.norm:
                x = nn.LayerNorm(name=f"norm_{i}")(x)
        return nn.Dense(self.out_size, kernel_init=_xavier, name="lin_out")(x)


class GCN(nn.Module):
    in_size: int
    hid_size: int
    num_hid_layers: int
    out_size: int
    maxk: int = 32
    feat_drop: float = 0.5
    norm: bool = False
    nonlinear: str = "maxk"
    compute_dtype: str = "bfloat16"   # SpMM MXU input dtype (fp32 accum)

    @nn.compact
    def __call__(self, graphs: GraphBundle, x, *, training: bool = False):
        x = nn.relu(nn.Dense(self.hid_size, kernel_init=_xavier,
                             name="lin_in")(x))
        for i in range(self.num_hid_layers):
            x = nn.Dense(self.hid_size, kernel_init=_xavier,
                         name=f"lin_{i}")(x)
            x = _nonlinear(x, self.nonlinear, self.maxk)
            x = nn.Dropout(self.feat_drop, deterministic=not training)(x)
            # dgl.nn.GraphConv(weight=None, bias=True), norm='both'
            x = spmm_t(graphs.g_sym, graphs.g_sym_t, x,
                       compute_dtype=jnp.dtype(self.compute_dtype))
            x = x + self.param(f"gconv_bias_{i}", nn.initializers.zeros,
                               (self.hid_size,))
            if self.norm:
                x = nn.LayerNorm(name=f"norm_{i}")(x)
        return nn.Dense(self.out_size, kernel_init=_xavier, name="lin_out")(x)


class GIN(nn.Module):
    in_size: int
    hid_size: int
    num_hid_layers: int
    out_size: int
    maxk: int = 32
    feat_drop: float = 0.5
    norm: bool = False
    nonlinear: str = "maxk"
    compute_dtype: str = "bfloat16"   # SpMM MXU input dtype (fp32 accum)

    @nn.compact
    def __call__(self, graphs: GraphBundle, x, *, training: bool = False):
        x = nn.relu(nn.Dense(self.hid_size, kernel_init=_xavier,
                             name="lin_in")(x))
        for i in range(self.num_hid_layers):
            x = nn.Dense(self.hid_size, kernel_init=_xavier,
                         name=f"lin_{i}")(x)
            x = _nonlinear(x, self.nonlinear, self.maxk)
            x = nn.Dropout(self.feat_drop, deterministic=not training)(x)
            # dgl.nn.GINConv(learn_eps=True, no apply_func):
            # (1 + eps) * x + sum-aggregated neighbors
            eps = self.param(f"gin_eps_{i}", nn.initializers.zeros, ())
            x = (1.0 + eps) * x + spmm_t(
                graphs.g_sum, graphs.g_sum_t, x,
                compute_dtype=jnp.dtype(self.compute_dtype))
            if self.norm:
                x = nn.LayerNorm(name=f"norm_{i}")(x)
        return nn.Dense(self.out_size, kernel_init=_xavier, name="lin_out")(x)


class GNNRes(nn.Module):
    in_size: int
    hid_size: int
    num_hid_layers: int
    out_size: int
    maxk: int = 32
    feat_drop: float = 0.5
    norm: bool = False
    nonlinear: str = "maxk"
    compute_dtype: str = "bfloat16"   # SpMM MXU input dtype (fp32 accum)
    # Mesh axis for cross-shard BatchNorm statistics (row-partitioned
    # training syncs mean/var over the graph axis; None = local stats).
    bn_axis: Optional[str] = None

    @nn.compact
    def __call__(self, graphs: GraphBundle, x, *, training: bool = False):
        x = nn.relu(nn.Dense(self.hid_size, kernel_init=_xavier,
                             name="lin_in")(x))
        for i in range(self.num_hid_layers):
            x_res = nn.Dense(self.hid_size, kernel_init=_xavier,
                             name=f"res_{i}")(x)
            x = spmm_t(graphs.g_sym, graphs.g_sym_t, x,
                       compute_dtype=jnp.dtype(self.compute_dtype))
            x = x + self.param(f"gconv_bias_{i}", nn.initializers.zeros,
                               (self.hid_size,))
            if self.norm:
                x = nn.BatchNorm(use_running_average=not training,
                                 axis_name=self.bn_axis,
                                 name=f"norm_{i}")(x)
            x = nn.Dense(self.hid_size, kernel_init=_xavier,
                         name=f"lin1_{i}")(x)
            x = nn.relu(x)
            x = nn.Dropout(self.feat_drop, deterministic=not training)(x)
            x = nn.Dense(self.hid_size, kernel_init=_xavier,
                         name=f"lin2_{i}")(x)
            x = _nonlinear(x, self.nonlinear, self.maxk)
            x = x_res + x
            x = nn.relu(x)
            x = nn.Dropout(self.feat_drop, deterministic=not training)(x)
        return nn.Dense(self.out_size, kernel_init=_xavier, name="lin_out")(x)


_MODELS = {"sage": SAGE, "sage_fused": SAGEFused, "gcn": GCN, "gin": GIN,
           "gnn_res": GNNRes}


def build_model(name: str, in_size: int, hid_size: int, num_hid_layers: int,
                out_size: int, maxk: int = 32, feat_drop: float = 0.5,
                norm: bool = False, nonlinear: str = "maxk",
                compute_dtype: str = "bfloat16",
                bn_axis: Optional[str] = None) -> nn.Module:
    """Factory matching the reference driver's model switch
    (maxk_gnn_dgl.py:208-215). bn_axis: mesh axis for cross-shard
    BatchNorm stats (gnn_res only; distributed training passes the graph
    axis)."""
    try:
        cls = _MODELS[name]
    except KeyError:
        raise ValueError(
            f"unknown model {name!r}; choose from {sorted(_MODELS)}")
    kwargs = dict(in_size=in_size, hid_size=hid_size,
                  num_hid_layers=num_hid_layers, out_size=out_size,
                  maxk=maxk, feat_drop=feat_drop, norm=norm,
                  nonlinear=nonlinear, compute_dtype=compute_dtype)
    if name == "gnn_res":
        kwargs["bn_axis"] = bn_axis
    return cls(**kwargs)
