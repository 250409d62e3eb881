"""Fused MaxK SpGEMM: y = A @ MaxK_k(x) with a sampled-sparse backward.

One jax.custom_vjp replaces the reference's entire kernel sandwich
(TopK kernel -> CBSR pack -> forward SpGEMM kernel -> backward SSpMM kernel
-> Python scatter loop; reference utils/models.py:61-149,
kernels/spmm_maxk.cu, kernels/spmm_maxk_backward.cu):

forward:  (v, s) = cbsr_topk(x, k)          # exact fp32 TopK -> CBSR
          y      = A @ expand(v, s)         # tiled MXU SpMM (ops.spmm)
backward: dS     = A^T @ dy                 # transpose-side tiled SpMM
          g_cbsr = dS[i, s[i, l]]           # sampled at TopK positions —
                                            # the reference SSpMM's (V, k)
                                            # output layout, race-free
          dx     = expand(g_cbsr, s)        # == topk_mask * (A^T @ dy)

Design notes (TPU-first, not a port):
- The reference expands CBSR per *edge* inside the forward kernel
  (kernels/spmm_maxk.cu:66-98) because GPU lanes scatter to shared memory
  cheaply. TPU VPUs cannot scatter, so expansion happens once per *node*
  (V*k*D work instead of E*k*D) and the SpMM runs on the expanded k-sparse
  matrix through the MXU. CBSR remains the storage and wire format; its
  per-edge traffic advantage is realized in the distributed halo exchange
  (maxk_tpu.parallel) rather than in single-chip HBM gathers.
- The backward needs A^T. The reference silently reuses the forward CSR
  (valid only for symmetric graphs); here the transpose is precomputed once
  at graph load and passed explicitly, so directed graphs are correct too.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from maxk_tpu.ops.graph import TiledGraph
from maxk_tpu.ops.cbsr import cbsr_topk, cbsr_expand, cbsr_gather
from maxk_tpu.ops.spmm import spmm


def spgemm_forward_cbsr(g: TiledGraph, values: jax.Array,
                        selector: jax.Array, dim: int,
                        compute_dtype=None) -> jax.Array:
    """Forward SpGEMM consuming CBSR directly: A @ expand(values, selector).

    API parity with the reference's stateless kernel entry point
    ``maxk_cuda_kernels.spmm_maxk_forward`` (cuda_kernel_bindings.cpp:42-104).

    Row-partitioned execution (g.gather_axis set): the all-gather moves the
    COMPRESSED (V, k) values + selectors over ICI instead of the (V, D)
    dense matrix — k*(4+4)/D*4 of the dense halo bytes. This is the
    distributed payoff of the CBSR format (SURVEY.md section 2.4).
    """
    if g.gather_axis is not None:
        values = jax.lax.all_gather(values, g.gather_axis, axis=0, tiled=True)
        selector = jax.lax.all_gather(selector, g.gather_axis, axis=0,
                                      tiled=True)
        g = g.replace(gather_axis=None)
    return spmm(g, cbsr_expand(values, selector, dim),
                compute_dtype=compute_dtype)


def sspmm_sampled(g_t: TiledGraph, dy: jax.Array, selector: jax.Array,
                  compute_dtype=None) -> jax.Array:
    """Backward SSpMM: grad sampled at TopK positions, output (V, k).

    g_cbsr[i, l] = sum_{j in N_in(i)} A[j, i] * dy[j, selector[i, l]]

    API parity with ``maxk_cuda_kernels.spmm_maxk_backward``
    (cuda_kernel_bindings.cpp:107-161); g_t is the precomputed transpose.
    """
    ds = spmm(g_t, dy, compute_dtype=compute_dtype)
    return cbsr_gather(ds, selector)


from functools import partial


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _fused(k: int, compute_dtype_name: Optional[str],
           g: TiledGraph, g_t: TiledGraph, x: jax.Array) -> jax.Array:
    cd = None if compute_dtype_name is None else jnp.dtype(compute_dtype_name)
    v, s = cbsr_topk(x, k)
    return spgemm_forward_cbsr(g, v, s, x.shape[1], cd)


def _fused_fwd(k, compute_dtype_name, g, g_t, x):
    cd = None if compute_dtype_name is None else jnp.dtype(compute_dtype_name)
    v, s = cbsr_topk(x, k)
    y = spgemm_forward_cbsr(g, v, s, x.shape[1], cd)
    return y, (s, g_t, x.shape[1])


def _fused_bwd(k, compute_dtype_name, res, dy):
    cd = None if compute_dtype_name is None else jnp.dtype(compute_dtype_name)
    s, g_t, dim = res
    g_cbsr = sspmm_sampled(g_t, dy, s, cd)
    dx = cbsr_expand(g_cbsr, s, dim)
    return (None, None, dx)  # no cotangents for the graph pytrees


_fused.defvjp(_fused_fwd, _fused_bwd)


def maxk_spgemm(g: TiledGraph, g_t: TiledGraph, x: jax.Array, k: int,
                compute_dtype: Optional[jnp.dtype] = None) -> jax.Array:
    """Fused y = A @ MaxK_k(x) with custom VJP.

    Graphs are formal (non-differentiated) arguments of the custom-VJP
    primitive — not closure captures — so the op is safe under shard_map
    and other tracing transforms.

    Args:
      g:   tiled adjacency (values encode the aggregation normalization).
      g_t: tiled transpose of g (pass g itself for symmetric graphs with
           symmetric values, e.g. unnormalized sum aggregation).
      x:   (V, D) node features.
      k:   number of channels kept per node (1 <= k <= D).
    """
    cdname = None if compute_dtype is None else jnp.dtype(compute_dtype).name
    return _fused(k, cdname, g, g_t, x)
