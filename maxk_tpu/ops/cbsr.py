"""CBSR — compressed balanced sparse row format for MaxK activations.

A (V, D) row-wise top-k-sparse matrix is stored as:
  values:   (V, k) float32 — the kept entries, selector-sorted per row
  selector: (V, k) int32   — their column indices, ascending per row

This mirrors the reference's CBSR ((V,k) float data + (V,k) uint8 selector,
reference kernels/main.cu:120-146, cuda_kernel_bindings.cpp:320-340) with
two deliberate fixes: exact fp32 values (no uint8 round trip) and int32
selectors (no D <= 256 cap). For multi-chip halo exchange the selector can
be packed to int8/int16 on the wire when D allows (maxk_tpu.parallel).

Selectors are kept sorted ascending so the layout is canonical: packing is
deterministic, and expanded results are invariant to top-k tie ordering.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cbsr_topk(x: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """Compact each row's top-k entries into CBSR (values, selector)."""
    vals, idx = jax.lax.top_k(x, k)
    order = jnp.argsort(idx, axis=1)
    selector = jnp.take_along_axis(idx, order, axis=1).astype(jnp.int32)
    values = jnp.take_along_axis(vals, order, axis=1)
    return values, selector


def cbsr_expand(values: jax.Array, selector: jax.Array, dim: int) -> jax.Array:
    """Scatter CBSR back to a dense (V, dim) matrix (zeros elsewhere).

    Top-k selectors are unique within a row, so an unindexed set is exact.
    """
    v = values.shape[0]
    rows = jnp.arange(v)[:, None]
    out = jnp.zeros((v, dim), dtype=values.dtype)
    return out.at[rows, selector].set(values, mode="drop", unique_indices=True)


def cbsr_gather(dense: jax.Array, selector: jax.Array) -> jax.Array:
    """Sample a dense (V, D) matrix at each row's selector positions -> (V, k).

    This is the sampling step of the backward SSpMM: the reference computes
    it with per-element global atomicAdd scatter
    (kernels/spmm_maxk_backward.cu:92-103); on TPU it is a vectorized
    take_along_axis after the transpose-side SpMM.
    """
    return jnp.take_along_axis(dense, selector, axis=1)


def cbsr_nbytes(n_nodes: int, k: int, dim: int,
                value_dtype=jnp.float32) -> tuple[int, int]:
    """(cbsr_bytes, dense_bytes) for traffic/roofline accounting.

    Selector width is the narrowest integer type that can index dim.
    """
    val_b = jnp.dtype(value_dtype).itemsize
    sel_b = 1 if dim <= 256 else (2 if dim <= 65536 else 4)
    return n_nodes * k * (val_b + sel_b), n_nodes * dim * val_b
