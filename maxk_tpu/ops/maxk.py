"""MaxK nonlinearity: keep each row's top-k channels, zero the rest.

Reference semantics: utils/models.py:28-59 (torch.topk -> binary mask ->
input * mask; backward = grad * mask, i.e. straight-through on the kept
positions). Implemented with jax.lax.top_k in full fp32 — the reference's
standalone CUDA TopK kernel quantizes through uint8 and crashes for k<19
(reference kernels/maxk_kernel.cu, test_topk_bug.py); this implementation
has neither defect and supports any 1 <= k <= D.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def maxk_mask(x: jax.Array, k: int) -> jax.Array:
    """Binary mask of each row's top-k entries (ties broken by lower index,
    matching torch.topk/lax.top_k ordering).

    Built as a compare-reduction over the channel axis: XLA scatter costs
    ~25 ms at V=131k on v5e while the fused any-compare costs ~2 ms.
    """
    _, idx = jax.lax.top_k(x, k)
    iota = jnp.arange(x.shape[1], dtype=idx.dtype)[None, :]
    # One kept channel at a time: O(V*D) peak memory even eagerly (the
    # broadcast (V, k, D) form OOMs large graphs at k=64).
    hit = idx[:, 0:1] == iota
    for l in range(1, k):
        hit = hit | (idx[:, l:l + 1] == iota)
    return hit.astype(x.dtype)


def _forward(x, k):
    """(y, mask) through the fastest available backend.

    On TPU the Pallas threshold kernel (ops.pallas_topk) computes the
    exact mask in one VMEM pass — measured 1.95 ms vs 9.17 ms for the
    top_k + compare-reduce XLA path at (131072, 256), k=32 on v5e. The
    XLA path remains the oracle and the CPU/odd-shape fallback.
    """
    from maxk_tpu.ops.pallas_topk import maxk_pallas, pallas_topk_supported
    if pallas_topk_supported(x, k):
        return maxk_pallas(x, k)            # mask comes back bf16 (0/1)
    mask = maxk_mask(x, k)
    return x * mask, mask


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def maxk(x: jax.Array, k: int) -> jax.Array:
    """MaxK(x): x * topk_mask(x). Rows of x are nodes, columns channels."""
    return _forward(x, k)[0]


def _maxk_fwd(x, k):
    y, mask = _forward(x, k)
    return y, mask


def _maxk_bwd(k, mask, g):
    return (g * mask.astype(g.dtype),)


maxk.defvjp(_maxk_fwd, _maxk_bwd)
