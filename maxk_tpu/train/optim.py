"""Optimizers: Adam (+ weight decay) with an optional Lookahead wrapper.

Lookahead reproduces the reference implementation's semantics
(reference utils/general_utils.py:108-157): every k steps the slow weights
move alpha of the way toward the fast weights and the fast weights are
reset to the slow weights. The slow buffer is lazily initialized to the
fast weights at the first sync (so the first sync is an init, not a blend
— general_utils.py:131-137).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class LookaheadState(NamedTuple):
    inner: optax.OptState
    slow: optax.Params
    step: jax.Array
    initialized: jax.Array


def lookahead(inner: optax.GradientTransformation, alpha: float = 0.5,
              k: int = 6) -> optax.GradientTransformation:
    """Wrap a gradient transformation with Lookahead slow weights."""

    def init(params):
        return LookaheadState(
            inner=inner.init(params),
            # Real copies: jnp.asarray on a jax.Array is a no-op, and an
            # aliased slow buffer makes any donating jit of (params,
            # opt_state) fail with "donate the same buffer twice" (hit by
            # DistTrainer's donated train step).
            slow=jax.tree.map(lambda p: jnp.array(p, copy=True), params),
            step=jnp.zeros((), jnp.int32),
            initialized=jnp.zeros((), jnp.bool_),
        )

    def update(updates, state, params=None):
        if params is None:
            raise ValueError("lookahead requires params")
        updates, inner_state = inner.update(updates, state.inner, params)
        step = state.step + 1
        sync = (step % k) == 0
        fast = optax.apply_updates(params, updates)

        def blend(slow, f):
            # First sync initializes slow <- fast (zero-delta blend).
            s = jnp.where(state.initialized, slow, f)
            return s + alpha * (f - s)

        new_slow = jax.tree.map(
            lambda s, f: jnp.where(sync, blend(s, f), s), state.slow, fast)
        final = jax.tree.map(
            lambda f, s: jnp.where(sync, s, f), fast, new_slow)
        # Re-express as an additive update relative to current params.
        new_updates = jax.tree.map(lambda fin, p: fin - p, final, params)
        new_state = LookaheadState(
            inner=inner_state, slow=new_slow, step=step,
            initialized=jnp.logical_or(state.initialized, sync))
        return new_updates, new_state

    return optax.GradientTransformation(init, update)


def make_optimizer(lr: float, weight_decay: float = 0.0,
                   enable_lookahead: bool = False,
                   lookahead_alpha: float = 0.5,
                   lookahead_k: int = 6) -> optax.GradientTransformation:
    """Adam with L2 weight decay (torch.optim.Adam semantics: decay added
    to the gradient — reference maxk_gnn_dgl.py:85), optionally wrapped in
    Lookahead (reference :86-87)."""
    if weight_decay > 0:
        base = optax.chain(optax.add_decayed_weights(weight_decay),
                           optax.adam(lr))
    else:
        base = optax.adam(lr)
    if enable_lookahead:
        return lookahead(base, alpha=lookahead_alpha, k=lookahead_k)
    return base
