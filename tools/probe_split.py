#!/usr/bin/env python
"""Isolated A/B of the split-gather primitive: one 128-lane take vs two
barrier-materialized 64-lane takes of the same rows, uniform-random and
graph-realistic (power-law) indices. Run from /root/repo."""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from maxk_tpu.bench.timing import time_fn

    print(f"# backend={jax.default_backend()}", file=sys.stderr)
    rng = np.random.default_rng(123)
    v, w, e, group = 131072, 128, 13_107_200, 65536
    groups = e // group
    table = jnp.asarray(rng.integers(-100, 100, (v, w)).astype(np.int32))

    def scan_sum(take_fn):
        def f(table, idxs):
            def step(acc, i):
                return acc + take_fn(table, i), None
            acc, _ = jax.lax.scan(
                step, jnp.zeros((w,), jnp.int32), idxs)
            return acc
        return jax.jit(f)

    def take_full(t, i):
        return jnp.take(t, i, axis=0, mode="clip").sum(axis=0)

    def take_halves(t, i):
        a = jax.lax.optimization_barrier(jax.lax.slice_in_dim(t, 0, 64, axis=1))
        b = jax.lax.optimization_barrier(jax.lax.slice_in_dim(t, 64, 128, axis=1))
        ga = jnp.take(a, i, axis=0, mode="clip").sum(axis=0)
        gb = jnp.take(b, i, axis=0, mode="clip").sum(axis=0)
        return jnp.concatenate([ga, gb])

    def take_halves_outer(ta, tb):
        # Halves pre-materialized OUTSIDE the scan (like _split_tables
        # before _spmm_scan).
        def f(ta, tb, idxs):
            def step(acc, i):
                ga = jnp.take(ta, i, axis=0, mode="clip").sum(axis=0)
                gb = jnp.take(tb, i, axis=0, mode="clip").sum(axis=0)
                return acc + jnp.concatenate([ga, gb]), None
            acc, _ = jax.lax.scan(step, jnp.zeros((w,), jnp.int32), idxs)
            return acc
        return jax.jit(f)

    for kind, make_idx in (
            ("uniform", lambda: rng.integers(0, v, (groups, group))),
            ("powerlaw", lambda: np.minimum(
                (v * rng.power(0.3, (groups, group))), v - 1)),
    ):
        idx = jnp.asarray(make_idx().astype(np.int32))
        f1 = scan_sum(take_full)
        t1 = time_fn(lambda: f1(table, idx), warmup=2, runs=3)
        print(json.dumps(dict(kind=kind, variant="full128",
                              ms=round(t1.mean_ms, 2),
                              ns_per_row=round(t1.mean_ms * 1e6 / e, 2))))
        f2 = scan_sum(take_halves)
        t2 = time_fn(lambda: f2(table, idx), warmup=2, runs=3)
        print(json.dumps(dict(kind=kind, variant="halves_in_jit",
                              ms=round(t2.mean_ms, 2),
                              ns_per_row=round(t2.mean_ms * 1e6 / e, 2))))
        ta = jax.block_until_ready(jnp.asarray(np.asarray(table)[:, :64]))
        tb = jax.block_until_ready(jnp.asarray(np.asarray(table)[:, 64:]))
        f3 = take_halves_outer(ta, tb)
        t3 = time_fn(lambda: f3(ta, tb, idx), warmup=2, runs=3)
        print(json.dumps(dict(kind=kind, variant="halves_concrete",
                              ms=round(t3.mean_ms, 2),
                              ns_per_row=round(t3.mean_ms * 1e6 / e, 2))))


if __name__ == "__main__":
    main()
