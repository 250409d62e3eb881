#!/usr/bin/env python
"""Follow-up probe: separate the row-WIDTH gather penalty from the
table-SIZE cliff.

probe_gather.py round-2 data showed widths 2..96 lanes all at ~565 M
rows/s but 128 lanes at ~117 M rows/s — confounding width (512 B rows)
with table size (64 MiB). This sweep varies V at fixed widths to locate
the size cliff per width. Run from /root/repo, one TPU process at a time.
"""

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
    e, group = 13_107_200, 65536
    groups = e // group

    def gather_sum(table, idxs):
        def step(acc, i):
            g = jnp.take(table, i, axis=0, mode="clip")
            return acc + g.sum(axis=0), None
        acc, _ = jax.lax.scan(
            step, jnp.zeros((table.shape[1],), jnp.int32), idxs)
        return acc

    f = jax.jit(gather_sum)
    cases = []
    for w in (24, 64, 96, 128):
        for v in (131072, 262144, 524288, 1048576, 2097152):
            if v * w * 4 <= 768 * 2**20:
                cases.append((v, w))
    for v, w in cases:
        idx = jnp.asarray(rng.integers(0, v, size=(groups, group))
                          .astype(np.int32))
        table = jnp.asarray(
            rng.integers(-100, 100, size=(v, w)).astype(np.int32))
        t = time_fn(lambda: f(table, idx), warmup=2, runs=3)
        rec = dict(v=v, width_lanes=w,
                   table_mib=round(v * w * 4 / 2**20, 1),
                   ms=round(t.mean_ms, 3),
                   m_rows_per_s=round(e / (t.mean_ms * 1e-3) / 1e6, 1),
                   ns_per_row=round(t.mean_ms * 1e6 / e, 3))
        print(json.dumps(rec))


if __name__ == "__main__":
    main()
