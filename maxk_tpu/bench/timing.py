"""Kernel timing protocol.

Mirrors the reference's measurement discipline: N warmup runs then N timed
runs averaged on wall clock (reference kernels/spmm_base.h:58-74 uses 4+4
for the MaxK kernels; kernels/spmm_cusparse.cu:35-51 uses 10+10 for the
baseline), with device synchronization between runs (block_until_ready —
the analog of cudaDeviceSynchronize in timing_body).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable


@dataclasses.dataclass
class TimingResult:
    mean_ms: float
    min_ms: float
    max_ms: float
    runs: int

    def nnz_per_s(self, nnz: int) -> float:
        return nnz / (self.mean_ms * 1e-3)


def _sync(out):
    """Force completion of the computation producing `out`.

    On remote-TPU transports (axon), block_until_ready returns before the
    device has executed, so timings must round-trip a value to host: we
    fetch one element of each output leaf, which cannot be produced until
    the executable finishes.
    """
    import numpy as np

    for leaf in __import__("jax").tree_util.tree_leaves(out):
        if hasattr(leaf, "ravel"):
            np.asarray(leaf.ravel()[:1])
    return out


def time_fn(fn: Callable, warmup: int = 4, runs: int = 4,
            chain: int = 8) -> TimingResult:
    """4+4 protocol by default (reference spmm_base.h timing_body).

    Remote-TPU transports add a large constant host round-trip (~30 ms via
    the axon tunnel) to any synchronized measurement, so each sample is
    differenced: time(1 dispatch + sync) vs time(1+chain dispatches +
    sync). Dispatches on one device serialize, so the difference divided
    by `chain` is the pure per-call device time.
    """
    def run_n(n):
        out = None
        for _ in range(n):
            out = fn()
        _sync(out)

    for _ in range(warmup):
        run_n(1)
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        run_n(1)
        t1 = time.perf_counter()
        run_n(1 + chain)
        t2 = time.perf_counter()
        times.append(max(((t2 - t1) - (t1 - t0)) / chain, 1e-9) * 1e3)
    return TimingResult(mean_ms=sum(times) / len(times),
                        min_ms=min(times), max_ms=max(times), runs=runs)
