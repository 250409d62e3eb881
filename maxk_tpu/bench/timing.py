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


# Adaptive-chain targets: the differenced signal (chain x per-call time)
# must dominate the ~ms jitter of the two tunnel round trips it is
# measured against, or sub-ms kernels return noise (round-3 fix: cora's
# 1.26 ms baseline vs a "0.03 ms" fused forward was pure jitter).
_CHAIN_TARGET_MS = 24.0
_CHAIN_MAX = 512


def time_fn(fn: Callable, warmup: int = 4, runs: int = 4,
            chain: int = 8) -> TimingResult:
    """4+4 protocol by default (reference spmm_base.h timing_body).

    Remote-TPU transports add a large constant host round-trip (~30 ms via
    the axon tunnel) to any synchronized measurement, so each sample is
    differenced: time(1 dispatch + sync) vs time(1+chain dispatches +
    sync). Dispatches on one device serialize, so the difference divided
    by `chain` is the pure per-call device time.

    `chain` is the floor: a pilot sample lengthens the chain for fast
    kernels so the differenced signal reaches _CHAIN_TARGET_MS (a 0.1 ms
    kernel is unmeasurable over an 8-chain against multi-ms round-trip
    jitter, and came back as noise in the round-2 suite records).
    """
    def run_n(n):
        out = None
        for _ in range(n):
            out = fn()
        _sync(out)

    def sample(n):
        t0 = time.perf_counter()
        run_n(1)
        t1 = time.perf_counter()
        run_n(1 + n)
        t2 = time.perf_counter()
        return max(((t2 - t1) - (t1 - t0)) / n, 1e-9) * 1e3

    for _ in range(warmup):
        run_n(1)
    pilot = sample(chain)
    if pilot * chain < _CHAIN_TARGET_MS:
        chain = min(_CHAIN_MAX,
                    max(chain, int(_CHAIN_TARGET_MS / max(pilot, 0.05))))
    times = [sample(chain) for _ in range(runs)]
    return TimingResult(mean_ms=sum(times) / len(times),
                        min_ms=min(times), max_ms=max(times), runs=runs)
