"""Direct kernel interface — API parity with the reference's working
integration layer (reference direct_kernel_interface.py:24-382,
`DirectMaxKKernels` over the `maxk_cuda_kernels` extension).

Method-for-method mapping:

  load_warp4_metadata        <- cuda_kernel_bindings.cpp:287-317 (here the
                                row-tile schedule is built from the graph at
                                load; .warp4 files are read for wire compat
                                and validated against the graph)
  generate_maxk_sparse_data  <- direct_kernel_interface.py:58-85 (CBSR from
                                TopK; exact fp32, no uint8 round trip)
  run_forward_kernel         <- direct_kernel_interface.py:87-153
  run_backward_kernel        <- direct_kernel_interface.py:155-213
  validate_against_cusparse  <- direct_kernel_interface.py:215-298 (shared
                                TopK input, library-SpMM oracle, max-err
                                tolerance 1e-3)
  benchmark_all_k_values     <- direct_kernel_interface.py:300-382

Also exposes the reference's binding-level helpers under their original
names: prepare_cbsr_format (spmm_bindings.cpp:163-184) and
topk_nonlinearity (spmm_bindings.cpp:189-204).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence

import numpy as np

from maxk_tpu.ops.graph import CSRGraph, TiledGraph, build_tiled_graph
from maxk_tpu.ops.cbsr import cbsr_topk, cbsr_expand
from maxk_tpu.ops.maxk import maxk
from maxk_tpu.bench.timing import time_fn, TimingResult

# Reference-named aliases (spmm_kernels extension surface).
prepare_cbsr_format = cbsr_topk
topk_nonlinearity = maxk


class DirectMaxKKernels:
    """Stateful convenience wrapper: one graph, many kernel invocations."""

    def __init__(self, csr: CSRGraph, graph_name: str = "graph",
                 values: Optional[np.ndarray] = None):
        if values is not None:
            csr = csr.with_values(values)
        self.csr = csr
        self.graph_name = graph_name
        self.g: TiledGraph = build_tiled_graph(csr)
        self.g_t: TiledGraph = build_tiled_graph(csr.transpose())
        self._g_oracle = None   # lazy unparted graph for spmm_segment

    @property
    def g_oracle(self) -> TiledGraph:
        """Unparted, hub-free tiles for the segment-sum oracle:
        build_tiled_graph auto-returns a PartedGraph above the fast-gather
        footprint and auto-splits hub columns out of the tiles, and
        spmm_segment rejects both by design."""
        if self._g_oracle is None:
            from maxk_tpu.ops.graph import PartedGraph
            self._g_oracle = (
                build_tiled_graph(self.csr, col_part_rows=0, hub_cols=0)
                if isinstance(self.g, PartedGraph)
                or self.g.hub_ids is not None else self.g)
        return self._g_oracle

    # -- metadata ----------------------------------------------------------

    def load_warp4_metadata(self, meta_dir: str | Path) -> np.ndarray:
        """Read + validate this graph's .warp4 file (wire compat only; the
        TPU schedule is the TiledGraph built in __init__)."""
        from maxk_tpu.data.warp4 import load_warp4, validate_warp4, \
            META_DIRNAME
        p = Path(meta_dir)
        if p.is_dir() and not p.name.startswith("w12"):
            p = p / META_DIRNAME
        w = load_warp4(p / f"{self.graph_name}.warp4" if p.is_dir() else p)
        validate_warp4(w, self.csr)
        return w

    # -- data --------------------------------------------------------------

    def generate_maxk_sparse_data(self, x: np.ndarray, k: int):
        """Dense (V, D) -> CBSR (values, selector), exact fp32 TopK."""
        import jax.numpy as jnp
        v, s = cbsr_topk(jnp.asarray(x, jnp.float32), k)
        return np.asarray(v), np.asarray(s)

    # -- kernels -----------------------------------------------------------

    def run_forward_kernel(self, values, selector, dim: int,
                           timing: bool = True
                           ) -> tuple[np.ndarray, Optional[TimingResult]]:
        import jax
        import jax.numpy as jnp
        from maxk_tpu.ops.spgemm import spgemm_forward_cbsr
        v, s = jnp.asarray(values), jnp.asarray(selector)
        f = jax.jit(lambda g, v, s: spgemm_forward_cbsr(g, v, s, dim))
        out = f(self.g, v, s)
        t = time_fn(lambda: f(self.g, v, s)) if timing else None
        return np.asarray(out), t

    def run_backward_kernel(self, grad_output, selector,
                            timing: bool = True
                            ) -> tuple[np.ndarray, Optional[TimingResult]]:
        import jax
        import jax.numpy as jnp
        from maxk_tpu.ops.spgemm import sspmm_sampled
        dy, s = jnp.asarray(grad_output), jnp.asarray(selector)
        f = jax.jit(sspmm_sampled)
        out = f(self.g_t, dy, s)
        t = time_fn(lambda: f(self.g_t, dy, s)) if timing else None
        return np.asarray(out), t

    # -- validation / benchmarking ------------------------------------------

    def validate_against_cusparse(self, x: np.ndarray, k: int,
                                  tolerance: float = 1e-3) -> dict:
        """Shared-TopK validation against the library SpMM on the densified
        CBSR input (reference semantics, direct_kernel_interface.py:215-298;
        'cusparse' here is the XLA segment-sum library path)."""
        import jax.numpy as jnp
        from maxk_tpu.ops.spmm import spmm_segment
        from maxk_tpu.ops.spgemm import spgemm_forward_cbsr
        xj = jnp.asarray(x, jnp.float32)
        v, s = cbsr_topk(xj, k)
        dim = x.shape[1]
        out = spgemm_forward_cbsr(self.g, v, s, dim,
                                  compute_dtype=jnp.float32)
        ref = spmm_segment(self.g_oracle, cbsr_expand(v, s, dim))
        err = np.abs(np.asarray(out, np.float64)
                     - np.asarray(ref, np.float64))
        scale = max(1.0, float(np.abs(np.asarray(ref)).mean()))
        max_err = float(err.max() / scale)
        return dict(passed=bool(max_err < tolerance), max_err=max_err,
                    mean_err=float(err.mean() / scale), k=k,
                    tolerance=tolerance)

    def benchmark_all_k_values(self, x: np.ndarray,
                               k_values: Sequence[int] = (16, 32, 64),
                               ) -> dict:
        """Per-k TopK/forward/backward timing sweep
        (reference direct_kernel_interface.py:300-382)."""
        import jax
        import jax.numpy as jnp
        dim = x.shape[1]
        xj = jnp.asarray(x, jnp.float32)
        results = {}
        for k in k_values:
            tk = time_fn(lambda: cbsr_topk(xj, k))
            v, s = jax.block_until_ready(cbsr_topk(xj, k))
            _, tf = self.run_forward_kernel(v, s, dim)
            dy = jnp.asarray(np.random.default_rng(7).uniform(
                size=(self.csr.n_nodes, dim)).astype(np.float32))
            _, tb = self.run_backward_kernel(dy, s)
            results[k] = dict(topk_ms=tk.mean_ms, forward_ms=tf.mean_ms,
                              backward_ms=tb.mean_ms)
        return results
