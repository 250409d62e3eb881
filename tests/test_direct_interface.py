"""DirectMaxKKernels API-parity layer."""

import numpy as np
import pytest

from maxk_tpu.bench.direct_interface import (DirectMaxKKernels,
                                             prepare_cbsr_format,
                                             topk_nonlinearity)
from maxk_tpu.data.warp4 import generate_warp4, save_warp4
from maxk_tpu.ops.spmm import spmm_dense_oracle
from maxk_tpu.ops.maxk import maxk
from tests.conftest import random_graph


@pytest.fixture(scope="module")
def dk():
    g = random_graph(n_nodes=150, avg_degree=10.0, seed=4, power_law=True)
    return DirectMaxKKernels(g, graph_name="tgraph")


def _x(n, d=64, seed=0):
    return np.random.default_rng(seed).normal(size=(n, d)).astype(np.float32)


def test_generate_and_forward_matches_oracle(dk):
    x = _x(dk.csr.n_nodes)
    v, s = dk.generate_maxk_sparse_data(x, k=8)
    assert v.shape == (dk.csr.n_nodes, 8) and s.shape == v.shape
    out, t = dk.run_forward_kernel(v, s, dim=64, timing=False)
    import jax.numpy as jnp
    ref = spmm_dense_oracle(dk.csr, np.asarray(maxk(jnp.asarray(x), 8)))
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)
    assert t is None


def test_backward_shape_and_timing(dk):
    x = _x(dk.csr.n_nodes)
    _, s = dk.generate_maxk_sparse_data(x, k=8)
    dy = _x(dk.csr.n_nodes, seed=2)
    out, t = dk.run_backward_kernel(dy, s)
    assert out.shape == (dk.csr.n_nodes, 8)
    assert t.mean_ms >= 0


def test_validate_against_cusparse(dk):
    res = dk.validate_against_cusparse(_x(dk.csr.n_nodes), k=8)
    assert res["passed"], res


def test_benchmark_all_k_values(dk):
    res = dk.benchmark_all_k_values(_x(dk.csr.n_nodes), k_values=(4, 8))
    assert set(res) == {4, 8}
    for r in res.values():
        assert {"topk_ms", "forward_ms", "backward_ms"} <= set(r)


def test_load_warp4_metadata(dk, tmp_path):
    w = generate_warp4(dk.csr)
    save_warp4(w, tmp_path, "tgraph")
    w2 = dk.load_warp4_metadata(tmp_path)
    np.testing.assert_array_equal(w, w2)


def test_reference_named_aliases():
    import jax.numpy as jnp
    x = jnp.asarray(_x(16, 8))
    v, s = prepare_cbsr_format(x, 4)
    assert v.shape == (16, 4)
    y = topk_nonlinearity(x, 4)
    assert (np.asarray(y) != 0).sum(axis=1).max() <= 4
