"""Model family: shapes, gradient flow, maxk-vs-relu switch, all models."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from maxk_tpu.models.models import GraphBundle, build_model
from conftest import random_graph


@pytest.fixture(scope="module")
def bundle():
    csr = random_graph(120, 6.0, seed=11, weighted=False)
    return GraphBundle.from_csr(csr, row_block=16, edge_tile=64), csr


def _init_and_run(model, graphs, x, training=False):
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, graphs, x,
                           training=False)
    kwargs = {}
    if training:
        kwargs = dict(rngs={"dropout": jax.random.PRNGKey(1)})
        if "batch_stats" in variables:
            out, _ = model.apply(variables, graphs, x, training=True,
                                 mutable=["batch_stats"], **kwargs)
            return variables, out
    out = model.apply(variables, graphs, x, training=training, **kwargs)
    return variables, out


@pytest.mark.parametrize("name", ["sage", "sage_fused", "gcn", "gin",
                                  "gnn_res"])
@pytest.mark.parametrize("nonlinear", ["maxk", "relu"])
def test_model_forward_shapes(bundle, name, nonlinear):
    graphs, csr = bundle
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(csr.n_nodes, 24)).astype(np.float32))
    model = build_model(name, 24, 32, 2, 7, maxk=8, feat_drop=0.3,
                        norm=True, nonlinear=nonlinear)
    _, out = _init_and_run(model, graphs, x)
    assert out.shape == (csr.n_nodes, 7)
    assert bool(jnp.isfinite(out).all())


@pytest.mark.parametrize("name", ["sage", "sage_fused", "gcn", "gin",
                                  "gnn_res"])
def test_model_gradients_finite_and_nonzero(bundle, name):
    graphs, csr = bundle
    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(csr.n_nodes, 24)).astype(np.float32))
    model = build_model(name, 24, 32, 2, 7, maxk=8, norm=False,
                        nonlinear="maxk")
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, graphs, x,
                           training=False)

    def loss(params):
        out = model.apply({"params": params, **{k: v for k, v in
                           variables.items() if k != "params"}},
                          graphs, x, training=False)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.isfinite(l).all()) for l in leaves)
    total = sum(float(jnp.abs(l).sum()) for l in leaves)
    assert total > 0.0


def test_sage_fused_matches_unfused_sage_forward(bundle):
    """SAGEFused with nonlinear='maxk' differs from SAGE only in where the
    self branch taps x (pre- vs post-MaxK). With identical params, the
    aggregation branch must agree exactly."""
    graphs, csr = bundle
    x = jnp.asarray(np.random.default_rng(2).normal(
        size=(csr.n_nodes, 16)).astype(np.float32))
    from maxk_tpu.ops.maxk import maxk
    from maxk_tpu.ops.spmm import spmm
    from maxk_tpu.ops.spgemm import maxk_spgemm
    agg_unfused = spmm(graphs.g_mean, maxk(x, 4), compute_dtype=jnp.float32)
    agg_fused = maxk_spgemm(graphs.g_mean, graphs.g_mean_t, x, 4,
                            compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(agg_fused),
                               np.asarray(agg_unfused), rtol=1e-5, atol=1e-5)


def test_dropout_active_only_in_training(bundle):
    graphs, csr = bundle
    x = jnp.asarray(np.random.default_rng(3).normal(
        size=(csr.n_nodes, 24)).astype(np.float32))
    model = build_model("gcn", 24, 32, 2, 7, maxk=8, feat_drop=0.5,
                        nonlinear="relu")
    variables, out_eval = _init_and_run(model, graphs, x, training=False)
    out_eval2 = model.apply(variables, graphs, x, training=False)
    np.testing.assert_array_equal(np.asarray(out_eval),
                                  np.asarray(out_eval2))
    out_tr1 = model.apply(variables, graphs, x, training=True,
                          rngs={"dropout": jax.random.PRNGKey(1)})
    out_tr2 = model.apply(variables, graphs, x, training=True,
                          rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(out_tr1), np.asarray(out_tr2))


def test_symmetric_bundle_matches_transpose_built(bundle):
    """GraphBundle(symmetric=True) skips the transpose builds (sum/sym
    alias the forward graph; mean_t is a column-degree rescale of the same
    structure). On a genuinely symmetric graph every *_t must act as the
    same linear operator as the transpose-built one."""
    from maxk_tpu.data.loaders import synthetic_graph
    from maxk_tpu.ops.spmm import spmm
    csr = synthetic_graph(150, 5.0, seed=7, symmetric=True)
    ref = GraphBundle.from_csr(csr, row_block=16, edge_tile=64,
                               symmetric=False)
    fast = GraphBundle.from_csr(csr, row_block=16, edge_tile=64,
                                symmetric=True)
    x = jnp.asarray(np.random.default_rng(5).normal(
        size=(csr.n_nodes, 32)).astype(np.float32))
    for name in ("g_mean_t", "g_sum_t", "g_sym_t"):
        a = np.asarray(spmm(getattr(ref, name), x,
                            compute_dtype=jnp.float32))
        b = np.asarray(spmm(getattr(fast, name), x,
                            compute_dtype=jnp.float32))
        np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-5,
                                   err_msg=name)
