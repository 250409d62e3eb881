"""MaxK nonlinearity + CBSR format + fused MaxK SpGEMM (gradients included).

Gradient checks compare the fused custom VJP against autodiff through the
dense mask-and-matmul oracle — the exact-oracle strategy SURVEY.md section 4
prescribes (the reference has no gradient tests at all)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from maxk_tpu.ops.graph import build_tiled_graph
from maxk_tpu.ops.maxk import maxk, maxk_mask
from maxk_tpu.ops.cbsr import cbsr_topk, cbsr_expand, cbsr_gather
from maxk_tpu.ops.spgemm import maxk_spgemm, spgemm_forward_cbsr, sspmm_sampled
from maxk_tpu.ops.spmm import spmm_dense_oracle

from conftest import random_graph


def _x(n, d, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n, d)).astype(np.float32)


# ---------------------------------------------------------------------------
# MaxK nonlinearity
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("k", [1, 4, 8, 18, 32, 64])
def test_maxk_keeps_topk(k):
    """k sweep includes k=18 and k<19 values where the reference's CUDA
    TopK kernel crashes (reference test_topk_bug.py)."""
    x = jnp.asarray(_x(50, 64))
    y = maxk(x, k)
    y_np = np.asarray(y)
    x_np = np.asarray(x)
    for i in range(x_np.shape[0]):
        kept = np.nonzero(y_np[i])[0]
        assert len(kept) <= k
        thresh = np.sort(x_np[i])[-k]
        # All kept values are >= the k-th largest; all zeroed are <= it.
        assert np.all(x_np[i][kept] >= thresh - 1e-6)
    # Exactly k nonzero unless values are exactly zero.
    assert np.count_nonzero(y_np) >= 50 * k * 0.99


def test_maxk_grad_masks():
    x = jnp.asarray(_x(20, 16, seed=1))
    k = 4
    mask = maxk_mask(x, k)
    g = jax.grad(lambda x: jnp.sum(jnp.sin(maxk(x, k))))(x)
    # Gradient is zero exactly off the mask.
    assert np.all(np.asarray(g)[np.asarray(mask) == 0] == 0.0)
    ref = jax.grad(lambda x: jnp.sum(jnp.sin(x * mask)))(x)
    # Reference straight-through: d/dx sum(sin(mask*x)) restricted to mask.
    np.testing.assert_allclose(np.asarray(g), np.asarray(ref * mask),
                               rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# CBSR round trips
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("k", [2, 8, 32])
def test_cbsr_roundtrip_equals_maxk(k):
    x = jnp.asarray(_x(40, 64, seed=2))
    v, s = cbsr_topk(x, k)
    dense = cbsr_expand(v, s, 64)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(maxk(x, k)),
                               rtol=1e-6, atol=1e-6)
    # Selectors sorted ascending and unique per row.
    s_np = np.asarray(s)
    assert np.all(np.diff(s_np, axis=1) > 0)


def test_maxk_spgemm_k_equals_dim(small_graph):
    """k == D degenerates MaxK to identity: the fused op must equal the
    plain SpMM of x (also exercises the maxk <= hidden_dim boundary the
    config now validates)."""
    d = 16
    x = jnp.asarray(_x(small_graph.n_nodes, d, seed=4))
    g = build_tiled_graph(small_graph, row_block=16, edge_tile=64)
    g_t = build_tiled_graph(small_graph.transpose(), row_block=16,
                            edge_tile=64)
    y = maxk_spgemm(g, g_t, x, d, compute_dtype=jnp.float32)
    ref = spmm_dense_oracle(small_graph, np.asarray(x))
    np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-4, atol=2e-4)


def test_maxk_spgemm_odd_dim(small_graph):
    """Odd feature dim routes the gather table through the unpacked-f32
    path (bf16 pair packing needs D % 2 == 0) and CBSR expansion through
    a non-lane-aligned dim."""
    d, k = 33, 5
    x = jnp.asarray(_x(small_graph.n_nodes, d, seed=5))
    g = build_tiled_graph(small_graph, row_block=16, edge_tile=64)
    g_t = build_tiled_graph(small_graph.transpose(), row_block=16,
                            edge_tile=64)
    y = maxk_spgemm(g, g_t, x, k, compute_dtype=jnp.float32)
    ref = spmm_dense_oracle(small_graph, np.asarray(maxk(x, k)))
    np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-4, atol=2e-4)

    def loss(xx):
        return (maxk_spgemm(g, g_t, xx, k,
                            compute_dtype=jnp.float32) ** 2).sum()

    def loss_dense(xx):
        from maxk_tpu.ops.spmm import spmm
        return (spmm(g, maxk(xx, k), compute_dtype=jnp.float32) ** 2).sum()

    gf = jax.grad(loss)(x)
    gd = jax.grad(loss_dense)(x)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gd),
                               rtol=2e-4, atol=2e-4)


def test_cbsr_gather_inverts_expand():
    x = jnp.asarray(_x(30, 32, seed=3))
    v, s = cbsr_topk(x, 8)
    dense = cbsr_expand(v, s, 32)
    np.testing.assert_allclose(np.asarray(cbsr_gather(dense, s)),
                               np.asarray(v), rtol=1e-6)


# ---------------------------------------------------------------------------
# Fused MaxK SpGEMM: forward + backward vs dense oracle
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("k", [4, 16, 32])
def test_maxk_spgemm_forward_matches_oracle(small_graph, k):
    d = 64
    x = _x(small_graph.n_nodes, d, seed=4)
    g = build_tiled_graph(small_graph, row_block=16, edge_tile=64)
    gt = build_tiled_graph(small_graph.transpose(), row_block=16, edge_tile=64)
    y = maxk_spgemm(g, gt, jnp.asarray(x), k, compute_dtype=jnp.float32)
    ref = spmm_dense_oracle(small_graph,
                            np.asarray(maxk(jnp.asarray(x), k)))
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("k", [4, 16])
def test_maxk_spgemm_gradient_matches_dense_autodiff(small_graph, k):
    """Custom VJP vs autodiff through the dense mask-and-matmul oracle."""
    d = 32
    x = jnp.asarray(_x(small_graph.n_nodes, d, seed=5))
    g = build_tiled_graph(small_graph, row_block=16, edge_tile=64)
    gt = build_tiled_graph(small_graph.transpose(), row_block=16, edge_tile=64)

    a = np.zeros((small_graph.n_nodes,) * 2, dtype=np.float32)
    rows, cols = small_graph.to_coo()
    np.add.at(a, (rows, cols), small_graph.values)
    a = jnp.asarray(a)
    mask = maxk_mask(x, k)  # mask is a constant w.r.t. grad (reference semantics)

    w = jnp.asarray(_x(small_graph.n_nodes, d, seed=6))

    def fused_loss(x):
        return jnp.sum(w * maxk_spgemm(g, gt, x, k,
                                       compute_dtype=jnp.float32))

    def dense_loss(x):
        return jnp.sum(w * (a @ (x * mask)))

    g_fused = jax.grad(fused_loss)(x)
    g_dense = jax.grad(dense_loss)(x)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_dense),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("k", [4, 16])
def test_fused_mask_and_cbsr_paths_agree(small_graph, k, monkeypatch):
    """The production mask route and the CBSR route of maxk_spgemm are
    algebraically identical (expand(cbsr_topk(x)) == MaxK(x);
    expand(gather(dS, s), s) == mask * dS) — A/B them exactly in f32,
    forward and gradient (MAXK_FUSED_MASK=0 is the triage opt-out)."""
    d = 32
    x = jnp.asarray(_x(small_graph.n_nodes, d, seed=7))
    g = build_tiled_graph(small_graph, row_block=16, edge_tile=64)
    gt = build_tiled_graph(small_graph.transpose(), row_block=16,
                           edge_tile=64)
    w = jnp.asarray(_x(small_graph.n_nodes, d, seed=8))

    def loss(x):
        return jnp.sum(w * maxk_spgemm(g, gt, x, k,
                                       compute_dtype=jnp.float32))

    y_mask = maxk_spgemm(g, gt, x, k, compute_dtype=jnp.float32)
    g_mask = jax.grad(loss)(x)
    monkeypatch.setenv("MAXK_FUSED_MASK", "0")
    y_cbsr = maxk_spgemm(g, gt, x, k, compute_dtype=jnp.float32)
    g_cbsr = jax.grad(loss)(x)
    np.testing.assert_allclose(np.asarray(y_mask), np.asarray(y_cbsr),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_mask), np.asarray(g_cbsr),
                               rtol=1e-6, atol=1e-6)


def test_sspmm_sampled_matches_dense(small_graph):
    """Standalone backward SSpMM (reference spmm_maxk_backward parity):
    g[i,l] = sum_j A[j,i] dy[j, sel[i,l]]."""
    d, k = 32, 8
    n = small_graph.n_nodes
    dy = jnp.asarray(_x(n, d, seed=7))
    x = jnp.asarray(_x(n, d, seed=8))
    _, sel = cbsr_topk(x, k)
    gt_csr = small_graph.transpose()
    gt = build_tiled_graph(gt_csr, row_block=16, edge_tile=64)
    out = sspmm_sampled(gt, dy, sel, compute_dtype=jnp.float32)

    ds_ref = spmm_dense_oracle(gt_csr, np.asarray(dy))
    ref = np.take_along_axis(ds_ref, np.asarray(sel), axis=1)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_spgemm_forward_cbsr_api(small_graph):
    """Stateless CBSR-consuming forward (reference spmm_maxk_forward parity)."""
    d, k = 48, 16
    x = jnp.asarray(_x(small_graph.n_nodes, d, seed=9))
    v, s = cbsr_topk(x, k)
    g = build_tiled_graph(small_graph, row_block=16, edge_tile=64)
    y = spgemm_forward_cbsr(g, v, s, d, compute_dtype=jnp.float32)
    ref = spmm_dense_oracle(small_graph, np.asarray(maxk(x, k)))
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4, atol=1e-4)


def test_rowscale_int8_forward_accuracy(skewed_graph):
    """Production fast path: per-row int8 gather table. Structure must be
    exact (flagged elements == 0 at the reference's 0.1 threshold) and the
    quantization error small (the reference's own CBSR kernel quantizes
    activations to uint8 as well, cuda_kernel_bindings.cpp:211-231)."""
    import jax.numpy as jnp
    from maxk_tpu.ops.cbsr import cbsr_topk, cbsr_expand
    from maxk_tpu.ops.spgemm import spgemm_forward_cbsr
    from maxk_tpu.ops.spmm import spmm_dense_oracle
    from maxk_tpu.ops.graph import build_tiled_graph

    csr = skewed_graph
    g = build_tiled_graph(csr)
    x = np.random.default_rng(9).uniform(
        0, 1, size=(csr.n_nodes, 256)).astype(np.float32)
    for k in (8, 32):
        v, s = cbsr_topk(jnp.asarray(x), k)
        y = np.asarray(spgemm_forward_cbsr(
            g, v, s, 256, compute_dtype="int8_rowscale"), np.float64)
        ref = spmm_dense_oracle(csr, np.asarray(cbsr_expand(v, s, 256)))
        scale = max(1.0, np.abs(ref).mean())
        err = np.abs(y - ref) / scale
        assert (err > 0.1).sum() == 0
        assert err.mean() < 5e-3


def test_rowscale_int8_parted():
    """Row-scaled int8 path over a column-parted graph."""
    import jax.numpy as jnp
    from maxk_tpu.ops.cbsr import cbsr_topk, cbsr_expand
    from maxk_tpu.ops.spgemm import spgemm_forward_cbsr
    from maxk_tpu.ops.spmm import spmm_dense_oracle
    from maxk_tpu.ops.graph import build_tiled_graph, PartedGraph
    from conftest import random_graph

    csr = random_graph(600, 12.0, seed=11)
    g = build_tiled_graph(csr, col_part_rows=256)
    assert isinstance(g, PartedGraph)
    x = np.random.default_rng(10).uniform(
        0, 1, size=(csr.n_nodes, 128)).astype(np.float32)
    v, s = cbsr_topk(jnp.asarray(x), 16)
    y = np.asarray(spgemm_forward_cbsr(
        g, v, s, 128, compute_dtype="int8_rowscale"), np.float64)
    ref = spmm_dense_oracle(csr, np.asarray(cbsr_expand(v, s, 128)))
    scale = max(1.0, np.abs(ref).mean())
    assert (np.abs(y - ref) / scale).mean() < 5e-3


def test_cbsr_gather_mode_optin(small_graph, monkeypatch):
    """The CBSR-operand tile-expand formulation (opt-in) stays exact."""
    import maxk_tpu.ops.spgemm as spgemm_mod
    import jax.numpy as jnp
    from maxk_tpu.ops.cbsr import cbsr_topk, cbsr_expand
    from maxk_tpu.ops.spmm import spmm_dense_oracle
    from maxk_tpu.ops.graph import build_tiled_graph

    monkeypatch.setattr(spgemm_mod, "CBSR_GATHER_MODE", True)
    csr = small_graph
    g = build_tiled_graph(csr)
    x = np.random.default_rng(12).normal(
        size=(csr.n_nodes, 64)).astype(np.float32)
    v, s = cbsr_topk(jnp.asarray(x), 7)   # odd k exercises the k-padding
    y = np.asarray(spgemm_mod.spgemm_forward_cbsr(
        g, v, s, 64, compute_dtype=jnp.float32))
    ref = spmm_dense_oracle(csr, np.asarray(cbsr_expand(v, s, 64)))
    np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-4)
