"""Multi-chip row-partitioned execution on the 8-device virtual CPU mesh:
sharded SpMM == single-device SpMM, CBSR-compressed gather path, and a
distributed training step matching the single-device trainer exactly."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from maxk_tpu.models.models import GraphBundle
from maxk_tpu.ops.graph import build_tiled_graph
from maxk_tpu.ops.spmm import spmm, spmm_dense_oracle
from maxk_tpu.ops.spgemm import maxk_spgemm
from maxk_tpu.ops.maxk import maxk
from maxk_tpu.parallel.mesh import make_graph_mesh, GRAPH_AXIS
from maxk_tpu.parallel.partition import (
    shard_graph, shard_bundle, shard_node_array, local_bundle)
from maxk_tpu.parallel.dist_train import DistTrainer
from maxk_tpu.data.datasets import make_synthetic_dataset
from maxk_tpu.train.loop import Trainer

from conftest import random_graph


N_DEV = 8


@pytest.fixture(scope="module")
def mesh():
    return make_graph_mesh(N_DEV)


def test_sharded_spmm_matches_oracle(mesh):
    csr = random_graph(200, 10.0, seed=21)
    x = np.random.default_rng(0).normal(size=(200, 32)).astype(np.float32)
    ref = spmm_dense_oracle(csr, x)

    st = shard_graph(csr, N_DEV, row_block=8, edge_tile=32)
    x_pad = jnp.asarray(shard_node_array(x, st.n_nodes_padded))

    def f(tiles, xs):
        g = tiles.local(GRAPH_AXIS)
        return spmm(g, xs, compute_dtype=jnp.float32)

    out = jax.jit(jax.shard_map(
        f, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(GRAPH_AXIS), st), P(GRAPH_AXIS)),
        out_specs=P(GRAPH_AXIS), check_vma=False))(st, x_pad)
    np.testing.assert_allclose(np.asarray(out)[:200], ref,
                               rtol=1e-4, atol=1e-4)


def test_sharded_maxk_spgemm_forward_and_grad(mesh):
    """Fused MaxK SpGEMM under shard_map (CBSR-compressed all-gather)
    matches the single-device fused op in both forward and gradient."""
    csr = random_graph(160, 8.0, seed=22)
    d, k = 32, 8
    x = np.random.default_rng(1).normal(size=(160, d)).astype(np.float32)

    g1 = build_tiled_graph(csr, row_block=8, edge_tile=32)
    gt1 = build_tiled_graph(csr.transpose(), row_block=8, edge_tile=32)
    y_ref = maxk_spgemm(g1, gt1, jnp.asarray(x), k,
                        compute_dtype=jnp.float32)
    w = np.random.default_rng(2).normal(size=y_ref.shape).astype(np.float32)
    grad_ref = jax.grad(lambda xx: jnp.sum(jnp.asarray(w) * maxk_spgemm(
        g1, gt1, xx, k, compute_dtype=jnp.float32)))(jnp.asarray(x))

    bund = shard_bundle(csr, N_DEV, row_block=8, edge_tile=32)
    v_pad = bund.n_nodes_padded
    x_pad = jnp.asarray(shard_node_array(x, v_pad))
    w_pad = jnp.asarray(shard_node_array(w, v_pad))

    def loss(bundle, xs, ws):
        graphs = local_bundle(bundle, GRAPH_AXIS)
        y = maxk_spgemm(graphs.g_mean.replace(
            vals=graphs.g_mean.vals), graphs.g_mean_t, xs, k,
            compute_dtype=jnp.float32)
        return jax.lax.psum(jnp.sum(ws * y), GRAPH_AXIS)

    # Use the sum-aggregation graphs to match the single-device setup.
    def loss_sum(bundle, xs, ws):
        graphs = local_bundle(bundle, GRAPH_AXIS)
        y = maxk_spgemm(graphs.g_sum, graphs.g_sum_t, xs, k,
                        compute_dtype=jnp.float32)
        return jax.lax.psum(jnp.sum(ws * y), GRAPH_AXIS)

    smapped = jax.shard_map(
        loss_sum, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(GRAPH_AXIS), bund),
                  P(GRAPH_AXIS), P(GRAPH_AXIS)),
        out_specs=P(), check_vma=False)
    val = jax.jit(smapped)(bund, x_pad, w_pad)
    grad = jax.jit(jax.grad(lambda xs: smapped(bund, xs, w_pad)))(x_pad)

    ref_val = float(jnp.sum(jnp.asarray(w) * y_ref))
    assert float(val) == pytest.approx(ref_val, rel=1e-4)
    np.testing.assert_allclose(np.asarray(grad)[:160], np.asarray(grad_ref),
                               rtol=1e-4, atol=1e-4)


@dataclasses.dataclass
class _Cfg:
    dataset: str = "synthetic"
    model: str = "sage"
    hidden_dim: int = 16
    hidden_layers: int = 2
    dropout: float = 0.0      # exact single-vs-multi comparison
    norm: bool = False
    nonlinear: str = "maxk"
    maxk: int = 4
    epochs: int = 4
    w_lr: float = 0.01
    w_weight_decay: float = 0.0
    enable_lookahead: bool = False
    seed: int = 97
    selfloop: bool = False
    path: str = "/tmp/maxk_dist_test"
    log_every: int = 1
    eval_every: int = 1
    save_every: int = 0
    resume: bool = False
    timing: bool = False
    n_devices: int = N_DEV
    compute_dtype: str = "float32"  # exact single-vs-multi comparison


@pytest.mark.parametrize("model", ["sage", "gcn", "gin"])
def test_dist_step_matches_single_device(mesh, model, tmp_path):
    """With dropout=0 the distributed loss sequence must equal the
    single-device trainer's losses (same init seed)."""
    ds = make_synthetic_dataset(n_nodes=200, avg_degree=6.0, n_classes=4,
                                in_size=12, seed=30)
    cfg = _Cfg(model=model, path=str(tmp_path))

    # Single device (float32 compute for exactness on CPU anyway)
    tr1 = Trainer(cfg, ds)
    st1 = tr1.init_state()
    losses1 = []
    rng = jax.random.PRNGKey(cfg.seed + 1)
    for _ in range(3):
        rng, k1 = jax.random.split(rng)
        st1, l1 = tr1._jit_step(st1, k1)
        losses1.append(float(l1))

    # Distributed
    tr8 = DistTrainer(cfg, ds, mesh=mesh, row_block=8, edge_tile=32)
    st8 = tr8.init_state_concrete(tr1.graphs, tr1.features)
    losses8 = []
    rng = jax.random.PRNGKey(cfg.seed + 1)
    for _ in range(3):
        rng, k1 = jax.random.split(rng)
        st8, l8 = tr8.train_step(st8, k1)
        losses8.append(float(l8))

    np.testing.assert_allclose(losses8, losses1, rtol=5e-3, atol=5e-4)

    # Eval logits agree too (atol covers bf16 accumulation-order noise
    # between the different single/multi-device tile layouts).
    logits1 = np.asarray(tr1._jit_logits(st1))
    logits8 = tr8.eval_logits(st8)
    np.testing.assert_allclose(logits8, logits1, rtol=5e-2, atol=2e-2)


def test_dist_step_model_parallel_matches_single(tmp_path):
    """2-D (graph=4, model=2) mesh: dense-layer kernels column-sharded
    over the Auto model axis (tensor parallelism, collectives inserted by
    GSPMD) while the graph axis stays manual with halo exchange. With
    dropout=0 / float32 the loss sequence must match the single-device
    trainer."""
    from maxk_tpu.parallel.mesh import make_graph_mesh, MODEL_AXIS
    mesh2 = make_graph_mesh(8, model_axis_size=2)
    assert mesh2.shape[MODEL_AXIS] == 2

    ds = make_synthetic_dataset(n_nodes=200, avg_degree=6.0, n_classes=4,
                                in_size=12, seed=30)
    cfg = _Cfg(model="sage", path=str(tmp_path))

    tr1 = Trainer(cfg, ds)
    st1 = tr1.init_state()
    losses1 = []
    rng = jax.random.PRNGKey(cfg.seed + 1)
    for _ in range(3):
        rng, k1 = jax.random.split(rng)
        st1, l1 = tr1._jit_step(st1, k1)
        losses1.append(float(l1))

    tr_tp = DistTrainer(cfg, ds, mesh=mesh2, row_block=8, edge_tile=32)
    assert tr_tp.n_shards == 4 and tr_tp.model_parallel == 2
    st = tr_tp.init_state_concrete(tr1.graphs, tr1.features)

    def assert_state_placement(state):
        """2-D kernels (params AND their Adam moments) are stored
        column-sharded over the model axis at rest — per-device buffers
        hold dout/2 columns — while 1-D leaves stay replicated."""
        def check(path, p):
            is_kernel = (path and getattr(path[-1], "key", None) == "kernel"
                         and p.ndim == 2)
            spec = p.sharding.spec
            if is_kernel:
                assert spec == P(None, MODEL_AXIS), (
                    f"{jax.tree_util.keystr(path)}: {spec}")
                shard_shape = p.sharding.shard_shape(p.shape)
                assert shard_shape[1] * 2 == p.shape[1]
            else:
                assert not any(spec), (
                    f"{jax.tree_util.keystr(path)}: {spec}")
        jax.tree_util.tree_map_with_path(check, state.params)
        jax.tree_util.tree_map_with_path(check, state.opt_state)

    assert_state_placement(st)
    losses_tp = []
    rng = jax.random.PRNGKey(cfg.seed + 1)
    for _ in range(3):
        rng, k1 = jax.random.split(rng)
        st, l = tr_tp.train_step(st, k1)
        losses_tp.append(float(l))

    np.testing.assert_allclose(losses_tp, losses1, rtol=5e-3, atol=5e-4)
    # Placement survives the donated train steps.
    assert_state_placement(st)

    logits_tp = tr_tp.eval_logits(st)
    logits1 = np.asarray(tr1._jit_logits(st1))
    np.testing.assert_allclose(logits_tp, logits1, rtol=5e-2, atol=2e-2)


def test_dist_fit_learns(mesh, tmp_path):
    ds = make_synthetic_dataset(n_nodes=240, avg_degree=8.0, n_classes=4,
                                in_size=16, seed=31)
    cfg = _Cfg(path=str(tmp_path), epochs=12, dropout=0.1)
    res = DistTrainer(cfg, ds, mesh=mesh, row_block=8,
                      edge_tile=32).fit()
    assert res.history[0]["loss"] > res.history[-1]["loss"]
    assert res.best_val > 0.5


def test_halo_matches_allgather(mesh):
    """Neighbor-selective halo exchange == full all-gather execution."""
    csr = random_graph(200, 10.0, seed=41)
    x = np.random.default_rng(5).normal(size=(200, 32)).astype(np.float32)
    outs = {}
    for halo in (True, False):
        st = shard_graph(csr, N_DEV, row_block=8, edge_tile=32, halo=halo)
        x_pad = jnp.asarray(shard_node_array(x, st.n_nodes_padded))

        def f(tiles, xs):
            return spmm(tiles.local(GRAPH_AXIS), xs,
                        compute_dtype=jnp.float32)

        outs[halo] = np.asarray(jax.jit(jax.shard_map(
            f, mesh=mesh,
            in_specs=(jax.tree.map(lambda _: P(GRAPH_AXIS), st),
                      P(GRAPH_AXIS)),
            out_specs=P(GRAPH_AXIS), check_vma=False))(st, x_pad))[:200]
    assert shard_graph(csr, N_DEV, halo=True,
                       row_block=8, edge_tile=32).send_idx is not None
    np.testing.assert_allclose(outs[True], outs[False], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(outs[True], spmm_dense_oracle(csr, x),
                               rtol=1e-4, atol=1e-4)


def test_halo_locality_no_cross_edges(mesh):
    """A block-diagonal graph (each shard's edges fully local) needs no
    collective at all: the plan reports zero halo rows."""
    rng = np.random.default_rng(7)
    n, per = 160, 20          # 8 shards x 20 rows (row_block=4 -> rps=20)
    src = np.concatenate([rng.integers(s * per, (s + 1) * per, 100)
                          for s in range(8)])
    dst = np.concatenate([rng.integers(s * per, (s + 1) * per, 100)
                          for s in range(8)])
    from maxk_tpu.ops.graph import CSRGraph
    csr = CSRGraph.from_coo(src, dst.astype(np.int32), n)
    st = shard_graph(csr, N_DEV, row_block=4, edge_tile=16, halo=True)
    assert st.send_idx is None and st.halo_rows == 0
    g_local = st.local(GRAPH_AXIS)
    assert g_local.gather_axis is None and g_local.halo is None

    x = rng.normal(size=(n, 16)).astype(np.float32)
    x_pad = jnp.asarray(shard_node_array(x, st.n_nodes_padded))
    out = jax.jit(jax.shard_map(
        lambda t, xs: spmm(t.local(GRAPH_AXIS), xs,
                           compute_dtype=jnp.float32),
        mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(GRAPH_AXIS), st), P(GRAPH_AXIS)),
        out_specs=P(GRAPH_AXIS), check_vma=False))(st, x_pad)
    np.testing.assert_allclose(np.asarray(out)[:n],
                               spmm_dense_oracle(csr, x),
                               rtol=1e-4, atol=1e-4)


def test_halo_rows_scale_with_edge_cut(mesh):
    """Mostly-local partition: halo rows must be far below rows_per_shard
    (the all-gather equivalent)."""
    rng = np.random.default_rng(8)
    n, per = 320, 40
    # 95% intra-cluster edges, 5% cross.
    src_l = np.concatenate([rng.integers(s * per, (s + 1) * per, 380)
                            for s in range(8)])
    dst_l = np.concatenate([rng.integers(s * per, (s + 1) * per, 380)
                            for s in range(8)])
    src_x = rng.integers(0, n, 160)
    dst_x = rng.integers(0, n, 160)
    from maxk_tpu.ops.graph import CSRGraph
    csr = CSRGraph.from_coo(np.concatenate([src_l, src_x]),
                            np.concatenate([dst_l, dst_x]).astype(np.int32),
                            n)
    st = shard_graph(csr, N_DEV, row_block=8, edge_tile=32, halo=True)
    assert st.send_idx is not None
    # ~20 cross edges per (src, dst) pair -> halo_rows ~ tens, not 40.
    assert st.halo_rows < st.rows_per_shard


def test_parted_sharded_spmm_matches_oracle(mesh):
    """Column-parted shards (forced tiny col_part_rows) == oracle: every
    gather runs against a <= part_rows slice of the [local|halo] table."""
    csr = random_graph(200, 10.0, seed=51)
    x = np.random.default_rng(9).normal(size=(200, 32)).astype(np.float32)
    st = shard_graph(csr, N_DEV, row_block=8, edge_tile=32, col_part_rows=16)
    from maxk_tpu.parallel.partition import ShardedPartedTiles
    assert isinstance(st, ShardedPartedTiles)
    assert len(st.parts_local) == 2       # rows_per_shard 32 / 16
    assert st.parts_halo                  # random graph has cross edges
    x_pad = jnp.asarray(shard_node_array(x, st.n_nodes_padded))

    def f(tiles, xs):
        return spmm(tiles.local(GRAPH_AXIS), xs, compute_dtype=jnp.float32)

    out = jax.jit(jax.shard_map(
        f, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(GRAPH_AXIS), st), P(GRAPH_AXIS)),
        out_specs=P(GRAPH_AXIS), check_vma=False))(st, x_pad)
    np.testing.assert_allclose(np.asarray(out)[:200],
                               spmm_dense_oracle(csr, x),
                               rtol=1e-4, atol=1e-4)


def test_parted_sharded_maxk_spgemm_grad(mesh):
    """Fused MaxK SpGEMM forward + gradient through column-parted shards
    (CBSR wire exchange + parted scans) == single-device fused op."""
    csr = random_graph(160, 8.0, seed=52)
    d, k = 32, 8
    x = np.random.default_rng(3).normal(size=(160, d)).astype(np.float32)
    g1 = build_tiled_graph(csr, row_block=8, edge_tile=32)
    gt1 = build_tiled_graph(csr.transpose(), row_block=8, edge_tile=32)
    y_ref = maxk_spgemm(g1, gt1, jnp.asarray(x), k,
                        compute_dtype=jnp.float32)
    w = np.random.default_rng(4).normal(size=y_ref.shape).astype(np.float32)

    bund = shard_bundle(csr, N_DEV, row_block=8, edge_tile=32,
                        col_part_rows=16)
    v_pad = bund.n_nodes_padded
    x_pad = jnp.asarray(shard_node_array(x, v_pad))
    w_pad = jnp.asarray(shard_node_array(w, v_pad))

    def loss_sum(bundle, xs, ws):
        graphs = local_bundle(bundle, GRAPH_AXIS)
        y = maxk_spgemm(graphs.g_sum, graphs.g_sum_t, xs, k,
                        compute_dtype=jnp.float32)
        return jax.lax.psum(jnp.sum(ws * y), GRAPH_AXIS)

    smapped = jax.shard_map(
        loss_sum, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(GRAPH_AXIS), bund),
                  P(GRAPH_AXIS), P(GRAPH_AXIS)),
        out_specs=P(), check_vma=False)
    val = jax.jit(smapped)(bund, x_pad, w_pad)
    grad = jax.jit(jax.grad(lambda xs: smapped(bund, xs, w_pad)))(x_pad)

    grad_ref = jax.grad(lambda xx: jnp.sum(jnp.asarray(w) * maxk_spgemm(
        g1, gt1, xx, k, compute_dtype=jnp.float32)))(jnp.asarray(x))
    ref_val = float(jnp.sum(jnp.asarray(w) * y_ref))
    assert float(val) == pytest.approx(ref_val, rel=1e-4)
    np.testing.assert_allclose(np.asarray(grad)[:160], np.asarray(grad_ref),
                               rtol=1e-4, atol=1e-4)


def test_parted_dist_trainer_step(mesh, tmp_path):
    """DistTrainer over column-parted shards matches the single-device
    loss sequence (dropout 0, float32)."""
    ds = make_synthetic_dataset(n_nodes=200, avg_degree=6.0, n_classes=4,
                                in_size=12, seed=33)
    cfg = _Cfg(model="sage", path=str(tmp_path))
    tr1 = Trainer(cfg, ds)
    st1 = tr1.init_state()
    losses1 = []
    rng = jax.random.PRNGKey(cfg.seed + 1)
    for _ in range(2):
        rng, k1 = jax.random.split(rng)
        st1, l1 = tr1._jit_step(st1, k1)
        losses1.append(float(l1))

    tr8 = DistTrainer(cfg, ds, mesh=mesh, row_block=8, edge_tile=32,
                      col_part_rows=16)
    from maxk_tpu.parallel.partition import ShardedPartedTiles
    assert isinstance(tr8.sharded.g_mean, ShardedPartedTiles)
    st8 = tr8.init_state_concrete(tr1.graphs, tr1.features)
    losses8 = []
    rng = jax.random.PRNGKey(cfg.seed + 1)
    for _ in range(2):
        rng, k1 = jax.random.split(rng)
        st8, l8 = tr8.train_step(st8, k1)
        losses8.append(float(l8))
    np.testing.assert_allclose(losses8, losses1, rtol=5e-3, atol=5e-4)


def test_parted_fully_local_no_collective(mesh):
    """Block-diagonal graph + forced parting: no cross-shard edges means
    spec is None and only local parts exist; results still match."""
    rng = np.random.default_rng(17)
    n, per = 160, 20
    src = np.concatenate([rng.integers(s * per, (s + 1) * per, 100)
                          for s in range(8)])
    dst = np.concatenate([rng.integers(s * per, (s + 1) * per, 100)
                          for s in range(8)])
    from maxk_tpu.ops.graph import CSRGraph
    csr = CSRGraph.from_coo(src, dst.astype(np.int32), n)
    st = shard_graph(csr, N_DEV, row_block=4, edge_tile=16,
                     col_part_rows=8)
    from maxk_tpu.parallel.partition import ShardedPartedTiles
    assert isinstance(st, ShardedPartedTiles)
    assert st.send_idx is None and not st.parts_halo
    g_local = st.local(GRAPH_AXIS)
    assert g_local.spec is None

    x = rng.normal(size=(n, 16)).astype(np.float32)
    x_pad = jnp.asarray(shard_node_array(x, st.n_nodes_padded))
    out = jax.jit(jax.shard_map(
        lambda t, xs: spmm(t.local(GRAPH_AXIS), xs,
                           compute_dtype=jnp.float32),
        mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(GRAPH_AXIS), st), P(GRAPH_AXIS)),
        out_specs=P(GRAPH_AXIS), check_vma=False))(st, x_pad)
    np.testing.assert_allclose(np.asarray(out)[:n],
                               spmm_dense_oracle(csr, x),
                               rtol=1e-4, atol=1e-4)


def test_parted_sharded_int8_mode(mesh):
    """Quantized-gather mode through column-parted shards stays within
    int8 quantization error of the oracle."""
    csr = random_graph(200, 10.0, seed=53)
    x = np.random.default_rng(11).normal(size=(200, 32)).astype(np.float32)
    st = shard_graph(csr, N_DEV, row_block=8, edge_tile=32,
                     col_part_rows=16)
    x_pad = jnp.asarray(shard_node_array(x, st.n_nodes_padded))
    out = jax.jit(jax.shard_map(
        lambda t, xs: spmm(t.local(GRAPH_AXIS), xs, compute_dtype="int8"),
        mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(GRAPH_AXIS), st), P(GRAPH_AXIS)),
        out_specs=P(GRAPH_AXIS), check_vma=False))(st, x_pad)
    ref = spmm_dense_oracle(csr, x)
    err = np.abs(np.asarray(out)[:200] - ref)
    # int8 per-column scale: relative error bounded by ~1/127 per element
    # times the row's accumulation magnitude.
    assert err.mean() / max(1.0, np.abs(ref).mean()) < 0.02


def test_dist_checkpoint_resume(mesh, tmp_path):
    """Distributed save -> resume: Orbax-restored leaves come back
    committed to single devices and must be re-replicated over the mesh
    (regression: jit rejected device-0 epoch vs mesh-replicated params)."""
    ds = make_synthetic_dataset(n_nodes=200, avg_degree=6.0, n_classes=4,
                                in_size=12, seed=35)
    cfg = _Cfg(path=str(tmp_path), epochs=2, save_every=1, dropout=0.1)
    DistTrainer(cfg, ds, mesh=mesh, row_block=8, edge_tile=32).fit()
    cfg2 = _Cfg(path=str(tmp_path), epochs=4, save_every=2, resume=True,
                dropout=0.1)
    res = DistTrainer(cfg2, ds, mesh=mesh, row_block=8, edge_tile=32).fit()
    # Resumed at epoch 2, trained 2 more of the 4-epoch budget.
    assert res.epochs_run == 2
    assert [h["epoch"] for h in res.history] == [2, 3]
