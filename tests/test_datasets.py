"""Dataset layer: npz wire format round-trip, registry wiring, proteins
edge-feature aggregation, synthetic learnability hooks."""

import numpy as np
import pytest

from maxk_tpu.data import datasets as ds_lib
from maxk_tpu.data.loaders import save_csr_binary, load_csr_binary, \
    available_graphs, synthetic_graph
from tests.conftest import random_graph


def test_npz_roundtrip(tmp_path):
    g = random_graph(n_nodes=120, avg_degree=6.0, seed=11)
    v = g.n_nodes
    rng = np.random.default_rng(0)
    np.savez(tmp_path / "reddit.npz",
             indptr=g.indptr, indices=g.indices,
             feat=rng.normal(size=(v, 16)).astype(np.float32),
             label=rng.integers(0, 5, size=v),
             train_mask=rng.uniform(size=v) < 0.6,
             val_mask=rng.uniform(size=v) < 0.2,
             test_mask=rng.uniform(size=v) < 0.2,
             num_classes=5)
    d = ds_lib.load_dataset("reddit", str(tmp_path))
    assert d.csr.n_nodes == v
    assert d.in_size == 16
    assert d.labels.dtype == np.int64
    assert not d.multilabel and d.metric == "micro_f1"

    # selfloop applies AddSelfLoop semantics
    d2 = ds_lib.load_dataset("reddit", str(tmp_path), selfloop=True)
    rows, cols = d2.csr.to_coo()
    assert ((rows == cols).sum()) == v


def test_multilabel_dataset(tmp_path):
    g = random_graph(n_nodes=80, avg_degree=4.0, seed=3)
    v = g.n_nodes
    rng = np.random.default_rng(1)
    np.savez(tmp_path / "yelp.npz",
             indptr=g.indptr, indices=g.indices,
             feat=rng.normal(size=(v, 8)).astype(np.float32),
             label=(rng.uniform(size=(v, 10)) < 0.3).astype(np.float32),
             train_mask=np.ones(v, bool), val_mask=np.ones(v, bool),
             test_mask=np.ones(v, bool), num_classes=10)
    d = ds_lib.load_dataset("yelp", str(tmp_path))
    assert d.multilabel
    assert d.labels.shape == (v, 10)
    assert d.labels.dtype == np.float32


def test_missing_file_message(tmp_path):
    with pytest.raises(FileNotFoundError, match="convert_dgl_dataset"):
        ds_lib.load_dataset("flickr", str(tmp_path))


def test_unknown_dataset():
    with pytest.raises(ValueError, match="unknown dataset"):
        ds_lib.load_dataset("imagenet")


def test_proteins_edge_aggregation():
    # node feat = sum of edge feats over IN-edges (update_all(copy_e, sum)):
    # edge e=(u->v) contributes edge_feat[e] to node v = indices[e].
    indptr = np.array([0, 2, 3, 3], dtype=np.int64)
    indices = np.array([1, 2, 2], dtype=np.int32)
    ef = np.array([[1., 0.], [0., 1.], [2., 2.]], dtype=np.float32)
    out = ds_lib.aggregate_edge_features(indptr, indices, ef)
    np.testing.assert_allclose(out, [[0, 0], [1, 0], [2, 3]])


def test_registry_covers_reference_datasets():
    for name in ("reddit", "flickr", "yelp", "ogbn-arxiv", "ogbn-products",
                 "ogbn-proteins"):
        assert name in ds_lib.DATASET_REGISTRY
    assert ds_lib.DATASET_REGISTRY["ogbn-proteins"]["metric"] == "rocauc"
    assert ds_lib.DATASET_REGISTRY["yelp"]["multilabel"]


def test_binary_graph_roundtrip(tmp_path):
    g = synthetic_graph(64, 4.0, seed=9)
    save_csr_binary(g, tmp_path, "mini")
    assert available_graphs(tmp_path) == ["mini"]
    g2 = load_csr_binary(tmp_path, "mini")
    np.testing.assert_array_equal(g.indptr, g2.indptr)
    np.testing.assert_array_equal(g.indices, g2.indices)


def test_synthetic_dataset_learnable_signal():
    d = ds_lib.make_synthetic_dataset(n_nodes=512, seed=1)
    assert d.train_mask.sum() + d.val_mask.sum() + d.test_mask.sum() == 512
    assert not (d.train_mask & d.val_mask).any()
    # features must carry label signal: nearest-prototype beats chance
    protos = np.stack([d.features[d.labels == c].mean(0)
                       for c in range(d.num_classes)])
    pred = np.argmax(d.features @ protos.T, axis=1)
    assert (pred == d.labels).mean() > 2.0 / d.num_classes


def test_rmat_graph_structure():
    """R-MAT generator: valid CSR, expected scale, heavier tail than the
    uniform power-law generator at the same (V, degree)."""
    from maxk_tpu.data.loaders import rmat_graph
    v, deg = 4096, 8.0
    g = rmat_graph(v, deg, seed=3)
    assert g.n_nodes == v
    assert g.n_edges == 2 * int(v * deg)        # symmetrized
    assert g.indices.min() >= 0 and g.indices.max() < v
    assert int(g.indptr[-1]) == g.n_edges
    # Determinism.
    g2 = rmat_graph(v, deg, seed=3)
    np.testing.assert_array_equal(g.indices, g2.indices)
    # Skew: R-MAT's recursive construction concentrates edges — its max
    # degree should far exceed the mean (community/hub structure).
    assert g.out_degrees.max() > 8 * g.avg_degree
    # Different seeds differ.
    g3 = rmat_graph(v, deg, seed=4)
    assert not np.array_equal(g.indices, g3.indices)


def test_rmat_suite_dispatch():
    from maxk_tpu.bench.harness import synthetic_by_name
    gp = synthetic_by_name("s24_cora", generator="power")
    gr = synthetic_by_name("s24_cora", generator="rmat")
    assert gp.n_nodes == gr.n_nodes == 2708
    assert not np.array_equal(gp.indptr, gr.indptr)
