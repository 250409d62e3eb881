"""tools/convert_dgl_dataset.py end-to-end, with dgl/ogb mocked.

The TPU image has no dgl/ogb and no network egress, so the converter
cannot run against the real datasets here. These tests inject faithful
fakes of the exact dgl/ogb API surface the converter touches
(reference maxk_gnn_dgl.py:136-199, utils/proteins_loader.py:26-58) and
drive every dataset branch through load() -> npz -> load_dataset() ->
Trainer.fit(), so the wire format and the transform logic are tested
even though the real downloads are unreachable.
"""

import dataclasses
import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import pytest
import torch

from maxk_tpu.data.datasets import aggregate_edge_features, load_dataset
from maxk_tpu.train.loop import Trainer


# ---------------------------------------------------------------------------
# Fake dgl / ogb
# ---------------------------------------------------------------------------

class FakeGraph:
    """The slice of dgl.DGLGraph the converter uses: ndata/edata dicts,
    adj_tensors('csr'), num_nodes, update_all(copy_e, sum), out_degrees."""

    def __init__(self, indptr, indices, ndata=None, edata=None):
        self.indptr = np.asarray(indptr, np.int64)
        self.indices = np.asarray(indices, np.int64)
        self.ndata = ndata or {}
        self.edata = edata or {}

    def num_nodes(self):
        return len(self.indptr) - 1

    def adj_tensors(self, fmt):
        assert fmt == "csr"
        eids = torch.arange(len(self.indices))
        return (torch.from_numpy(self.indptr),
                torch.from_numpy(self.indices), eids)

    def update_all(self, msg_fn, reduce_fn):
        # Only copy_e(feat) + sum -> node feat, like the proteins
        # transform (reference utils/proteins_loader.py:42-45). Messages
        # flow src->dst: edge e of CSR row r lands on indices[e].
        kind, ename, mname = msg_fn
        assert kind == "copy_e" and reduce_fn[0] == "sum"
        assert reduce_fn[1] == mname
        ef = self.edata[ename].numpy()
        out = np.zeros((self.num_nodes(), ef.shape[1]), np.float32)
        np.add.at(out, self.indices, ef.astype(np.float32))
        self.ndata[reduce_fn[2]] = torch.from_numpy(out)

    def out_degrees(self):
        return torch.from_numpy(np.diff(self.indptr))


class FakeAddSelfLoop:
    """dgl.AddSelfLoop: remove existing self-loops, then add one per node."""

    def __call__(self, g):
        rows = np.repeat(np.arange(g.num_nodes()), np.diff(g.indptr))
        cols = g.indices
        keep = rows != cols
        rows = np.concatenate([rows[keep], np.arange(g.num_nodes())])
        cols = np.concatenate([cols[keep], np.arange(g.num_nodes())])
        order = np.lexsort((cols, rows))
        rows, cols = rows[order], cols[order]
        indptr = np.zeros(g.num_nodes() + 1, np.int64)
        np.add.at(indptr, rows + 1, 1)
        return FakeGraph(np.cumsum(indptr), cols, ndata=g.ndata,
                         edata=g.edata)


def _dgl_dataset_cls(graph, num_classes):
    class _DS:
        def __init__(self, transform=None):
            self._g = transform(graph) if transform else graph
            self.num_classes = num_classes

        def __getitem__(self, i):
            assert i == 0
            return self._g

    return _DS


def _ogb_dataset_cls(graph, labels, split, num_classes):
    class _DS:
        def __init__(self, name=None):
            self.num_classes = num_classes

        def __getitem__(self, i):
            assert i == 0
            return graph, labels

        def get_idx_split(self):
            return split

    return _DS


def _random_graph(rng, v, e, symmetric=False):
    rows = rng.integers(0, v, e)
    cols = rng.integers(0, v, e)
    if symmetric:
        rows, cols = (np.concatenate([rows, cols]),
                      np.concatenate([cols, rows]))
    coo = np.unique(np.stack([rows, cols], 1), axis=0)
    rows, cols = coo[:, 0], coo[:, 1]
    indptr = np.zeros(v + 1, np.int64)
    np.add.at(indptr, rows + 1, 1)
    return FakeGraph(np.cumsum(indptr), cols)


def _random_split(rng, v):
    idx = rng.permutation(v)
    return {"train": torch.from_numpy(idx[: v // 2]),
            "valid": torch.from_numpy(idx[v // 2: 3 * v // 4]),
            "test": torch.from_numpy(idx[3 * v // 4:])}


@pytest.fixture
def convert(monkeypatch):
    """Import the converter with fake dgl/ogb visible; the fixture's
    `install` hooks register the dataset classes each test needs."""
    dgl = types.ModuleType("dgl")
    dgl.AddSelfLoop = FakeAddSelfLoop
    dgl.data = types.ModuleType("dgl.data")
    # The converter's class dict touches all three attributes; tests
    # override the one they exercise.
    dgl.data.RedditDataset = dgl.data.FlickrDataset = \
        dgl.data.YelpDataset = None
    dgl.function = types.SimpleNamespace(
        copy_e=lambda ename, mname: ("copy_e", ename, mname),
        sum=lambda mname, oname: ("sum", mname, oname))
    ogb = types.ModuleType("ogb")
    ogb_npp = types.ModuleType("ogb.nodeproppred")
    for name, mod in (("dgl", dgl), ("dgl.data", dgl.data),
                      ("ogb", ogb), ("ogb.nodeproppred", ogb_npp)):
        monkeypatch.setitem(sys.modules, name, mod)

    path = Path(__file__).resolve().parent.parent / "tools" / \
        "convert_dgl_dataset.py"
    spec = importlib.util.spec_from_file_location("convert_dgl_dataset",
                                                  path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod._fake_dgl, mod._fake_ogb_npp = dgl, ogb_npp
    return mod


@dataclasses.dataclass
class _Cfg:
    dataset: str = "flickr"
    model: str = "sage"
    hidden_dim: int = 16
    hidden_layers: int = 2
    dropout: float = 0.1
    norm: bool = False
    nonlinear: str = "maxk"
    maxk: int = 8
    epochs: int = 4
    w_lr: float = 0.01
    w_weight_decay: float = 0.0
    enable_lookahead: bool = False
    seed: int = 97
    selfloop: bool = False
    path: str = "/tmp/maxk_tpu_convert_test"
    log_every: int = 10
    eval_every: int = 2
    save_every: int = 0
    resume: bool = False
    timing: bool = False
    patience: int = 0
    compute_dtype: str = "float32"


def _write_npz(arrays, tmp_path, name):
    np.savez_compressed(Path(tmp_path) / f"{name}.npz", **arrays)


# ---------------------------------------------------------------------------
# Branches
# ---------------------------------------------------------------------------

def test_flickr_branch_end_to_end(convert, tmp_path):
    rng = np.random.default_rng(0)
    v = 80
    g = _random_graph(rng, v, 400, symmetric=True)
    g.ndata = {"feat": torch.from_numpy(
                   rng.normal(size=(v, 12)).astype(np.float32)),
               "label": torch.from_numpy(rng.integers(0, 5, v)),
               "train_mask": torch.from_numpy(rng.uniform(size=v) < 0.5),
               "val_mask": torch.zeros(v, dtype=torch.bool),
               "test_mask": torch.zeros(v, dtype=torch.bool)}
    convert._fake_dgl.data.FlickrDataset = _dgl_dataset_cls(g, 5)

    arrays = convert.load("flickr")
    # AddSelfLoop ran: every node has a self-edge.
    rows = np.repeat(np.arange(v), np.diff(arrays["indptr"]))
    self_edges = arrays["indices"][rows == arrays["indices"]]
    assert len(np.unique(self_edges)) == v
    # Self-loops keep a symmetric structure symmetric.
    assert bool(arrays["symmetric"])

    _write_npz(arrays, tmp_path, "flickr")
    ds = load_dataset("flickr", data_path=str(tmp_path))
    assert ds.features.shape == (v, 12) and not ds.multilabel
    assert ds.symmetric
    res = Trainer(_Cfg(path=str(tmp_path / "run")), ds).fit()
    assert np.isfinite(res.history[-1]["loss"])


def test_yelp_branch_multilabel(convert, tmp_path):
    rng = np.random.default_rng(1)
    v = 60
    g = _random_graph(rng, v, 240)
    label = (rng.uniform(size=(v, 7)) < 0.3).astype(np.float32)
    g.ndata = {"feat": torch.from_numpy(
                   rng.normal(size=(v, 8)).astype(np.float32)),
               "label": torch.from_numpy(label),
               "train_mask": torch.from_numpy(rng.uniform(size=v) < 0.5),
               "val_mask": torch.ones(v, dtype=torch.bool),
               "test_mask": torch.ones(v, dtype=torch.bool)}
    convert._fake_dgl.data.YelpDataset = _dgl_dataset_cls(g, 7)

    arrays = convert.load("yelp")
    assert arrays["label"].dtype == np.float32
    assert arrays["label"].shape == (v, 7)

    _write_npz(arrays, tmp_path, "yelp")
    ds = load_dataset("yelp", data_path=str(tmp_path))
    assert ds.multilabel and ds.metric == "micro_f1"
    assert ds.num_classes == 7


def test_products_branch_split_masks(convert, tmp_path):
    rng = np.random.default_rng(2)
    v = 70
    g = _random_graph(rng, v, 300)
    g.ndata = {"feat": torch.from_numpy(
        rng.normal(size=(v, 10)).astype(np.float32))}
    labels = torch.from_numpy(rng.integers(0, 6, (v, 1)))
    split = _random_split(rng, v)
    convert._fake_ogb_npp.DglNodePropPredDataset = \
        _ogb_dataset_cls(g, labels, split, 6)

    arrays = convert.load("ogbn-products")
    assert arrays["label"].shape == (v,)
    m = (arrays["train_mask"].astype(int) + arrays["val_mask"]
         + arrays["test_mask"])
    assert (m == 1).all()  # disjoint and complete
    assert arrays["train_mask"].sum() == v // 2

    _write_npz(arrays, tmp_path, "ogbn-products")
    ds = load_dataset("ogbn-products", data_path=str(tmp_path))
    assert ds.labels.dtype == np.int64 and ds.num_classes == 6


def test_proteins_branch_edge_aggregation(convert, tmp_path):
    rng = np.random.default_rng(3)
    v, n_targets = 50, 112
    g = _random_graph(rng, v, 250)
    e = len(g.indices)
    edge_feat = rng.normal(size=(e, 8)).astype(np.float32)
    g.edata = {"feat": torch.from_numpy(edge_feat)}
    labels = torch.from_numpy(
        (rng.uniform(size=(v, n_targets)) < 0.2).astype(np.float32))
    split = _random_split(rng, v)
    convert._fake_ogb_npp.DglNodePropPredDataset = \
        _ogb_dataset_cls(g, labels, split, n_targets)

    arrays = convert.load("ogbn-proteins")
    # feat = [edge-sum (8) | one-hot train labels (112) | clamped deg (1)]
    assert arrays["feat"].shape == (v, 8 + n_targets + 1)
    agg = aggregate_edge_features(g.indptr, g.indices, edge_feat)
    np.testing.assert_allclose(arrays["feat"][:, :8], agg, rtol=1e-6)
    onehot = arrays["feat"][:, 8:-1]
    train_idx = split["train"].numpy()
    np.testing.assert_array_equal(onehot[train_idx],
                                  labels.numpy()[train_idx])
    off_train = np.setdiff1d(np.arange(v), train_idx)
    assert (onehot[off_train] == 0).all()
    deg = arrays["feat"][:, -1]
    np.testing.assert_array_equal(deg, np.clip(np.diff(g.indptr), 0, 8))
    assert arrays["num_classes"] == n_targets

    _write_npz(arrays, tmp_path, "ogbn-proteins")
    ds = load_dataset("ogbn-proteins", data_path=str(tmp_path))
    assert ds.multilabel and ds.metric == "rocauc"


def test_is_symmetric_flag(convert):
    rng = np.random.default_rng(4)
    sym = _random_graph(rng, 40, 160, symmetric=True)
    asym = FakeGraph([0, 1, 1, 1], [2])  # single directed edge 0->2
    assert convert._is_symmetric(sym.indptr, sym.indices)
    assert not convert._is_symmetric(np.asarray(asym.indptr, np.int64),
                                     np.asarray(asym.indices, np.int64))
