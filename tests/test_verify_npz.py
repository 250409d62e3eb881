"""tools/verify_npz.py: the npz-side half of the real-dataset bridge.

The converter runs on a dgl/ogb machine; this verifier is what that
machine runs next. Tested here on synthetic files: structural checks,
published-stats comparison via an injected expectation table, and the
failure modes (corrupt indptr, overlapping masks, wrong split sizes)."""

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

_ROOT = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def verify():
    spec = importlib.util.spec_from_file_location(
        "verify_npz", _ROOT / "tools" / "verify_npz.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _arrays(v=50, e=300, classes=5, feat_dim=8, seed=0, multilabel=False):
    rng = np.random.default_rng(seed)
    rows = rng.integers(0, v, e)
    counts = np.bincount(rows, minlength=v)
    indptr = np.zeros(v + 1, np.int64)
    np.cumsum(counts, out=indptr[1:])
    idx = np.zeros(v, int)
    split = rng.permutation(v)
    masks = dict(train_mask=np.zeros(v, bool), val_mask=np.zeros(v, bool),
                 test_mask=np.zeros(v, bool))
    masks["train_mask"][split[: v // 2]] = True
    masks["val_mask"][split[v // 2: 3 * v // 4]] = True
    masks["test_mask"][split[3 * v // 4:]] = True
    label = ((rng.uniform(size=(v, classes)) < 0.3).astype(np.float32)
             if multilabel else rng.integers(0, classes, v))
    del idx
    return dict(indptr=indptr,
                indices=rng.integers(0, v, e).astype(np.int32),
                feat=rng.normal(size=(v, feat_dim)).astype(np.float32),
                label=label, num_classes=classes, **masks)


def _write(tmp_path, arrays, name="synthetic_ds"):
    p = Path(tmp_path) / f"{name}.npz"
    np.savez_compressed(p, **arrays)
    return str(p)


def test_structural_pass(verify, tmp_path):
    p = _write(tmp_path, _arrays())
    assert verify.check_npz(p, None, log=lambda *a: None) == []


def test_expected_stats_pass_and_fail(verify, tmp_path):
    a = _arrays(v=50, e=300, classes=5, feat_dim=8)
    p = _write(tmp_path, a)
    exp = dict(v=50, feat_dim=8, num_classes=5,
               splits=(25, 12, 13), e_band=(100, 400), label_ndim=1)
    assert verify.check_npz(p, exp, log=lambda *a: None) == []
    bad = dict(exp, v=51, splits=(24, 12, 13))
    fails = verify.check_npz(p, bad, log=lambda *a: None)
    assert any("V ==" in f for f in fails)
    assert any("train split" in f for f in fails)


def test_corrupt_indptr_and_mask_overlap(verify, tmp_path):
    a = _arrays()
    a["indptr"] = a["indptr"].copy()
    a["indptr"][-1] += 1                      # indptr[-1] != E
    a["val_mask"] = a["train_mask"]           # overlapping masks
    p = _write(tmp_path, a)
    fails = verify.check_npz(p, None, log=lambda *a: None)
    assert any("indptr bounds" in f for f in fails)
    assert any("disjoint" in f for f in fails)


def test_multilabel_width_check(verify, tmp_path):
    a = _arrays(multilabel=True, classes=7)
    p = _write(tmp_path, a)
    assert verify.check_npz(p, None, log=lambda *a: None) == []
    a["num_classes"] = 6                      # width mismatch
    p2 = _write(tmp_path, a, "synthetic_ds2")
    fails = verify.check_npz(p2, None, log=lambda *a: None)
    assert any("multilabel width" in f for f in fails)


def test_missing_key_short_circuits(verify, tmp_path):
    a = _arrays()
    del a["feat"]
    p = _write(tmp_path, a)
    fails = verify.check_npz(p, None, log=lambda *a: None)
    assert len(fails) == 1 and "feat" in fails[0]


def test_expected_table_covers_all_reference_datasets(verify):
    assert set(verify.EXPECTED) == {
        "reddit", "flickr", "yelp", "ogbn-arxiv", "ogbn-products",
        "ogbn-proteins"}
    for name, exp in verify.EXPECTED.items():
        assert exp["e_band"][0] < exp["e_band"][1]
        assert len(exp["splits"]) == 3
