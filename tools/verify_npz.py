#!/usr/bin/env python
"""Validate a converter-produced dataset .npz against recorded invariants.

The TPU image has no egress, dgl, or ogb, so the real datasets cannot be
converted here — this tool closes the gap from the other side: the first
machine WITH dgl/ogb runs, in order,

  python tools/convert_dgl_dataset.py --dataset flickr --out ./data/
  python tools/verify_npz.py ./data/flickr.npz
  bash scripts_train/flickr_maxk.sh 32

and the verifier proves the produced file matches the published dataset
statistics (V / E / feature dim / class count / split sizes — sources:
DGL dataset docs for reddit/flickr/yelp, OGB leaderboard stats for
ogbn-*; reference recipes at maxk_gnn_dgl.py:136-199) plus the
structural invariants the training stack assumes.

Edge counts are checked as a band, not exactly: the converter applies
the reference's AddSelfLoop transform to reddit/flickr/yelp
(maxk_gnn_dgl.py:138-140), which shifts E by up to V.

Exit code 0 = valid; nonzero with a per-check report otherwise.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

# Published stats: V, feature dim AS CONVERTED (proteins: 8 edge-agg +
# 112 one-hot-train-label + 1 clamped-degree = 121), num_classes,
# (train, val, test) split sizes, directed edge-count band.
EXPECTED = {
    "reddit": dict(v=232965, feat_dim=602, num_classes=41,
                   splits=(153431, 23831, 55703),
                   e_band=(110_000_000, 120_000_000), label_ndim=1),
    "flickr": dict(v=89250, feat_dim=500, num_classes=7,
                   splits=(44625, 22312, 22313),
                   e_band=(850_000, 1_100_000), label_ndim=1),
    "yelp": dict(v=716847, feat_dim=300, num_classes=100,
                 splits=(537635, 107527, 71685),
                 e_band=(13_000_000, 15_500_000), label_ndim=2),
    "ogbn-arxiv": dict(v=169343, feat_dim=128, num_classes=40,
                       splits=(90941, 29799, 48603),
                       e_band=(1_100_000, 1_300_000), label_ndim=1),
    "ogbn-products": dict(v=2449029, feat_dim=100, num_classes=47,
                          splits=(196615, 39323, 2213091),
                          e_band=(118_000_000, 128_000_000), label_ndim=1),
    "ogbn-proteins": dict(v=132534, feat_dim=121, num_classes=112,
                          splits=(86619, 21236, 24679),
                          e_band=(75_000_000, 82_000_000), label_ndim=2),
}

REQUIRED_KEYS = ("indptr", "indices", "feat", "label", "train_mask",
                 "val_mask", "test_mask", "num_classes")


def check_npz(path: str, expected: dict | None = None,
              log=print) -> list[str]:
    """Return a list of failure strings (empty = valid).

    expected: stats dict (see EXPECTED values); None = structural checks
    only (unknown dataset name).
    """
    fails: list[str] = []

    def chk(ok: bool, msg: str):
        log(("ok   " if ok else "FAIL ") + msg)
        if not ok:
            fails.append(msg)

    z = np.load(path, allow_pickle=False)
    missing = [k for k in REQUIRED_KEYS if k not in z.files]
    chk(not missing, f"keys present (missing: {missing})"
        if missing else "all required keys present")
    if missing:
        return fails

    indptr = z["indptr"]
    indices = z["indices"]
    v = len(indptr) - 1
    e = len(indices)
    chk(indptr[0] == 0 and int(indptr[-1]) == e,
        f"indptr bounds: [0]={indptr[0]} [-1]={int(indptr[-1])} E={e}")
    chk(bool(np.all(np.diff(indptr) >= 0)), "indptr monotone")
    chk(e == 0 or (indices.min() >= 0 and indices.max() < v),
        f"indices in [0, V): min={indices.min() if e else 0} "
        f"max={indices.max() if e else 0} V={v}")

    feat = z["feat"]
    label = z["label"]
    chk(feat.shape[0] == v, f"feat rows == V ({feat.shape[0]} vs {v})")
    chk(label.shape[0] == v, f"label rows == V ({label.shape[0]} vs {v})")
    chk(bool(np.all(np.isfinite(feat))), "features finite")

    masks = [z[k].astype(bool) for k in
             ("train_mask", "val_mask", "test_mask")]
    for name, m in zip(("train", "val", "test"), masks):
        chk(m.shape == (v,), f"{name}_mask shape (V,) ({m.shape})")
    overlap = int((masks[0] & masks[1]).sum() + (masks[0] & masks[2]).sum()
                  + (masks[1] & masks[2]).sum())
    chk(overlap == 0, f"masks disjoint (overlap={overlap})")
    chk(int(masks[0].sum()) > 0, "train mask non-empty")

    ncls = int(z["num_classes"])
    if label.ndim == 1:
        lab_ok = label.min() >= 0 and label.max() < ncls
        chk(bool(lab_ok), f"labels in [0, {ncls}): "
            f"min={label.min()} max={label.max()}")
    else:
        chk(label.shape[1] == ncls,
            f"multilabel width == num_classes ({label.shape[1]} vs {ncls})")

    if expected is None:
        log("# no published-stats entry for this file name; "
            "structural checks only")
        return fails

    chk(v == expected["v"], f"V == {expected['v']} (got {v})")
    lo, hi = expected["e_band"]
    chk(lo <= e <= hi, f"E in [{lo}, {hi}] (got {e})")
    chk(feat.shape[1] == expected["feat_dim"],
        f"feat dim == {expected['feat_dim']} (got {feat.shape[1]})")
    chk(ncls == expected["num_classes"],
        f"num_classes == {expected['num_classes']} (got {ncls})")
    chk(label.ndim == expected["label_ndim"],
        f"label ndim == {expected['label_ndim']} (got {label.ndim})")
    for name, m, want in zip(("train", "val", "test"), masks,
                             expected["splits"]):
        chk(int(m.sum()) == want,
            f"{name} split size == {want} (got {int(m.sum())})")
    return fails


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("npz", help="path to <dataset>.npz")
    ap.add_argument("--dataset", default=None,
                    help="published-stats key (default: file stem)")
    args = ap.parse_args()

    name = args.dataset or Path(args.npz).stem
    expected = EXPECTED.get(name)
    fails = check_npz(args.npz, expected)
    if fails:
        print(f"\n{args.npz}: {len(fails)} check(s) FAILED — do not train "
              f"on this file; re-run tools/convert_dgl_dataset.py "
              f"--dataset {name}", file=sys.stderr)
        sys.exit(1)
    print(f"\n{args.npz}: valid ({name})")


if __name__ == "__main__":
    main()
