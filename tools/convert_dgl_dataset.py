#!/usr/bin/env python
"""Preprocess DGL/OGB datasets into the maxk_tpu .npz wire format.

Run on any machine with dgl + ogb (+ torch) installed — those packages are
not part of the TPU image. Replicates the reference driver's dataset
transforms exactly:

  reddit / flickr / yelp : dgl.data.*Dataset with AddSelfLoop transform
      (reference maxk_gnn_dgl.py:136-154)
  ogbn-arxiv / ogbn-products : DglNodePropPredDataset, split idx -> bool
      masks (reference maxk_gnn_dgl.py:155-184)
  ogbn-proteins : node feats = sum of adjacent 8-dim edge feats via
      update_all(copy_e, sum), plus one-hot train-label channel and
      clamped out-degree; 112 binary targets
      (reference utils/proteins_loader.py:26-58)

Output: <out>/<dataset>.npz with indptr/indices/feat/label/
train_mask/val_mask/test_mask/num_classes (see
maxk_tpu/data/datasets.py module docstring).
"""

import argparse
from pathlib import Path

import numpy as np


def _masks_from_split(split_idx, n):
    masks = {}
    for name, key in (("train_mask", "train"), ("val_mask", "valid"),
                      ("test_mask", "test")):
        m = np.zeros(n, dtype=bool)
        m[split_idx[key].numpy()] = True
        masks[name] = m
    return masks


def load(dataset: str):
    import dgl
    import torch

    if dataset in ("reddit", "flickr", "yelp"):
        transform = dgl.AddSelfLoop()  # maxk_gnn_dgl.py:138-140
        cls = {"reddit": dgl.data.RedditDataset,
               "flickr": dgl.data.FlickrDataset,
               "yelp": dgl.data.YelpDataset}[dataset]
        data = cls(transform=transform)
        g = data[0]
        feat = g.ndata["feat"].numpy().astype(np.float32)
        label = g.ndata["label"].numpy()
        masks = {k: g.ndata[m].numpy().astype(bool)
                 for k, m in (("train_mask", "train_mask"),
                              ("val_mask", "val_mask"),
                              ("test_mask", "test_mask"))}
        num_classes = int(data.num_classes)
        if dataset == "yelp":  # multilabel: (V, 100) float targets
            label = label.astype(np.float32)

    elif dataset in ("ogbn-arxiv", "ogbn-products"):
        from ogb.nodeproppred import DglNodePropPredDataset
        data = DglNodePropPredDataset(name=dataset)
        g, labels = data[0]
        label = labels.view(-1).numpy().astype(np.int64)
        feat = g.ndata["feat"].numpy().astype(np.float32)
        masks = _masks_from_split(data.get_idx_split(), g.num_nodes())
        num_classes = int(data.num_classes)

    elif dataset == "ogbn-proteins":
        # reference utils/proteins_loader.py:26-58
        from ogb.nodeproppred import DglNodePropPredDataset
        data = DglNodePropPredDataset(name="ogbn-proteins")
        g, labels = data[0]
        splits = data.get_idx_split()
        g.update_all(dgl.function.copy_e("feat", "m"),
                     dgl.function.sum("m", "feat"))
        feat = g.ndata["feat"].numpy().astype(np.float32)
        n = g.num_nodes()
        masks = _masks_from_split(splits, n)
        one_hot = np.zeros((n, labels.shape[1]), dtype=np.float32)
        train_idx = splits["train"].numpy()
        one_hot[train_idx] = labels[train_idx].numpy()
        deg = np.clip(g.out_degrees().numpy(), 0, 8)[:, None]
        feat = np.concatenate([feat, one_hot, deg.astype(np.float32)], axis=1)
        label = labels.numpy().astype(np.float32)  # (V, 112) binary
        num_classes = 112

    else:
        raise ValueError(f"unknown dataset {dataset}")

    indptr, indices, _ = g.adj_tensors("csr")
    indptr = indptr.numpy().astype(np.int64)
    indices = indices.numpy().astype(np.int32)
    return dict(indptr=indptr, indices=indices,
                feat=feat, label=label, num_classes=num_classes,
                symmetric=_is_symmetric(indptr, indices), **masks)


def _is_symmetric(indptr: np.ndarray, indices: np.ndarray) -> bool:
    """Structural A == A^T check (unit edge values). Stored in the npz so
    GraphBundle can skip the transpose builds at load time."""
    rows = np.repeat(np.arange(len(indptr) - 1, dtype=np.int64),
                     np.diff(indptr))
    cols = indices.astype(np.int64)
    fwd = np.lexsort((cols, rows))
    rev = np.lexsort((rows, cols))
    return bool(np.array_equal(rows[fwd], cols[rev])
                and np.array_equal(cols[fwd], rows[rev]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True,
                    choices=["reddit", "flickr", "yelp", "ogbn-arxiv",
                             "ogbn-products", "ogbn-proteins"])
    ap.add_argument("--out", default="./data/")
    args = ap.parse_args()

    arrays = load(args.dataset)
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    path = out / f"{args.dataset}.npz"
    np.savez_compressed(path, **arrays)
    print(f"wrote {path}: V={len(arrays['indptr'])-1} "
          f"E={len(arrays['indices'])} feat={arrays['feat'].shape} "
          f"classes={arrays['num_classes']}")


if __name__ == "__main__":
    main()
