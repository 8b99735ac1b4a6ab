"""Bundled class metadata: names, embedding matrices, split id lists.

Embeddings are the reference's word2vec-derived class matrices
(datasets/{pascal,context}/embeddings/norm_embed_arr_{dim}.pkl, row norms in
(0, 1]), converted to ``.npy``. One-hot matrices are identity — the reference
ships pascal's and *references* a context one that does not exist
(context_dataset.py:104); this framework bundles both.
"""

from __future__ import annotations

import os.path as osp

import numpy as np

_ASSETS_DIR = osp.join(osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))),
                       "assets")

EMBED_DIMS = (2, 5, 10, 20, 21, 50, 100, 200, 300)

# reference pascal_dataset.py:16-38
PASCAL_CLASS_NAMES = (
    "background", "aeroplane", "bicycle", "bird", "boat", "bottle", "bus",
    "car", "cat", "chair", "cow", "diningtable", "dog", "horse", "motorbike",
    "person", "potted plant", "sheep", "sofa", "train", "tv/monitor",
)

# reference context_dataset.py:16-50 (33 classes, no background)
CONTEXT_CLASS_NAMES = (
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor", "sky", "grass",
    "ground", "road", "building", "tree", "water", "mountain", "wall",
    "floor", "track", "keyboard", "ceiling",
)

_NUM_CLASSES = {"pascal": 21, "context": 33}


def class_names(dataset: str) -> tuple[str, ...]:
    if dataset == "pascal":
        return PASCAL_CLASS_NAMES
    if dataset == "context":
        return CONTEXT_CLASS_NAMES
    raise ValueError(f"unknown dataset {dataset!r}")


def load_class_embeddings(dataset: str, embed_dim: int, *,
                          one_hot: bool = False,
                          assets_dir: str | None = None) -> np.ndarray:
    """(n_class, embed_dim) float32 class-embedding matrix."""
    assets_dir = assets_dir or _ASSETS_DIR
    n = _NUM_CLASSES[dataset]
    if one_hot:
        if embed_dim != n:
            raise ValueError(
                f"one-hot embeddings for {dataset} require embed_dim={n}, "
                f"got {embed_dim}")  # reference train.py:235-239
        path = osp.join(assets_dir, dataset, "embeddings",
                        f"one_hot_{n}_dim.npy")
    else:
        path = osp.join(assets_dir, dataset, "embeddings",
                        f"norm_embed_arr_{embed_dim}.npy")
    arr = np.load(path).astype(np.float32)
    if arr.shape != (n, embed_dim):
        raise ValueError(f"bad embedding matrix {path}: {arr.shape}")
    return arr


def load_split_ids(dataset: str, split: str, *,
                   assets_dir: str | None = None) -> list[str]:
    """Image-id list for a split ('train' or 'val'); 'train_seen' uses
    train.txt with extra filtering (reference pascal_dataset.py:59-60)."""
    assets_dir = assets_dir or _ASSETS_DIR
    fname = "train.txt" if split in ("train", "train_seen") else f"{split}.txt"
    path = osp.join(assets_dir, dataset, fname)
    with open(path) as f:
        return [line.strip() for line in f if line.strip()]
