#!/usr/bin/env python
"""Build 59-class PASCAL-Context label PNGs from the official full annotations.

The 59-class protocol (Mottaghi et al. 2014) evaluates on the 59 most
frequent of the full ~459 PASCAL-Context categories. The official
distribution (``trainval.tar.gz`` + ``labels.txt`` from the PASCAL-Context
site) ships per-image ``.mat`` files whose ``LabelMap`` holds RAW category
ids; this tool remaps them to the 59-class vocabulary and writes 1-indexed
PNGs compatible with ``data/context.PascalContext(n_classes=59)``:

    pixel value 0      = not one of the 59 classes (loader maps to ignore -1)
    pixel value 1..59  = index+1 into assets.CONTEXT59_CLASS_NAMES

The remap is derived from ``labels.txt`` BY NAME — if any of the 59 names is
absent there, the tool fails loudly instead of silently mislabeling (this is
also the egress-day validation of CONTEXT59_CLASS_NAMES' ordering: ids come
from the official file, never from assumptions about it).

Usage:
    python scripts/make_context59_labels.py \
        --labels-txt <path>/labels.txt --mat-dir <path>/trainval \
        --out-dir data/context/59_context_labels

This is an EXTENSION beyond the reference (which ships only pre-remapped
33-class PNGs — context_dataset.py:16-50, downloaded at
context_dataset.py:161-181).
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import re
import sys


def parse_labels_txt(path: str) -> dict:
    """``labels.txt`` lines are ``<raw_id>: <name>``; returns {name: raw_id}."""
    mapping: dict[str, int] = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            m = re.match(r"^(\d+)\s*:\s*(.+)$", line)
            if not m:
                raise ValueError(f"unparseable labels.txt line: {line!r}")
            name = m.group(2).strip()
            mapping[name] = int(m.group(1))
    return mapping


def build_lut(raw_by_name: dict, max_raw_id: int):
    """(max_raw_id+1,) uint8 lut: raw id -> 59-class 1-indexed id (0 = drop)."""
    import numpy as np

    from zeroshotsemanticsegmentation_tpu.data.assets import (
        CONTEXT59_CLASS_NAMES)

    missing = [n for n in CONTEXT59_CLASS_NAMES if n not in raw_by_name]
    if missing:
        raise ValueError(
            "labels.txt is missing these 59-class names (vocabulary "
            f"mismatch — do NOT proceed): {missing}")
    lut = np.zeros(max_raw_id + 1, dtype=np.uint8)
    for idx59, name in enumerate(CONTEXT59_CLASS_NAMES):
        raw = raw_by_name[name]
        if raw > max_raw_id:
            raise ValueError(f"raw id {raw} for {name!r} exceeds LabelMap "
                             "range")
        lut[raw] = idx59 + 1
    return lut


def convert(labels_txt: str, mat_dir: str, out_dir: str,
            *, mat_key: str = "LabelMap") -> int:
    import numpy as np
    import PIL.Image
    import scipy.io

    raw_by_name = parse_labels_txt(labels_txt)
    lut = build_lut(raw_by_name, max_raw_id=max(raw_by_name.values()))
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for fname in sorted(os.listdir(mat_dir)):
        if not fname.endswith(".mat"):
            continue
        mat = scipy.io.loadmat(osp.join(mat_dir, fname))
        if mat_key not in mat:
            raise KeyError(f"{fname}: no {mat_key!r} variable "
                           f"(found {sorted(k for k in mat if not k.startswith('__'))})")
        raw = np.asarray(mat[mat_key])
        if raw.max() >= lut.shape[0]:
            raise ValueError(f"{fname}: raw id {raw.max()} out of labels.txt "
                             "range")
        remapped = lut[raw]
        PIL.Image.fromarray(remapped, mode="L").save(
            osp.join(out_dir, fname[:-4] + ".png"))
        n += 1
    if n == 0:
        raise FileNotFoundError(f"no .mat files under {mat_dir}")
    return n


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--labels-txt", required=True)
    p.add_argument("--mat-dir", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--mat-key", default="LabelMap")
    a = p.parse_args(argv)
    n = convert(a.labels_txt, a.mat_dir, a.out_dir, mat_key=a.mat_key)
    print(f"wrote {n} 59-class label PNGs to {a.out_dir}")


if __name__ == "__main__":
    sys.exit(main())
