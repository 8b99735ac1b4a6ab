"""PASCAL-Context dataset (33 classes, no background).

Reference parity (context_dataset.py:15-159): labels are 1-indexed PNGs under
``context/33_context_labels`` shifted by -1; images come from VOC2012; images
containing any invalid (-1) pixel are dropped from every split
(context_dataset.py:85-93).
"""

from __future__ import annotations

import os.path as osp

import numpy as np

from zeroshotsemanticsegmentation_tpu.data.assets import CONTEXT_CLASS_NAMES
from zeroshotsemanticsegmentation_tpu.data.base import SegDatasetBase


class PascalContext(SegDatasetBase):
    class_names = CONTEXT_CLASS_NAMES
    dataset_name = "context"

    def _keep_mask(self, presence):
        # every split additionally drops images with invalid pixels (column 0)
        keep = super()._keep_mask(presence)
        return keep & ~presence[:, 0]

    def image_path(self, did: str) -> str:
        return osp.join(self.data_dir, "pascal", "VOCdevkit", "VOC2012",
                        "JPEGImages", f"{did}.jpg")

    def label_path(self, did: str) -> str:
        return osp.join(self.data_dir, "context", "33_context_labels",
                        f"{did}.png")

    def native_label_kwargs(self) -> dict | None:
        return {"value_offset": -1, "map255_to_ignore": False}

    def _load_image(self, did: str) -> np.ndarray:
        import PIL.Image
        return np.asarray(PIL.Image.open(self.image_path(did)).convert("RGB"),
                          dtype=np.uint8)

    def _load_label(self, did: str) -> np.ndarray:
        import PIL.Image
        lbl = np.asarray(PIL.Image.open(self.label_path(did)), dtype=np.int32)
        return lbl - 1  # 1-indexed -> 0-indexed, invalid -> -1
