"""Data layer: class metadata, embedding assets, datasets, batched pipeline."""

from zeroshotsemanticsegmentation_tpu.data.assets import (
    load_class_embeddings, load_split_ids, class_names)
from zeroshotsemanticsegmentation_tpu.data.transforms import (
    MEAN_BGR, transform_image, untransform_image, pad_to_bucket)
from zeroshotsemanticsegmentation_tpu.data.pascal import PascalVOC
from zeroshotsemanticsegmentation_tpu.data.context import PascalContext
from zeroshotsemanticsegmentation_tpu.data.pipeline import (
    BatchLoader, SyntheticDataset)

__all__ = [
    "load_class_embeddings", "load_split_ids", "class_names",
    "MEAN_BGR", "transform_image", "untransform_image", "pad_to_bucket",
    "PascalVOC", "PascalContext", "BatchLoader", "SyntheticDataset",
]
