"""Numerics core: losses, metrics, NNE inference, bilinear upsampling.

Pure jnp functions, CPU-testable, jit/shard_map friendly (static shapes,
no data-dependent Python control flow).
"""

from zeroshotsemanticsegmentation_tpu.ops.bilinear import (
    bilinear_filter_1d,
    bilinear_upsampling_kernel,
    upsample_matrix,
    upsample_bilinear_cropped,
)
from zeroshotsemanticsegmentation_tpu.ops.losses import (
    cross_entropy2d,
    mse_loss,
    cosine_loss,
)
from zeroshotsemanticsegmentation_tpu.ops.metrics import (
    confusion_matrix,
    zeroshot_hists,
    hist_to_metrics,
)
from zeroshotsemanticsegmentation_tpu.ops.nne import (
    cosine_similarities,
    infer_labels,
    infer_labels_stitched,
    infer_labels_szn,
    infer_labels_forced_unseen,
)

__all__ = [
    "bilinear_filter_1d",
    "bilinear_upsampling_kernel",
    "upsample_matrix",
    "upsample_bilinear_cropped",
    "cross_entropy2d",
    "mse_loss",
    "cosine_loss",
    "confusion_matrix",
    "zeroshot_hists",
    "hist_to_metrics",
    "cosine_similarities",
    "infer_labels",
    "infer_labels_stitched",
    "infer_labels_szn",
    "infer_labels_forced_unseen",
]
