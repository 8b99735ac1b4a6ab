"""zeroshotsemanticsegmentation_tpu — TPU-native zero-shot semantic segmentation.

A from-scratch JAX/XLA/Pallas/pjit framework with the capabilities of the
Seenmask Zeroshot Network (SZN) reference (RohanDoshi2018/ZeroshotSemanticSegmentation):

  * FCN-32s (VGG16 layout) regressing per-pixel word embeddings, with a parallel
    seen/unseen ("seenmask") head (reference: models.py:27-193).
  * Nearest-neighbor-embedding (NNE) cosine inference over class embedding
    matrices, with seen/unseen stitching for zero-shot prediction
    (reference: utils.py:156-205) — here a fused Pallas TPU kernel.
  * Masked cosine / MSE / cross-entropy losses (reference: utils.py:19-102).
  * Confusion-matrix metrics with seen/unseen breakdown (reference:
    utils.py:104-154) — here streamed on-device.
  * PASCAL VOC/SBD and PASCAL-Context data pipelines with zero-shot split
    filtering (reference: pascal_dataset.py, context_dataset.py) — here with
    static-shape bucketing for XLA.
  * Two-stage training (FCN embedding regression, then frozen-backbone seenmask
    head) with checkpoint/best/resume, CSV/TensorBoard logging (reference:
    trainer_fcn.py, trainer_seenmask.py, train.py).
  * Data/tensor parallel scale-out over `jax.sharding.Mesh` (no analog in the
    single-GPU reference; designed TPU-first).

Import convention: ``import zeroshotsemanticsegmentation_tpu as zss``.
"""

__version__ = "0.1.0"

PAD_LABEL = -1  # ignore label: reference maps 255 -> -1 (pascal_dataset.py:120)
