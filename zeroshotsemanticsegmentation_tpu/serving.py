"""Production serving path: batched zero-shot segmentation as one XLA program.

`make_szn_predictor` returns a jitted function mapping image batches straight
to int32 label maps using the fastest inference pipeline: the model's raw
(1/32-resolution) heads feed the fused projection+upsample+argmax Pallas
kernel (ops.szn_fused) — full-resolution score volumes never reach HBM.
Measured on TPU v5e: bit-identical labels to the unfused reference pipeline.

This is the deployment counterpart of the reference's per-image
forward_szn + host-side NNE loop (trainer_fcn.py:123-147, utils.py:195-205).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from zeroshotsemanticsegmentation_tpu.ops.metrics import unseen_mask_vector
from zeroshotsemanticsegmentation_tpu.ops.szn_fused import (
    infer_labels_szn_fused)


def make_szn_predictor(model, params, embeddings, unseen_classes,
                       *, mesh=None, spatial=False, int8=False):
    """Returns predict(images (B,H,W,3) float32 BGR-mean-sub) -> (B,H,W) int32.

    `unseen_classes`: class ids routed to the unseen partition (the trained
    seenmask head gates per pixel). With `mesh`, batches shard over 'data'
    and fc6/fc7 over 'model' (see parallel.mesh).

    `int8=True` swaps the backbone for the quantized int8 forward
    (models/quantized.py — opt-in, approximate; validate flip rate vs the
    bf16 path on your data before enabling in production).

    `spatial=True` (requires `mesh`) shards the image *height* over the
    'data' axis instead of the batch — spatial parallelism for huge images
    at tiny batch (e.g. one panorama that exceeds a single chip's HBM).
    GSPMD inserts the conv halo exchanges / regathers; outputs are
    identical to the batch-sharded and single-device paths.
    """
    embed = jnp.asarray(embeddings, jnp.float32)
    unseen_vec = jnp.asarray(
        unseen_mask_vector(embed.shape[0], list(unseen_classes)))
    if mesh is not None:
        from zeroshotsemanticsegmentation_tpu.parallel import (
            replicate, shard_params)
        params = shard_params(params, mesh)
        embed = replicate(embed, mesh)
        unseen_vec = replicate(unseen_vec, mesh)

    # batch-sharded meshes shard_map the Pallas kernel over 'data' (GSPMD
    # can't partition a pallas_call body); spatial mode keeps the un-mapped
    # call — its heads are height-sharded, and GSPMD regathers the tiny
    # 1/32-res heads before the kernel
    kernel_mesh = mesh if (mesh is not None and not spatial) else None

    # params/embed stay jit *arguments* (closing over them would inline the
    # full weight tree into the HLO as constants)
    @jax.jit
    def _predict(params, embed, unseen_vec, images):
        from zeroshotsemanticsegmentation_tpu.data.transforms import (
            prepare_images)
        images = prepare_images(images)  # uint8 RGB accepted (compact feed)
        if int8:
            from zeroshotsemanticsegmentation_tpu.models.quantized import (
                quantized_raw_forward)
            f_raw, s_raw = quantized_raw_forward(params, images)
        else:
            f_raw, s_raw = model.apply({"params": params}, images,
                                       mode="raw")
        return infer_labels_szn_fused(
            f_raw, s_raw, embed, unseen_vec,
            (images.shape[1], images.shape[2]), mesh=kernel_mesh)

    def predict(images):
        return _predict(params, embed, unseen_vec, images)

    if mesh is None:
        return predict

    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = (P(None, "data", None, None) if spatial
            else P("data", None, None, None))

    def predict_sharded(images):
        images = jax.device_put(np.asarray(images), NamedSharding(mesh, spec))
        return _predict(params, embed, unseen_vec, images)

    return predict_sharded
