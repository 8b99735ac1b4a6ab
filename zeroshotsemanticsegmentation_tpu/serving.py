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


def upscore_trained_numeric(params):
    """Numeric trained-ness of `seenmask_upscore`: True/False when the leaf's
    values can be inspected (drifted-from / equal-to its bilinear init), None
    when they cannot. Host numpy leaves (orbax restores) are checked
    directly. Device leaves are read back ONLY off the axon tunnel (CPU
    tests, clean TPU hosts) — on the tunnel any device->host readback
    permanently collapses H2D bandwidth (CLAUDE.md), so there the answer is
    None and callers must rely on structural knowledge (checkpoint
    metadata's `upscore_trained`, set by stage 2)."""
    up = params.get("seenmask_upscore", {}).get("kernel")
    if up is None:
        return False  # arch without the param (FCN8s): fixed bilinear gate
    if not isinstance(up, np.ndarray):
        from zeroshotsemanticsegmentation_tpu.ops.dotpolicy import (
            axon_tunnel_detected)
        # CPU-backed arrays (the test mesh; any host platform) read back
        # harmlessly even with the tunnel env present — the collapse is a
        # remote-TPU-transport artifact
        on_cpu = all(d.platform == "cpu" for d in getattr(
            up, "devices", lambda: [])()) if hasattr(up, "devices") else False
        if axon_tunnel_detected() and not on_cpu:
            return None
        up = np.asarray(up)
    from zeroshotsemanticsegmentation_tpu.ops.bilinear import (
        bilinear_upsampling_kernel)
    return not np.array_equal(
        up, bilinear_upsampling_kernel(up.shape[2], up.shape[0]))


def make_szn_predictor(model, params, embeddings, unseen_classes,
                       *, mesh=None, spatial=False, int8=False,
                       upscore_trained=None):
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

    `upscore_trained` (tri-state): the fused kernel upsamples the seenmask
    GATE with fixed bilinear taps — exact only while `seenmask_upscore`
    equals its bilinear init. The reference's stage 2 TRAINS that kernel
    (train.py:304-307), so stage-2-trained checkpoints must route the gate
    through the model's own ConvTranspose instead (a (B,H,W,2) side
    computation; the class projection/upsample/argmax stays in the Pallas
    kernel). Pass True for stage-2-trained params, False for fresh/stage-1
    params (checkpoint metadata carries this: train.checkpoint
    `upscore_trained`). Default None auto-detects from the kernel's values
    (upscore_trained_numeric); on the axon tunnel a DEVICE-resident tree
    cannot be inspected (readbacks collapse H2D bandwidth, CLAUDE.md) and
    None raises rather than risk silently wrong labels — pass the flag.
    """
    # resolved BEFORE any device placement below — restored checkpoints are
    # host numpy here, so the numeric cross-check still sees real values
    numeric = upscore_trained_numeric(params)
    if upscore_trained is None:
        if numeric is None:
            raise ValueError(
                "make_szn_predictor: params are device-resident and this "
                "platform's H2D collapse forbids reading them back, so "
                "`seenmask_upscore` trained-ness cannot be auto-detected. "
                "Pass upscore_trained=True for stage-2-trained params or "
                "False for fresh/stage-1 params (checkpoint metadata "
                "'upscore_trained' records this).")
        upscore_trained = numeric
    elif (numeric is not None and numeric
          and not upscore_trained):  # explicit False contradicted by values
        raise ValueError(
            "make_szn_predictor: upscore_trained=False but the "
            "`seenmask_upscore` kernel differs from its bilinear init — the "
            "fused bilinear-gate shortcut would produce wrong labels. Pass "
            "upscore_trained=True (or None to auto-detect).")
    pristine_upscore = not upscore_trained

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

    # archs without pre-upsample heads (FCN8s: the fcn head fuses pool3/4
    # skips at multiple resolutions) can't feed the fused kernel — serve
    # them through the unfused full-resolution NNE pipeline instead
    raw_heads = getattr(model, "RAW_HEADS", True)
    if int8 and not raw_heads:
        raise ValueError(
            "int8 serving implements only the raw-heads (FCN32s) forward "
            "(models/quantized.py); it is unavailable for this architecture")

    # params/embed stay jit *arguments* (closing over them would inline the
    # full weight tree into the HLO as constants)
    @jax.jit
    def _predict(params, embed, unseen_vec, images):
        from zeroshotsemanticsegmentation_tpu.data.transforms import (
            prepare_images)
        images = prepare_images(images)  # uint8 RGB accepted (compact feed)
        if not raw_heads:
            from zeroshotsemanticsegmentation_tpu.ops.nne import (
                infer_labels_szn)
            f_full, s_full = model.apply({"params": params}, images,
                                         mode="both")
            return infer_labels_szn(f_full.astype(jnp.float32),
                                    s_full.astype(jnp.float32),
                                    embed, unseen_vec)
        if int8:
            from zeroshotsemanticsegmentation_tpu.models.quantized import (
                quantized_raw_forward)
            f_raw, s_raw = quantized_raw_forward(params, images)
        else:
            f_raw, s_raw = model.apply({"params": params}, images,
                                       mode="raw")
        out_hw = (images.shape[1], images.shape[2])
        if pristine_upscore:
            return infer_labels_szn_fused(f_raw, s_raw, embed, unseen_vec,
                                          out_hw, mesh=kernel_mesh)
        # trained upscore: exact gate at full res through the model's own
        # ConvTranspose kernel; classes still take the fused kernel (the
        # always-seen / always-unseen calls restrict the argmax partition)
        from zeroshotsemanticsegmentation_tpu.ops.bilinear import (
            upscore_conv_transpose_cropped)
        gate = upscore_conv_transpose_cropped(
            s_raw.astype(jnp.float32),
            params["seenmask_upscore"]["kernel"].astype(jnp.float32),
            stride=32, crop_offset=19, out_h=out_hw[0], out_w=out_hw[1])
        pixel_unseen = jnp.argmax(gate, axis=-1) == 0
        seen_lbl = infer_labels_szn_fused(
            f_raw, jnp.zeros_like(s_raw).at[..., 1].set(1.0), embed,
            unseen_vec, out_hw, mesh=kernel_mesh)
        unseen_lbl = infer_labels_szn_fused(
            f_raw, jnp.zeros_like(s_raw).at[..., 0].set(1.0), embed,
            unseen_vec, out_hw, mesh=kernel_mesh)
        return jnp.where(pixel_unseen, unseen_lbl, seen_lbl)

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
