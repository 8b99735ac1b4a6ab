"""FCN-8s: skip-connection fusion variant (framework extension).

The reference implements only FCN-32s (models.py:27 — its coarse ×32
upsampling); FCN-8s is the classic finer-grained variant from the same paper
lineage (Long et al., FCN; BASELINE.json lists it among this framework's
target configs). Architecture:

    fc7 → score_fr → ×2 bilinear ┐
    pool4 → 1×1 score (zero-init) ┼ crop(5) + add → ×2 bilinear ┐
    pool3 → 1×1 score (zero-init) ┴──────────────── crop(9) + add → ×8
    bilinear → crop(31) to input size

All bilinear upsamples are fixed interpolation matrices (matmul form, like
FCN-32s' FCN upscore — the reference never trains its stage-1
transposed-conv weights, train.py:324-327). Skip scores are zero-initialized
so a fresh FCN-8s starts exactly equal to FCN-32s' prediction path (standard
FCN surgery practice).

The 2-channel seenmask head keeps the coarse ×32 path with a FIXED upsample
— the binary seen/unseen gate does not benefit from edge-accurate
upsampling. Note this is a deliberate simplification of this extension
architecture only: the reference's FCN-32s (and our FCN32s) additionally
train `seenmask_upscore` in stage 2 (train.py:304-307); FCN-8s is not part
of the reference, so no parity constraint applies.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from zeroshotsemanticsegmentation_tpu.models.fcn32s import (
    _PAD_CONV1, _VGG_BLOCKS, _max_pool_ceil, conv1x1, fc6_conv,
    run_blocks_maybe_pruned)
from zeroshotsemanticsegmentation_tpu.models.pruned import (
    NUM_PRUNED_BLOCKS_SKIP)
from zeroshotsemanticsegmentation_tpu.ops.bilinear import (
    upsample_bilinear_cropped)

_CROP_POOL4 = 5
_CROP_POOL3 = 9
_CROP_FINAL = 31


class FCN8s(nn.Module):
    # no mode="raw": the fcn head needs pool3/pool4 skip fusion at multiple
    # resolutions, so there is no single pre-upsample head pair to hand to
    # the fused serving kernel — serving uses the unfused full-res route
    RAW_HEADS = False

    num_classes: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    dropout_rate: float = 0.5
    channel_scale: float = 1.0
    remat: bool = False  # rematerialize conv blocks (larger train batches)
    prune_pad: bool = True  # support-pruned pad-100 blocks 1-3 (exact)
    fused_block1: bool = False  # Pallas block-1 kernel pair (fwd + bwd)

    def width(self, f: int) -> int:
        return max(8, int(f * self.channel_scale))

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False,
                 mode: str = "both"):
        if mode not in ("fcn", "seenmask", "both"):
            raise ValueError(f"unexpected forward mode: {mode!r}")
        in_h, in_w = x.shape[1], x.shape[2]
        width = self.width

        def run_block(mdl, h, bi):
            for c, (name, features) in enumerate(_VGG_BLOCKS[bi]):
                pad = _PAD_CONV1 if (bi == 0 and c == 0) else 1
                h = nn.relu(
                    nn.Conv(max(8, int(features * mdl.channel_scale)), (3, 3),
                            padding=((pad, pad), (pad, pad)), dtype=mdl.dtype,
                            param_dtype=mdl.param_dtype, name=name)(h))
            return _max_pool_ceil(h)

        if self.remat:
            run_block = nn.remat(run_block, static_argnums=(2,))

        pools = {}
        # max 3 pruned blocks: the skip connection taps the full pool3 array,
        # which is exactly what the 3-block runner materializes
        h, start_block = run_blocks_maybe_pruned(
            self, x.astype(self.dtype), max_blocks=NUM_PRUNED_BLOCKS_SKIP)
        if start_block:
            pools[start_block - 1] = h
        for bi in range(start_block, len(_VGG_BLOCKS)):
            h = run_block(self, h, bi)
            pools[bi] = h
        pool3, pool4 = pools[2], pools[3]

        h = nn.relu(fc6_conv(self, h))
        h = nn.Dropout(self.dropout_rate, broadcast_dims=(1, 2),
                       deterministic=not train)(h)
        h = nn.relu(conv1x1(self, h, "fc7", width(4096)))
        h = nn.Dropout(self.dropout_rate, broadcast_dims=(1, 2),
                       deterministic=not train)(h)

        # all head params exist regardless of mode (unused ones are DCE'd)
        f = conv1x1(self, h, "score_fr", self.num_classes)
        s_small = conv1x1(self, h, "seenmask_score", 2)
        p4 = conv1x1(self, pool4, "score_pool4", self.num_classes,
                     zero_init=True).astype(jnp.float32)
        p3 = conv1x1(self, pool3, "score_pool3", self.num_classes,
                     zero_init=True).astype(jnp.float32)

        def up_full(t, stride, kernel):
            # uncropped transposed-conv output length (in-1)*s + K
            oh = (t.shape[1] - 1) * stride + kernel
            ow = (t.shape[2] - 1) * stride + kernel
            return upsample_bilinear_cropped(
                t.astype(jnp.float32), stride=stride, kernel_size=kernel,
                crop_offset=0, out_h=oh, out_w=ow)

        def fcn_head():
            u2 = up_full(f, 2, 4)
            p4c = p4[:, _CROP_POOL4:_CROP_POOL4 + u2.shape[1],
                     _CROP_POOL4:_CROP_POOL4 + u2.shape[2], :]
            fuse4 = u2 + p4c
            u4 = up_full(fuse4, 2, 4)
            p3c = p3[:, _CROP_POOL3:_CROP_POOL3 + u4.shape[1],
                     _CROP_POOL3:_CROP_POOL3 + u4.shape[2], :]
            fuse3 = u4 + p3c
            return upsample_bilinear_cropped(
                fuse3, stride=8, kernel_size=16, crop_offset=_CROP_FINAL,
                out_h=in_h, out_w=in_w)

        def seenmask_head():
            # coarse x32 path, same as FCN32s (models/fcn32s.py)
            return upsample_bilinear_cropped(
                s_small.astype(jnp.float32), stride=32, kernel_size=64,
                crop_offset=19, out_h=in_h, out_w=in_w)

        if mode == "fcn":
            return fcn_head()
        if mode == "seenmask":
            return seenmask_head()
        return fcn_head(), seenmask_head()
