"""FCN-32s with dual heads — TPU-native Flax implementation.

Capability parity with the reference FCN32s (models.py:27-193): a VGG16
convolutional stack with the classic FCN pad-100/crop-19 geometry, fc6/fc7 as
convolutions with channel dropout, a `score_fr` head into the joint embedding
space (n_class = embed_dim for zero-shot, 21 for the softmax baseline) and a
parallel 2-channel `seenmask_score` head.

TPU-first deviations from the reference design (behavior-preserving):

* NHWC layout and bfloat16-capable compute dtype (params stay fp32).
* The ×32 FCN upscore ConvTranspose2d — whose weights the reference never
  optimizes (train.py:324-327) — is a *fixed function* here, computed as a
  separable tap blend (`ops.bilinear`), numerically equal to the reference's
  transposed conv + `[:, :, 19:19+H, 19:19+W]` crop (models.py:93-98,
  145-151). The SEENMASK upscore, however, is a real trainable parameter
  (`seenmask_upscore`, torch-equivalent HWIO layout): the reference's
  stage-2 optimizer updates it (train.py:168-171 requires_grad, 304-307
  yields it to Adam), so stage-2 checkpoints genuinely drift from bilinear.
  Its forward is the exact ConvTranspose semantic
  (ops.bilinear.upscore_conv_transpose_cropped), bit-compatible with the
  fixed path at the bilinear init.
* Heads are only computed for the requested `mode` ∈ {fcn, seenmask, both};
  the reference computes both unconditionally and discards one
  (models.py:145-158). Under jit XLA would DCE the dead head anyway; being
  explicit keeps the traced program minimal.
* Variable-size images are handled by padding to a static bucket with
  ignore-labels (XLA needs static shapes) rather than per-image shapes; conv
  zero-padding makes interior activations identical either way.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from zeroshotsemanticsegmentation_tpu.ops.bilinear import (
    bilinear_upsampling_kernel, upsample_bilinear_cropped,
    upscore_conv_transpose_cropped)
from zeroshotsemanticsegmentation_tpu.ops.conv1x1 import conv1x1_mmwgrad
from zeroshotsemanticsegmentation_tpu.ops.conv7x7 import conv_valid_mmgrad
from zeroshotsemanticsegmentation_tpu.models.pruned import (
    NUM_PRUNED_BLOCKS, NUM_PRUNED_BLOCKS_SKIP, plan_blocks, prunable,
    run_pruned_blocks)

# FCN-32s geometry constants (reference models.py:43,93-98,147)
_PAD_CONV1 = 100
_UPSAMPLE_STRIDE = 32
_UPSAMPLE_KERNEL = 64
_CROP_OFFSET = 19

# (name, out_channels) per VGG16 conv block; pools after each block
_VGG_BLOCKS = (
    (("conv1_1", 64), ("conv1_2", 64)),
    (("conv2_1", 128), ("conv2_2", 128)),
    (("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256)),
    (("conv4_1", 512), ("conv4_2", 512), ("conv4_3", 512)),
    (("conv5_1", 512), ("conv5_2", 512), ("conv5_3", 512)),
)


class _ConvParams(nn.Module):
    """Bare conv parameters with nn.Conv's exact shapes and initializers.

    Used by the support-pruned path (and fc6's custom-backward conv) so the
    param tree (HWIO kernel + bias) is bit-compatible with the nn.Conv
    modules of the plain path — checkpoints, VGG import, and optimizer
    label trees see no difference.
    """

    features: int
    in_features: int
    param_dtype: Any = jnp.float32
    kernel_size: tuple = (3, 3)
    zero_init: bool = False  # nn.Conv(..., kernel_init=zeros) equivalent

    @nn.compact
    def __call__(self):
        kinit = (nn.initializers.zeros if self.zero_init
                 else nn.initializers.lecun_normal())
        k = self.param("kernel", kinit,
                       self.kernel_size + (self.in_features, self.features),
                       self.param_dtype)
        b = self.param("bias", nn.initializers.zeros_init(),
                       (self.features,), self.param_dtype)
        return k, b


def fc6_conv(mdl, h):
    """fc6: 7x7 VALID conv (reference models.py:84) through the
    padding-free-backward op (ops/conv7x7.py) — the full-conv input grad
    XLA emits for it burns 13.5 ms/step at B=24 multiplying pad zeros.
    Params are bit-compatible with the nn.Conv the plain helper creates."""
    k, bias = _ConvParams(features=mdl.width(4096), in_features=h.shape[-1],
                          kernel_size=(7, 7), param_dtype=mdl.param_dtype,
                          name="fc6")()
    return (conv_valid_mmgrad(h.astype(mdl.dtype), k.astype(mdl.dtype))
            + bias.astype(mdl.dtype))


def _conv_nhwc(x, k, padding):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), padding, dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv1x1(mdl, h, name, features, zero_init=False):
    """1x1 conv (fc7/score heads, reference models.py:88-93,116-127) with
    nn.Conv-identical params and the Pallas weight gradient — XLA's 1x1-conv
    weight grad canonicalizes to a dot mid-pipeline, which collapses H2D
    bandwidth on this platform (ops/conv1x1.py)."""
    k, bias = _ConvParams(features=features, in_features=h.shape[-1],
                          kernel_size=(1, 1), param_dtype=mdl.param_dtype,
                          zero_init=zero_init, name=name)()
    return (conv1x1_mmwgrad(h.astype(mdl.dtype), k.astype(mdl.dtype))
            + bias.astype(mdl.dtype))


def block_params(mdl, num_blocks: int):
    """(kernel, bias) pairs for the first `num_blocks` VGG blocks of `mdl`
    (FCN32s/FCN8s), with nn.Conv-identical param names/shapes — checkpoints,
    VGG import, and optimizer label trees see no difference."""
    kbs, in_f = [], 3
    for bi in range(num_blocks):
        blk = []
        for name, features in _VGG_BLOCKS[bi]:
            f = mdl.width(features)
            blk.append(_ConvParams(features=f, in_features=in_f,
                                   param_dtype=mdl.param_dtype, name=name)())
            in_f = f
        kbs.append(blk)
    return kbs


def run_blocks_maybe_pruned(mdl, h, max_blocks: int = NUM_PRUNED_BLOCKS):
    """Run the leading VGG blocks via the support-pruned pad-100 path when
    enabled and statically valid for this geometry (plan_blocks); falls back
    max_blocks -> ... -> plain. Returns (h, next_block_index)."""
    in_h, in_w = h.shape[1], h.shape[2]
    if not (mdl.prune_pad and prunable(in_h, in_w)):
        return h, 0
    for nb in range(max_blocks, 2, -1):
        if plan_blocks(in_h, in_w, _PAD_CONV1, nb):
            break
    else:
        return h, 0
    kbs = block_params(mdl, nb)
    run_pruned = run_pruned_blocks
    if mdl.remat:
        # recompute the (now-cheap) pruned blocks in backward
        run_pruned = jax.checkpoint(run_pruned, static_argnums=(2, 3, 4))
    return run_pruned(kbs, h, _PAD_CONV1, mdl.dtype,
                      getattr(mdl, "fused_block1", False)), nb


def _max_pool_ceil(x: jnp.ndarray) -> jnp.ndarray:
    """2×2/2 max-pool with ceil_mode=True (reference models.py:47 etc.).

    Odd spatial dims are right/bottom padded (with -inf, inside nn.max_pool)
    so the trailing row/col forms its own window. Stays on nn.max_pool /
    select-and-scatter: three replacement backwards were measured slower
    in-context (scripts/experiments/pool_bwd_pallas.py docstring + PLAN.md shelved findings) because
    the S&S fuses with the surrounding backward while custom formulations
    add unfusable pad/reshape traffic.
    """
    return nn.max_pool(x, (2, 2), strides=(2, 2),
                       padding=((0, (-x.shape[1]) % 2),
                                (0, (-x.shape[2]) % 2)))


class _SeenmaskUpscore(nn.Module):
    """Holder for the trainable seenmask ConvTranspose kernel
    (reference models.py:98 + train.py:168-171,304-307). (64, 64, 2, 2)
    HWIO, torch-equivalent orientation (W_torch[i,o,h,w] == kernel[h,w,i,o]),
    bilinear-diagonal init (models.py:102-112)."""

    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel",
            lambda rng: jnp.asarray(
                bilinear_upsampling_kernel(2, _UPSAMPLE_KERNEL),
                self.param_dtype))


class FCN32s(nn.Module):
    # class capability, not a dataclass field: this arch exposes mode="raw"
    # (pre-upsample 1/32-res heads), which the fused serving kernel consumes
    RAW_HEADS = True
    """VGG16-layout fully-convolutional net with embedding + seenmask heads.

    Attributes:
      num_classes: channels of the fcn head (embed_dim, or class count for the
        cross-entropy baseline).
      dtype: compute dtype for convs (bfloat16 for throughput, float32 for
        strict reference parity). Params are always `param_dtype`.
      dropout_rate: channel dropout after fc6/fc7 (Dropout2d semantics:
        whole channels dropped per sample, reference models.py:86,91).
    """

    num_classes: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    dropout_rate: float = 0.5
    channel_scale: float = 1.0  # <1 shrinks all backbone widths (tests/dryruns)
    remat: bool = False  # rematerialize conv blocks (larger train batches)
    prune_pad: bool = True  # support-pruned pad-100 blocks 1-4 (exact)
    # Pallas fused block-1 kernel pair (ops/block1_fused.py): forward
    # conv1_2+pool (13.55 -> 11.1 ms at B=16 512^2 serving) AND a
    # flash-style recompute backward (train step 204 -> 190 ms at B=24).
    # Default False because interpret-mode Pallas is slow on CPU; the CLI
    # and bench enable it on TPU (cfg.fused_block1="auto").
    fused_block1: bool = False

    def width(self, f: int) -> int:
        return max(8, int(f * self.channel_scale))

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False,
                 mode: str = "both"):
        """mode ∈ {fcn, seenmask, both, raw}; 'raw' returns the pre-upsample
        (1/32-resolution) head outputs for fused inference kernels
        (ops.szn_fused) — upsampling commutes with the class projection."""
        if mode not in ("fcn", "seenmask", "both", "raw"):
            raise ValueError(f"unexpected forward mode: {mode!r}")
        in_h, in_w = x.shape[1], x.shape[2]

        width = self.width

        def run_block(mdl, h, bi):
            for c, (name, features) in enumerate(_VGG_BLOCKS[bi]):
                pad = _PAD_CONV1 if (bi == 0 and c == 0) else 1
                h = nn.relu(
                    nn.Conv(mdl.width(features), (3, 3),
                            padding=((pad, pad), (pad, pad)), dtype=mdl.dtype,
                            param_dtype=mdl.param_dtype, name=name)(h))
            return _max_pool_ceil(h)

        if self.remat:
            # per-block rematerialization: backward recomputes block
            # activations instead of storing them (enables ~2x batch)
            run_block = nn.remat(run_block, static_argnums=(2,))

        h, start_block = run_blocks_maybe_pruned(self, x.astype(self.dtype))
        for bi in range(start_block, len(_VGG_BLOCKS)):
            h = run_block(self, h, bi)

        h = nn.relu(fc6_conv(self, h))
        h = nn.Dropout(self.dropout_rate, broadcast_dims=(1, 2),
                       deterministic=not train)(h)
        h = nn.relu(conv1x1(self, h, "fc7", width(4096)))
        h = nn.Dropout(self.dropout_rate, broadcast_dims=(1, 2),
                       deterministic=not train)(h)

        # Both 1x1 head convs always exist as params (the reference module owns
        # both heads whichever mode runs); only the requested head is upsampled
        # and XLA dead-code-eliminates an unused score conv under jit.
        f_small = conv1x1(self, h, "score_fr", self.num_classes)
        s_small = conv1x1(self, h, "seenmask_score", 2)
        # trainable seenmask upscore (reference train.py:168-171,304-307 —
        # stage 2 optimizes it); torch-equivalent HWIO layout, bilinear init.
        # Created in every mode so the param tree is mode-independent; XLA
        # DCEs it when unused. A child module keeps the tree uniform
        # ({"seenmask_upscore": {"kernel": ...}}).
        up_k = _SeenmaskUpscore(name="seenmask_upscore",
                                param_dtype=self.param_dtype)()
        if mode == "raw":
            return f_small, s_small

        def up(s):
            return upsample_bilinear_cropped(
                s.astype(jnp.float32), stride=_UPSAMPLE_STRIDE,
                kernel_size=_UPSAMPLE_KERNEL, crop_offset=_CROP_OFFSET,
                out_h=in_h, out_w=in_w)

        def up_seen(s):
            return upscore_conv_transpose_cropped(
                s.astype(jnp.float32), up_k.astype(jnp.float32),
                stride=_UPSAMPLE_STRIDE, crop_offset=_CROP_OFFSET,
                out_h=in_h, out_w=in_w)

        if mode == "fcn":
            return up(f_small)
        if mode == "seenmask":
            return up_seen(s_small)
        return up(f_small), up_seen(s_small)


def min_input_size() -> int:
    """Smallest square input the pad-100/crop-19 geometry supports."""
    for size in range(1, 256):
        h = size + 2 * _PAD_CONV1 - 2  # conv1_1: 3x3 with pad 100
        for _ in range(5):
            h = -(-h // 2)  # ceil-mode pool halving (pad-1 convs preserve size)
        fc = h - 6  # fc6: 7x7 VALID
        if fc >= 1:
            up = (fc - 1) * _UPSAMPLE_STRIDE + _UPSAMPLE_KERNEL
            if _CROP_OFFSET + size <= up:
                return size
    raise AssertionError("unreachable")
