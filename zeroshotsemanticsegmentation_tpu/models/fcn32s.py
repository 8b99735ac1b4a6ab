"""FCN-32s with dual heads — TPU-native Flax implementation.

Capability parity with the reference FCN32s (models.py:27-193): a VGG16
convolutional stack with the classic FCN pad-100/crop-19 geometry, fc6/fc7 as
convolutions with channel dropout, a `score_fr` head into the joint embedding
space (n_class = embed_dim for zero-shot, 21 for the softmax baseline) and a
parallel 2-channel `seenmask_score` head.

TPU-first deviations from the reference design (behavior-preserving):

* NHWC layout and bfloat16-capable compute dtype (params stay fp32).
* The ×32 bilinear upscore ConvTranspose2d — whose weights the reference
  never optimizes (train.py:324-327) — is a *fixed function* here, computed as
  two small dense matmuls (`ops.bilinear`), numerically equal to the
  reference's transposed conv + `[:, :, 19:19+H, 19:19+W]` crop
  (models.py:93-98,145-151).
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

from zeroshotsemanticsegmentation_tpu.ops.bilinear import upsample_bilinear_cropped
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
    """Bare 3x3 conv parameters with nn.Conv's exact shapes and initializers.

    Used by the packed block-1 path so its param tree (conv1_1/conv1_2 with
    HWIO kernel + bias) is bit-compatible with the nn.Conv modules of the
    unpacked path — checkpoints, VGG import, and optimizer label trees see no
    difference.
    """

    features: int
    in_features: int
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, self.in_features, self.features),
                       self.param_dtype)
        b = self.param("bias", nn.initializers.zeros_init(),
                       (self.features,), self.param_dtype)
        return k, b


def _pack_kernel_valid(k: jnp.ndarray) -> jnp.ndarray:
    """(3,3,ci,co) -> (3,2,2ci,2co) for a VALID 3x3 conv over width-paired
    input (packed channel layout [even ci | odd ci] / [even co | odd co]).

    Output pair O holds original outputs o ∈ {2O, 2O+1} whose width windows
    cover input columns {O, O+1}: even-out taps (0,even)(0,odd)(1,even) =
    K[:,0..2]; odd-out taps (0,odd)(1,even)(1,odd) = K[:,0..2].
    """
    z = jnp.zeros_like(k[:, 0])  # (3, ci, co)
    even = jnp.stack([jnp.concatenate([k[:, 0], k[:, 1]], axis=1),
                      jnp.concatenate([k[:, 2], z], axis=1)], axis=1)
    odd = jnp.stack([jnp.concatenate([z, k[:, 0]], axis=1),
                     jnp.concatenate([k[:, 1], k[:, 2]], axis=1)], axis=1)
    return jnp.concatenate([even, odd], axis=-1)


def _pack_kernel_same(k: jnp.ndarray) -> jnp.ndarray:
    """(3,3,ci,co) -> (3,3,2ci,2co) for a SAME 3x3 conv in packed space.

    Even-out o=2O reads {2O-1, 2O, 2O+1} = (O-1,odd),(O,even),(O,odd);
    odd-out o=2O+1 reads (O,even),(O,odd),(O+1,even). Structured zeros keep
    it exact — the MXU cost doubles but lane utilization more than doubles
    (measured on v5e: 3x3x64x64 @ 710² runs at 16% MXU, the packed
    3x3x128x128 @ 710x355 at 44% — 1.39x faster despite 2x FLOPs).
    """
    z = jnp.zeros_like(k[:, 0])
    even = jnp.stack([jnp.concatenate([z, k[:, 0]], axis=1),
                      jnp.concatenate([k[:, 1], k[:, 2]], axis=1),
                      jnp.concatenate([z, z], axis=1)], axis=1)
    odd = jnp.stack([jnp.concatenate([z, z], axis=1),
                     jnp.concatenate([k[:, 0], k[:, 1]], axis=1),
                     jnp.concatenate([k[:, 2], z], axis=1)], axis=1)
    return jnp.concatenate([even, odd], axis=-1)


def _conv_nhwc(x, k, padding):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), padding, dimension_numbers=("NHWC", "HWIO", "NHWC"))


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


def run_blocks_maybe_pruned(mdl, h, packed1: bool,
                            max_blocks: int = NUM_PRUNED_BLOCKS):
    """Run the leading VGG blocks via the support-pruned pad-100 path when
    enabled and statically valid for this geometry (plan_blocks); falls back
    max_blocks -> ... -> plain. Returns (h, next_block_index)."""
    in_h, in_w = h.shape[1], h.shape[2]
    if not (mdl.prune_pad and not packed1 and prunable(in_h, in_w)):
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
        run_pruned = jax.checkpoint(run_pruned, static_argnums=(2, 3))
    return run_pruned(kbs, h, _PAD_CONV1, mdl.dtype), nb


def run_block1_packed(mdl, x: jnp.ndarray) -> jnp.ndarray:
    """Block 1 (pad-100 conv1_1, conv1_2, ceil max-pool) with width pairs
    packed into channels — numerically equal to the unpacked path (same
    multiplies, conv-internal reduction order aside).

    Why: block 1's C=64 fills only half of the 128 VPU/MXU lanes and the
    pad-100 geometry makes it ~1/3 of the forward pass at <20% MXU
    efficiency. Packing two width-neighbors into the channel dim doubles
    lane occupancy; the 2x2 pool then consumes the packed pair, so block 2
    receives the ordinary unpacked (B, ceil(H1/2), W1/2, 64) tensor.
    Requires even input width (pad-100 keeps parity); callers fall back to
    the plain path otherwise.

    Status (v5e, 2026-08): the isolated conv wins 1.39x (16% -> 44% MXU),
    but inside the full jitted forward XLA's own layout/fusion choices
    absorb the gain (51.7 vs 52.8 ms/batch at B=16 512^2) — kept as an
    exactness-tested opt-in (pack_block1=True) for other TPU generations,
    OFF by default.
    """
    c1 = mdl.width(64)
    k1, b1 = _ConvParams(features=c1, in_features=3,
                         param_dtype=mdl.param_dtype, name="conv1_1")()
    k2, b2 = _ConvParams(features=c1, in_features=c1,
                         param_dtype=mdl.param_dtype, name="conv1_2")()
    dt = mdl.dtype
    xp = jnp.pad(x.astype(dt), ((0, 0), (_PAD_CONV1, _PAD_CONV1),
                                (_PAD_CONV1, _PAD_CONV1), (0, 0)))
    b_, hp, wp, _ = xp.shape
    assert wp % 2 == 0, "packed block 1 requires even padded width"
    xpk = xp.reshape(b_, hp, wp // 2, 6)

    h = _conv_nhwc(xpk, _pack_kernel_valid(k1).astype(dt),
                   ((0, 0), (0, 0)))
    h = nn.relu(h + jnp.concatenate([b1, b1]).astype(dt))
    h = _conv_nhwc(h, _pack_kernel_same(k2).astype(dt), ((1, 1), (1, 1)))
    h = nn.relu(h + jnp.concatenate([b2, b2]).astype(dt))

    # 2x2 ceil max-pool in packed space: the width pair is the channel split
    bb, h1, w2, _ = h.shape
    h = jnp.max(h.reshape(bb, h1, w2, 2, c1), axis=3)
    if h1 % 2:  # ceil mode: trailing row forms its own window
        h = jnp.pad(h, ((0, 0), (0, 1), (0, 0), (0, 0)),
                    constant_values=jnp.finfo(dt).min)
        h1 += 1
    return jnp.max(h.reshape(bb, h1 // 2, 2, w2, c1), axis=2)


def _max_pool_ceil(x: jnp.ndarray) -> jnp.ndarray:
    """2×2/2 max-pool with ceil_mode=True (reference models.py:47 etc.).

    Odd spatial dims are right/bottom padded (with -inf, inside nn.max_pool)
    so the trailing row/col forms its own window.
    """
    ph = (-x.shape[1]) % 2
    pw = (-x.shape[2]) % 2
    return nn.max_pool(x, (2, 2), strides=(2, 2),
                       padding=((0, ph), (0, pw)))


class FCN32s(nn.Module):
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
    pack_block1: bool = False  # width-pair lane packing for block 1 (exact)
    prune_pad: bool = True  # support-pruned pad-100 blocks 1-3 (exact)

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

        def conv(h, name, features, kernel, padding):
            return nn.Conv(features, kernel, padding=padding, dtype=self.dtype,
                           param_dtype=self.param_dtype, name=name)(h)

        packed1 = self.pack_block1 and in_w % 2 == 0

        def run_block(mdl, h, bi):
            if bi == 0 and packed1:
                return run_block1_packed(mdl, h)
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

        h, start_block = run_blocks_maybe_pruned(self, x.astype(self.dtype),
                                                 packed1)
        for bi in range(start_block, len(_VGG_BLOCKS)):
            h = run_block(self, h, bi)

        h = nn.relu(conv(h, "fc6", width(4096), (7, 7), "VALID"))
        h = nn.Dropout(self.dropout_rate, broadcast_dims=(1, 2),
                       deterministic=not train)(h)
        h = nn.relu(conv(h, "fc7", width(4096), (1, 1), "VALID"))
        h = nn.Dropout(self.dropout_rate, broadcast_dims=(1, 2),
                       deterministic=not train)(h)

        # Both 1x1 head convs always exist as params (the reference module owns
        # both heads whichever mode runs); only the requested head is upsampled
        # and XLA dead-code-eliminates an unused score conv under jit.
        f_small = conv(h, "score_fr", self.num_classes, (1, 1), "VALID")
        s_small = conv(h, "seenmask_score", 2, (1, 1), "VALID")
        if mode == "raw":
            return f_small, s_small

        def up(s):
            return upsample_bilinear_cropped(
                s.astype(jnp.float32), stride=_UPSAMPLE_STRIDE,
                kernel_size=_UPSAMPLE_KERNEL, crop_offset=_CROP_OFFSET,
                out_h=in_h, out_w=in_w)

        if mode == "fcn":
            return up(f_small)
        if mode == "seenmask":
            return up(s_small)
        return up(f_small), up(s_small)


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
