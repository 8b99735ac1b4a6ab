"""int8 quantized SZN serving forward (opt-in, approximate).

Serving-only speed path: every conv/matmul of the FCN-32s forward runs as
an int8 x int8 -> int32 MXU op (v5e executes int8 at 2x the bf16 MAC rate;
probed 1.25x end-to-end per conv at 355²x128ch with 1.6% median rel err).
Quantization scheme — the standard symmetric dynamic scheme:

* weights: per-OUTPUT-channel symmetric scales s_w[o] = max|K[..., o]|/127,
  quantized once per call from the fp32 params (elementwise, negligible
  next to the conv itself; XLA CSEs the requantization across reuse);
* activations: per-tensor dynamic scale s_a = max|a|/127 computed on
  device (one reduce per layer), so no calibration pass is needed and
  padded/ring regions are handled uniformly;
* accumulation in int32, dequantize with s_a * s_w[o], bias + relu in fp32.

Rides the support-pruned pad-100 geometry (models/pruned.py) via its
`conv_relu` hook — the ring-constant chain and frame probe stay fp32 (the
zero-input-response argument needs exactness), while every data-path conv
quantizes its (constant-padded) input. The pad-region frame is therefore
the fp response, not the int8 one — a second-order approximation on top of
the scheme's inherent error, acceptable for an opt-in approximate mode.

NOT a training path and NOT default: enable with
`make_szn_predictor(..., int8=True)` after validating the flip rate on
real data (scripts/parity_evidence.py bf16 is the template). Reference has
no quantization story (fp32 only); this is a TPU-native extension.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from zeroshotsemanticsegmentation_tpu.models.fcn32s import (
    _PAD_CONV1, _VGG_BLOCKS, plan_blocks, prunable)
from zeroshotsemanticsegmentation_tpu.models.pruned import (
    NUM_PRUNED_BLOCKS, run_pruned_blocks)


def _qconv(a, k, b, *, padding, relu=True, dtype=jnp.bfloat16):
    """int8 conv with dynamic activation scale + per-channel weight scales.

    Inter-layer activations stay in `dtype` (bf16): fp32 intermediates
    doubled HBM traffic and made the int8 path *slower* end-to-end than
    the bf16 path (94 vs 116 MP/s measured). Quantize/dequantize
    arithmetic in bf16 is exact for the int8 grid (integers <= 127 are
    exact in 8 mantissa bits; the /s_a rounding noise is < the scheme's
    inherent quantization error)."""
    s_w = (jnp.max(jnp.abs(k), axis=(0, 1, 2)) / 127.0).astype(jnp.float32)
    s_w = jnp.where(s_w == 0, 1.0, s_w)
    ki = jnp.round(k / s_w).astype(jnp.int8)
    s_a = (jnp.max(jnp.abs(a)) / 127.0).astype(jnp.float32)
    s_a = jnp.where(s_a == 0, 1.0, s_a)
    ai = jnp.clip(jnp.round(a / s_a.astype(a.dtype)),
                  -127, 127).astype(jnp.int8)
    o = jax.lax.conv_general_dilated(
        ai, ki, (1, 1), padding, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    o = (o.astype(jnp.float32) * (s_a * s_w)
         + b.astype(jnp.float32)).astype(dtype)
    return jax.nn.relu(o) if relu else o


def _kb(params, name):
    return params[name]["kernel"], params[name]["bias"]


def quantized_raw_forward(params, x):
    """int8 forward to the raw (1/32-res) heads: (f_small, s_small).

    `params`: a trained FCN32s param tree (fp32). Geometry identical to
    FCN32s mode='raw' (pad-100, ceil pools, VALID fc6, reference
    models.py:27-158); every conv quantized per _qconv. Support pruning is
    applied when the geometry allows (plan_blocks), like the fp path.
    """
    import flax.linen as nn

    B, H, W, _ = x.shape
    x = x.astype(jnp.float32)

    def qcr(a, k, b):  # pruned-path hook: VALID conv on pre-padded input
        return _qconv(a, k, b, padding=((0, 0), (0, 0)))

    start_block = 0
    h = x
    if prunable(H, W):
        for nb in range(NUM_PRUNED_BLOCKS, 2, -1):
            if plan_blocks(H, W, _PAD_CONV1, nb):
                kbs = [[_kb(params, name) for name, _ in _VGG_BLOCKS[bi]]
                       for bi in range(nb)]
                h = run_pruned_blocks(kbs, h, _PAD_CONV1, jnp.float32,
                                      conv_relu=qcr)
                start_block = nb
                break
    for bi in range(start_block, len(_VGG_BLOCKS)):
        for ci, (name, _) in enumerate(_VGG_BLOCKS[bi]):
            pad = _PAD_CONV1 if (bi == 0 and ci == 0) else 1
            k, b = _kb(params, name)
            h = _qconv(h, k, b, padding=((pad, pad), (pad, pad)))
        h = nn.max_pool(h, (2, 2), strides=(2, 2),
                        padding=((0, (-h.shape[1]) % 2),
                                 (0, (-h.shape[2]) % 2)))

    k, b = _kb(params, "fc6")
    h = _qconv(h, k, b, padding="VALID")
    k, b = _kb(params, "fc7")
    h = _qconv(h, k, b, padding="VALID")
    kf, bf = _kb(params, "score_fr")
    ks, bs = _kb(params, "seenmask_score")
    f_small = _qconv(h, kf, bf, padding="VALID", relu=False)
    s_small = _qconv(h, ks, bs, padding="VALID", relu=False)
    return f_small, s_small
