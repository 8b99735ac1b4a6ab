"""Fixed bilinear ×stride upsampling, TPU-first.

The reference upsamples FCN scores with a ConvTranspose2d(kernel=64, stride=32,
bias=False) whose weights are initialized to a separable bilinear filter
(reference: models.py:11-24, 93-98) and are *never* optimized (reference:
train.py:324-327 skips ConvTranspose weights). A dense transposed conv with a
(C, C, 64, 64) kernel that is diagonal across channels and separable across
space is a pessimal fit for the MXU. Since the op is a fixed linear map, we
express it as two small dense matmuls instead:

    out[b, O, W, c] = sum_h  M_h[O, h] * x[b, h, w, c]   (rows)
    then the same with M_w along the width axis,

where M[o, i] = f[(o + crop) - stride * i] is the (out_len, in_len)
interpolation matrix with the reference's crop offset (19, models.py:147)
folded in. For a 512×512 input M is (512, 17) — both einsums are tiny,
MXU-tileable, and XLA fuses the surrounding elementwise work.

A general transposed-conv path (`bilinear_upsampling_kernel` +
`jax.lax.conv_general_dilated` with lhs_dilation) is kept for tests and for a
hypothetical trainable-upscore variant.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def bilinear_filter_1d(kernel_size: int) -> np.ndarray:
    """1-D bilinear interpolation filter, reference models.py:11-24 semantics."""
    factor = (kernel_size + 1) // 2
    if kernel_size % 2 == 1:
        center = factor - 1.0
    else:
        center = factor - 0.5
    og = np.arange(kernel_size, dtype=np.float64)
    return 1.0 - np.abs(og - center) / factor


def bilinear_upsampling_kernel(channels: int, kernel_size: int,
                               dtype=np.float32) -> np.ndarray:
    """(K, K, C, C) HWIO transposed-conv kernel, diagonal across channels.

    Matches reference get_upsampling_weight (models.py:11-24) with
    in_channels == out_channels (the only case the reference instantiates).
    """
    f = bilinear_filter_1d(kernel_size)
    filt2 = np.outer(f, f)
    w = np.zeros((kernel_size, kernel_size, channels, channels), dtype=dtype)
    idx = np.arange(channels)
    w[:, :, idx, idx] = filt2[:, :, None]
    return w


@functools.lru_cache(maxsize=128)
def upsample_matrix(in_len: int, stride: int, kernel_size: int,
                    crop_offset: int, out_len: int) -> np.ndarray:
    """(out_len, in_len) matrix M with M @ x == conv_transpose(x)[crop:crop+out].

    conv_transpose (zero padding, full output (in_len-1)*stride + kernel_size):
        y[o] = sum_i x[i] * f[o - stride*i]  for 0 <= o - stride*i < K.
    Cropping selects rows [crop_offset : crop_offset + out_len].
    """
    full = (in_len - 1) * stride + kernel_size
    if crop_offset + out_len > full:
        raise ValueError(
            f"crop [{crop_offset}:{crop_offset + out_len}] exceeds transposed-conv "
            f"output length {full} (in_len={in_len}, stride={stride}, K={kernel_size})")
    f = bilinear_filter_1d(kernel_size)
    o = np.arange(out_len, dtype=np.int64)[:, None] + crop_offset
    i = np.arange(in_len, dtype=np.int64)[None, :]
    taps = o - stride * i
    valid = (taps >= 0) & (taps < kernel_size)
    m = np.where(valid, f[np.clip(taps, 0, kernel_size - 1)], 0.0)
    m = m.astype(np.float32)
    m.setflags(write=False)  # cached — must stay immutable
    return m


def upsample_bilinear_cropped(x: jnp.ndarray, *, stride: int, kernel_size: int,
                              crop_offset: int, out_h: int, out_w: int) -> jnp.ndarray:
    """Fixed bilinear ×stride upsample + crop of a (B, h, w, C) feature map.

    Numerically equal to the reference's ConvTranspose2d(K=kernel_size,
    s=stride, bias=False, bilinear init) followed by
    `[:, crop:crop+out_h, crop:crop+out_w, :]` (models.py:93-98, 145-151).
    """
    mh = jnp.asarray(upsample_matrix(x.shape[1], stride, kernel_size, crop_offset, out_h))
    mw = jnp.asarray(upsample_matrix(x.shape[2], stride, kernel_size, crop_offset, out_w))
    # HIGHEST precision: this op must be bit-comparable to the reference's
    # fp32 transposed conv; the matrices are tiny so the cost is negligible.
    y = jnp.einsum("Hh,bhwc->bHwc", mh, x, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    y = jnp.einsum("Ww,bHwc->bHWc", mw, y, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    return y
