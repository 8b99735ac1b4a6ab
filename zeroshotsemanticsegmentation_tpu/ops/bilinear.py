"""Fixed bilinear ×stride upsampling, TPU-first and dot-free.

The reference upsamples FCN scores with a ConvTranspose2d(kernel=64, stride=32,
bias=False) whose weights are initialized to a separable bilinear filter
(reference: models.py:11-24, 93-98) and are *never* optimized (reference:
train.py:324-327 skips ConvTranspose weights). A dense transposed conv with a
(C, C, 64, 64) kernel that is diagonal across channels and separable across
space is a pessimal fit for the MXU. The op is a fixed separable linear map

    out[b, O, W, c] = sum_h  M_h[O, h] * x[b, h, w, c]   (rows, then cols)

where M[o, i] = f[(o + crop) - stride * i] is the (out_len, in_len)
interpolation matrix with the reference's crop offset (19, models.py:147)
folded in — but each M row has at most ceil(K/stride) (= 2 for every
reference geometry, K = 2·stride) nonzero taps, so instead of a matmul we
evaluate the interpolation directly as a per-tap weighted blend:

    y[o] = sum_t  w_t[o] * x[i0(o) + t],   i0(o) = floor((o + a) / stride)

with host-precomputed weight LUTs. The staircase index i0(o)+t is realized
gather-free as pad → ×stride repeat (broadcast+reshape) → static slice, so
the whole op is elementwise + reduce: XLA fuses it into one pass whose HBM
traffic is the output write, its autodiff transpose (pad/slice/reshape-sum)
is equally cheap, and — load-bearing on this platform — no `dot` ever enters
the program (any XLA dot permanently collapses host->device bandwidth here;
see CLAUDE.md and scripts/probe_h2d.py). Numerically bit-identical to the
interpolation-matrix einsum at fp32: the matmul's extra terms are exact
zeros, and adding 0.0 never rounds.

`upscore_conv_transpose_cropped` handles the TRAINED upscore (the reference's
stage 2 optimizes `seenmask_upscore`, train.py:304-307): an arbitrary dense
(K, K, Cin, Cout) kernel, realized for K = 2·stride as one phase matmul +
depth-to-space (`_phase_conv_transpose_cropped` — the naive lhs-dilated conv
lowers at ~2/128 MXU lanes for Cin=Cout=2 and measured 343 ms per B=24
stage-2 step on v5e; the phase form measures ~1 ms in the same step).
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


@functools.lru_cache(maxsize=128)
def _axis_upsample_plan(in_len: int, stride: int, kernel_size: int,
                        crop_offset: int, out_len: int):
    """Host-side tap plan: (pad_left, pad_right, [(slice_start, weights)]).

    Tap t of output o reads padded-input index i0(o) + t + pad_left with
    i0(o) = floor((o + a)/stride), a = crop_offset - kernel_size + stride;
    after a ×stride repeat of the padded input that staircase is the static
    slice [a + stride·(t + pad_left) :][:out_len]. Weights are the same
    entries `upsample_matrix` would place (zero where the tap falls outside
    the filter or the input), so the blend equals the matrix product exactly.
    """
    full = (in_len - 1) * stride + kernel_size
    if crop_offset + out_len > full:
        raise ValueError(
            f"crop [{crop_offset}:{crop_offset + out_len}] exceeds transposed-conv "
            f"output length {full} (in_len={in_len}, stride={stride}, K={kernel_size})")
    f = bilinear_filter_1d(kernel_size)
    taps = -(-kernel_size // stride)
    a = crop_offset - kernel_size + stride
    pad_l = max(0, -((a) // stride))  # ceil(-a/s): keeps every slice start >= 0
    o = np.arange(out_len, dtype=np.int64)
    i0 = (o + a) // stride
    plan = []
    for t in range(taps):
        it = i0 + t
        tap = o + crop_offset - stride * it
        w = np.where((tap >= 0) & (tap < kernel_size) & (it >= 0) & (it < in_len),
                     f[np.clip(tap, 0, kernel_size - 1)], 0.0).astype(np.float32)
        w.setflags(write=False)
        plan.append((int(a + stride * (t + pad_l)), w))
    need = plan[-1][0] + out_len
    pad_r = max(0, -(-(need - stride * (in_len + pad_l)) // stride))
    return pad_l, pad_r, tuple(plan)


def _axis_upsample(x: jnp.ndarray, axis: int, *, stride: int,
                   kernel_size: int, crop_offset: int, out_len: int) -> jnp.ndarray:
    """Bilinear ×stride upsample + crop along one axis, fp32, gather-free.

    Two lowerings, selected by ops.dotpolicy (bit-identical at fp32 — the
    matrix rows' extra terms are exact zeros and adding 0.0 never rounds):
    the interpolation-matrix contraction (MXU form, clean TPUs) or the
    pad→repeat→slice tap blend (dot-free form, axon tunnel).
    """
    from zeroshotsemanticsegmentation_tpu.ops.dotpolicy import dot_free
    if not dot_free():
        m = jnp.asarray(upsample_matrix(x.shape[axis], stride, kernel_size,
                                        crop_offset, out_len))  # (out, in)
        y = jnp.tensordot(x.astype(jnp.float32), m, axes=[[axis], [1]],
                          precision=jax.lax.Precision.HIGHEST)
        return jnp.moveaxis(y, -1, axis)
    pad_l, pad_r, plan = _axis_upsample_plan(
        x.shape[axis], stride, kernel_size, crop_offset, out_len)
    pads = [(0, 0, 0)] * x.ndim
    pads[axis] = (pad_l, pad_r, 0)
    xp = jax.lax.pad(x.astype(jnp.float32), jnp.float32(0), pads)
    rep = jnp.repeat(xp, stride, axis=axis)  # broadcast+reshape, not a gather
    wshape = [1] * x.ndim
    wshape[axis] = out_len
    y = None
    for start, w in plan:
        sel = jax.lax.slice_in_dim(rep, start, start + out_len, axis=axis)
        term = jnp.asarray(w).reshape(wshape) * sel
        y = term if y is None else y + term
    return y


def upsample_bilinear_cropped(x: jnp.ndarray, *, stride: int, kernel_size: int,
                              crop_offset: int, out_h: int, out_w: int) -> jnp.ndarray:
    """Fixed bilinear ×stride upsample + crop of a (B, h, w, C) feature map.

    Numerically equal to the reference's ConvTranspose2d(K=kernel_size,
    s=stride, bias=False, bilinear init) followed by
    `[:, crop:crop+out_h, crop:crop+out_w, :]` (models.py:93-98, 145-151),
    and bit-identical to the fp32 interpolation-matrix form (see module doc).
    """
    y = _axis_upsample(x, 1, stride=stride, kernel_size=kernel_size,
                       crop_offset=crop_offset, out_len=out_h)
    return _axis_upsample(y, 2, stride=stride, kernel_size=kernel_size,
                          crop_offset=crop_offset, out_len=out_w)


def _phase_conv_transpose_cropped(x: jnp.ndarray, kernel: jnp.ndarray, *,
                                  stride: int, crop_offset: int,
                                  out_h: int, out_w: int) -> jnp.ndarray:
    """Exact K=2·stride ConvTranspose + crop as ONE phase matmul.

    With K = 2s each output pixel receives exactly 2×2 input taps:

        y[s·m+i, s·n+j, co] = Σ_{a,b∈{0,1}} Σ_ci x[m−a, n−b, ci]
                                            · K[i+s·a, j+s·b, ci, co]

    so the whole op is (4 shifted copies of x) @ (4·Cin, s²·Cout) kernel
    matrix, then depth-to-space. Same arithmetic terms per output pixel as
    the transposed conv (order within the 4·Cin-term fp32 sum may differ),
    but MXU/fusion-shaped: the naive lhs-dilated-conv lowering runs the
    64×64 kernel over the ×32-dilated input at Cin=Cout=2 — ~2/128 MXU
    lanes — and measured 343 ms per B=24 stage-2 step on v5e where this
    form measures ~1 ms (the stage-2 step's other ~22 ms is the backbone
    forward). Only the cropped block range is computed. Contraction goes
    through dotless.proj_rows, so the dot-free policy (axon tunnel) holds.
    """
    B, h, w, cin = x.shape
    s = stride
    cout = kernel.shape[-1]
    full_h, full_w = (h - 1) * s + 2 * s, (w - 1) * s + 2 * s
    if crop_offset + out_h > full_h or crop_offset + out_w > full_w:
        raise ValueError(
            f"crop [{crop_offset}:+{out_h}x{out_w}] exceeds transposed-conv "
            f"output {full_h}x{full_w} (in {h}x{w}, stride {s}, K {2 * s})")
    from zeroshotsemanticsegmentation_tpu.ops.dotless import proj_rows
    # block (phase-group) range actually needed by the crop
    mlo_h, mhi_h = crop_offset // s, (crop_offset + out_h - 1) // s
    mlo_w, mhi_w = crop_offset // s, (crop_offset + out_w - 1) // s
    nbh, nbw = mhi_h - mlo_h + 1, mhi_w - mlo_w + 1
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (1, 1), (1, 1), (0, 0)))
    # block m reads x[m−a] = xp[m+1−a]; channel order (a, b, ci) must match
    # the kernel-matrix flattening below
    xs = jnp.concatenate([
        xp[:, mlo_h + 1:mhi_h + 2, mlo_w + 1:mhi_w + 2],   # (a,b)=(0,0)
        xp[:, mlo_h + 1:mhi_h + 2, mlo_w:mhi_w + 1],       # (0,1)
        xp[:, mlo_h:mhi_h + 1, mlo_w + 1:mhi_w + 2],       # (1,0)
        xp[:, mlo_h:mhi_h + 1, mlo_w:mhi_w + 1],           # (1,1)
    ], axis=-1)                                            # (B,nbh,nbw,4cin)
    # W[(a,b,ci), (i,j,co)] = K[i+s·a, j+s·b, ci, co]
    wmat = kernel.astype(jnp.float32).reshape(2, s, 2, s, cin, cout)
    wmat = wmat.transpose(0, 2, 4, 1, 3, 5).reshape(4 * cin, s * s * cout)
    y = proj_rows(xs, wmat.T)                              # (B,nbh,nbw,s²·co)
    y = y.reshape(B, nbh, nbw, s, s, cout)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(B, nbh * s, nbw * s, cout)
    oh, ow = crop_offset - s * mlo_h, crop_offset - s * mlo_w
    return y[:, oh:oh + out_h, ow:ow + out_w, :]


def upscore_conv_transpose_cropped(x: jnp.ndarray, kernel: jnp.ndarray, *,
                                   stride: int, crop_offset: int,
                                   out_h: int, out_w: int) -> jnp.ndarray:
    """General TRAINED-upscore upsample: transposed conv with an arbitrary
    (K, K, Cin, Cout) kernel + the reference crop.

    The reference's stage-2 optimizer updates `seenmask_upscore` away from
    its bilinear init (train.py:168-171 sets requires_grad, 304-307 yields
    it to Adam) — only the FCN upscore stays a fixed function (324-327).
    This is the exact ConvTranspose2d semantic (zero padding, full output
    (in-1)*stride + K) for that trained kernel. Equal to
    `upsample_bilinear_cropped` when `kernel` equals
    `bilinear_upsampling_kernel` (tested). Differentiable in both x and
    kernel. Every reference geometry has K = 2·stride and takes the phase
    matmul fast path; other shapes fall back to a lhs-dilated conv.
    """
    kh, kw = kernel.shape[0], kernel.shape[1]
    if kh == kw == 2 * stride:
        return _phase_conv_transpose_cropped(
            x, kernel, stride=stride, crop_offset=crop_offset,
            out_h=out_h, out_w=out_w)
    # ConvTranspose = correlation of the s-dilated input with the kernel
    # spatially FLIPPED (invisible for the symmetric bilinear init, load-
    # bearing for a trained kernel — validated against torch
    # F.conv_transpose2d in tests)
    y = jax.lax.conv_general_dilated(
        x, kernel[::-1, ::-1], window_strides=(1, 1),
        padding=((kh - 1, kh - 1), (kw - 1, kw - 1)),
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)
    return y[:, crop_offset:crop_offset + out_h,
             crop_offset:crop_offset + out_w, :]
