"""VALID convolution with a padding-free input gradient (fc6's backward).

XLA differentiates a stride-1 VALID conv's input as a "full" convolution:
the cotangent (B, OH, OW, CO) is zero-padded by k-1 on every side and
convolved with the spatially flipped kernel. At fc6's geometry — 17x17
output from 23x23 input with a 7x7 kernel (reference models.py:84, 512^2
bucket) — the zero border is 83% of the padded area, so the MXU spends
13.5 ms of a 198 ms B=24 train step multiplying zeros (measured via
scripts/profile_forward.py --train; the full-conv FLOP count 2.62 TFLOP /
197 TFLOP/s bf16 predicts exactly the measured time, i.e. XLA runs the
wasteful formulation at near-peak efficiency).

`conv_valid_mmgrad` computes the same input gradient with zero waste:

    dx[b, ih, iw, ci] = sum_{dh, dw, co} g[b, ih-dh, iw-dw, co] k[dh, dw, ci, co]

as ONE dense (B*OH*OW, CO) @ (CO, KH*KW*CI) matmul — exactly the forward
FLOP count, full M/K/N MXU occupancy — followed by a KH*KW-tap static
overlap-add (every (tap, output-position) product lands in some input
position for a VALID conv, so nothing is computed and discarded). The
overlap-add is static-slice adds that XLA fuses into one pass; there are
no per-pixel gathers (house rule, CLAUDE.md).

Weight gradient keeps XLA's standard formulation (it is already at ~full
MXU: no padding enters the weight-grad contraction for VALID convs).

Numerics: the matmul accumulates fp32 on the MXU (like XLA's conv
backward) and rounds to the compute dtype once before the fp32
overlap-add, which rounds once at the end — one extra bf16 rounding of
partial sums vs the fused conv; exact on fp32 (CPU lockstep tests hit
this path with fp32 and agree with torch to reduction order).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _conv_valid(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@jax.custom_vjp
def conv_valid_mmgrad(x, k):
    """`lax.conv` NHWC/HWIO VALID stride-1, custom padding-free input grad.

    x: (B, IH, IW, CI); k: (KH, KW, CI, CO), both already in the compute
    dtype (cast params before calling, as nn.Conv would).
    """
    return _conv_valid(x, k)


def _fwd(x, k):
    return _conv_valid(x, k), (x, k)


def _bwd(res, g):
    x, k = res
    kh, kw, ci, co = k.shape
    b, oh, ow, _ = g.shape
    # weight grad: XLA's standard conv formulation
    _, kvjp = jax.vjp(lambda kk: _conv_valid(x, kk), k)
    (dk,) = kvjp(g)
    # input grad: dense matmul (forward FLOPs exactly) + static overlap-add.
    # Under dot-free policy the matmul runs as the Pallas twin (ops/pdot.py)
    # — an XLA dot would collapse H2D bandwidth on the axon tunnel
    # (CLAUDE.md); on clean TPUs it is a plain XLA dot. Numerics are
    # identical (fp32 MXU accumulation, one cast to x.dtype).
    from zeroshotsemanticsegmentation_tpu.ops.dotpolicy import dot_free
    km = k.transpose(3, 0, 1, 2).reshape(co, kh * kw * ci)
    if dot_free():
        from zeroshotsemanticsegmentation_tpu.ops.pdot import pdot
        col = pdot(g.reshape(b * oh * ow, co), km,
                   out_dtype=jnp.float32).astype(x.dtype)
    else:
        col = jax.lax.dot(g.reshape(b * oh * ow, co), km,
                          preferred_element_type=jnp.float32).astype(x.dtype)
    col = col.reshape(b, oh, ow, kh, kw, ci)
    dx = jnp.zeros((b, oh + kh - 1, ow + kw - 1, ci), jnp.float32)
    for dh in range(kh):
        for dw in range(kw):
            dx = dx.at[:, dh:dh + oh, dw:dw + ow, :].add(
                col[:, :, :, dh, dw, :].astype(jnp.float32))
    return dx.astype(x.dtype), dk


conv_valid_mmgrad.defvjp(_fwd, _bwd)
