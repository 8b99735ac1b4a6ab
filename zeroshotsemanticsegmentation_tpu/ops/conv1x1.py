"""1x1 convolution with a Pallas weight gradient (H2D-collapse guard).

XLA canonicalizes a convolution whose output spatial extent is 1x1 into a
`dot_general` mid-pipeline, and compiling-or-loading any executable
containing an XLA dot permanently collapses this platform's host->device
bandwidth (CLAUDE.md). The weight gradient of ANY 1x1 conv is exactly such
a conv — the cotangent is contracted with the input over all B*H*W pixel
positions, leaving a 1x1 spatial output — so every 1x1 layer poisons the
training program even though its forward is clean (bisected 2026-08-18:
scripts/probe_h2d.py `c11_wgrad` collapsed, `c11_igrad`/`c77_wgrad` did
not; 3x3/7x7 weight grads keep a real spatial extent and stay convs).

`conv1x1_mmwgrad` keeps the forward and the input gradient as ordinary XLA
convs (both exempt) and rewrites only the weight gradient:

    dk[ci, co] = sum_n x2d[n, ci] * g2d[n, co],   n over B*H*W pixels

as the Pallas matmul twin (ops/pdot.py, trans_a — the in-kernel
dot_general contracts x's pixel rows natively, no materialized transpose).
Numerics match XLA's conv weight grad: fp32 MXU accumulation with one
rounding to the compute dtype at the end; fp32 inputs are exact to
reduction order (CPU lockstep tests drive this path via interpret mode).

Used by fc7 / score_fr / seenmask_score (models/fcn32s.py) and FCN-8s's
skip scores (models/fcn8s.py) — the reference's nn.Conv2d(..., 1) layers
(reference models.py:86-91,116-120,123-127).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _conv1x1(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv1x1_mmwgrad(x, k):
    """NHWC 1x1 VALID conv; under dot-free policy the weight grad runs as a
    Pallas matmul (see module doc), otherwise XLA's standard autodiff (which
    canonicalizes the wgrad to an MXU dot — the fast form on clean TPUs).

    x: (B, H, W, CI); k: (1, 1, CI, CO), both already in the compute dtype
    (cast params before calling, as nn.Conv would).
    """
    from zeroshotsemanticsegmentation_tpu.ops.dotpolicy import dot_free
    if not dot_free():
        return _conv1x1(x, k)
    return _conv1x1_dotfree(x, k)


@jax.custom_vjp
def _conv1x1_dotfree(x, k):
    return _conv1x1(x, k)


def _fwd(x, k):
    return _conv1x1(x, k), (x, k)


def _bwd(res, g):
    x, k = res
    ci, co = k.shape[2], k.shape[3]
    # input grad: same-extent 1x1 conv with the channel-transposed kernel —
    # output spatial extent H x W, stays a conv in XLA (probed clean)
    dx = _conv1x1(g, k.transpose(0, 1, 3, 2))
    # weight grad: (CI, B*H*W) @ (B*H*W, CO) on the MXU via Pallas
    from zeroshotsemanticsegmentation_tpu.ops.pdot import pdot
    dk = pdot(x.reshape(-1, ci), g.reshape(-1, co), trans_a=True,
              out_dtype=jnp.float32).astype(k.dtype)
    return dx, dk.reshape(k.shape)


_conv1x1_dotfree.defvjp(_fwd, _bwd)
