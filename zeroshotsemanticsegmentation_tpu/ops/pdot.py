"""Tiled Pallas matmul — the MXU twin for XLA `dot` on this platform.

Compiling-or-loading ANY XLA executable containing a `dot`/`dot_general`
permanently collapses host->device bandwidth here (~1.5 GB/s -> ~15-40 MB/s;
bisected in scripts/probe_h2d.py — convs and Pallas kernels are exempt, and
a Pallas kernel whose *body* is a matmul was explicitly probed clean). Small
contractions in the hot programs are rewritten as fused multiply-reduce
(ops/dotless.py); this module covers the genuinely MXU-bound ones — today
fc6's input gradient (ops/conv7x7.py), a (B·17², 4096) @ (4096, 7·7·512)
bf16 matmul of ~1.4 TFLOP per B=24 train step.

Classic blocked schedule: grid (M/bm, N/bn, K/bk) with K innermost, fp32
VMEM accumulator, one cast to the output dtype at the last K step. Inputs
are zero-padded to block multiples (zero rows/cols contribute exact zeros).
Defaults favor large blocks (bm=1024, bn=1024, bk=512 ≈ 8 MB VMEM with
double-buffered operands) to minimize operand re-reads: total HBM traffic is
nn·|A| + nm·|B| + |out|.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _rup(x: int, m: int) -> int:
    return -(-x // m) * m


def _block_dot(a, b, precision, trans_a):
    # native MXU contraction over a's rows when trans_a (no transpose op:
    # dot_general dimension numbers express it directly)
    contract = (((0,) if trans_a else (1,)), (0,))
    return jax.lax.dot_general(a, b, (contract, ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=precision)


def _kernel_accum_out(a_ref, b_ref, o_ref, *, nk: int, precision,
                      trans_a: bool):
    """fp32 output: accumulate straight into the resident out block (its
    index map ignores k, so Pallas keeps it in VMEM across the K loop) —
    no separate accumulator, halving the block footprint."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        o_ref[...] = jnp.zeros_like(o_ref)

    o_ref[...] += _block_dot(a_ref[...], b_ref[...], precision, trans_a)


def _kernel_scratch(a_ref, b_ref, o_ref, acc_ref, *, nk: int, precision,
                    trans_a: bool):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += _block_dot(a_ref[...], b_ref[...], precision, trans_a)

    @pl.when(k == nk - 1)
    def _emit():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "out_dtype", "bm", "bn", "bk", "highest", "interpret", "trans_a"))
def pdot(a: jnp.ndarray, b: jnp.ndarray, *, out_dtype=None,
         bm: int | None = None, bn: int | None = None, bk: int | None = None,
         highest: bool = False, interpret: bool | None = None,
         trans_a: bool = False) -> jnp.ndarray:
    """(M, K) @ (K, N) -> (M, N) with fp32 accumulation, as a Pallas kernel.

    `trans_a=True` takes `a` as (K, M) and computes aᵀ @ b without
    materializing the transpose (the in-kernel dot_general contracts a's
    rows natively) — the shape class of conv weight gradients.

    `highest=True` requests full-fp32 multiplies (multi-pass MXU), matching
    `precision=HIGHEST` XLA dots on parity-critical fp32 paths; default is
    the native pass for the input dtype (bf16 in, fp32 accumulate — the same
    numerics as XLA's default conv/dot lowering).
    """
    if a.ndim != 2 or b.ndim != 2:
        raise ValueError(f"pdot shapes {a.shape} @ {b.shape}")
    m, k = (a.shape[1], a.shape[0]) if trans_a else a.shape
    if k != b.shape[0]:
        raise ValueError(f"pdot shapes {a.shape} @ {b.shape} "
                         f"(trans_a={trans_a})")
    _, n = b.shape
    out_dtype = out_dtype or jnp.promote_types(a.dtype, b.dtype)
    interpret = _interpret_default() if interpret is None else interpret

    bm = bm or min(1024, _rup(m, 8 if not trans_a else 128))
    bn = bn or min(512, _rup(n, 128))
    bk = bk or min(512, _rup(k, 128 if not trans_a else 8))
    mp, kp, np_ = _rup(m, bm), _rup(k, bk), _rup(n, bn)
    a_pads = (((0, kp - k), (0, mp - m)) if trans_a
              else ((0, mp - m), (0, kp - k)))
    ap = a if all(p == (0, 0) for p in a_pads) else jnp.pad(a, a_pads)
    bp = jnp.pad(b, ((0, kp - k), (0, np_ - n))) if (kp, np_) != (k, n) else b
    nk = kp // bk

    a_spec = (pl.BlockSpec((bk, bm), lambda i, j, kk: (kk, i),
                           memory_space=pltpu.VMEM) if trans_a
              else pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                                memory_space=pltpu.VMEM))
    accum_out = jnp.dtype(out_dtype) == jnp.float32
    kern = _kernel_accum_out if accum_out else _kernel_scratch
    precision = jax.lax.Precision.HIGHEST if highest else None
    out = pl.pallas_call(
        functools.partial(kern, nk=nk, precision=precision,
                          trans_a=trans_a),
        grid=(mp // bm, np_ // bn, nk),
        in_specs=[
            a_spec,
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=([] if accum_out
                        else [pltpu.VMEM((bm, bn), jnp.float32)]),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * kp * np_,
            bytes_accessed=(mp * kp * ap.dtype.itemsize * (np_ // bn)
                            + kp * np_ * bp.dtype.itemsize * (mp // bm)
                            + mp * np_ * jnp.dtype(out_dtype).itemsize),
            transcendentals=0),
        interpret=interpret,
    )(ap, bp)
    return out[:m, :n]
