"""Pallas kernel for VGG block 1's hot half: conv1_2 (64->64) + 2x2 pool.

Why a hand kernel: conv1_2 is the least MXU-friendly op in the FCN stack —
C=64 half-fills the 128 lanes and XLA runs it at ~14% MXU on v5e (11.4 ms
of a 36.4 ms B=16 forward, measured in isolation). This implementation
packs BOTH spatial parities into the lane dimension:

* conv1_1 emits the packed layout *directly*: a stride-(1,2) XLA conv with
  a (3,4,3,128) kernel whose output lane is (column parity, channel) — no
  relayout ever happens in HBM.
* the Pallas kernel computes conv1_2 with output lanes = (row parity,
  channel): each of 16 (2 col-parities x 8) taps is a dense
  (M,128)@(128,128) matmul — full K/N occupancy, 56% of issued MACs real
  (structured zeros cover the parity cross-terms) vs XLA's ~14%.
* even and odd output columns are separate accumulations, so the 2x2
  max-pool is literally two maxes (column parities, then row-parity lane
  halves). The full-resolution conv1_2 output (546 MB at B=16 512^2)
  never exists, in HBM or VMEM.
* the conv1_1 input is pre-padded so the packed pair count is already
  DMA-aligned (multiple of 8) and the pool rows tile evenly — the padding
  lands in the image's zero-pad region, so the extra values are unused.
* HBM->VMEM tiles are double-buffered: tile t+1 streams in while t
  computes.

No ring constants are needed here: block 1's zero-input response has rim 0
(conv1_1's big pad is part of the virtual conv), so the support-pruned
block-1 segment is exactly plain VALID convs on a zero-padded input
(see models/pruned.py). `fused_block1_supported` gates the geometries this
grid handles; callers fall back to the XLA path otherwise.

`block1_op` wraps the pair in jax.custom_vjp whose backward recomputes
through the XLA reference implementation, so the op stays differentiable
(training keeps the plain path by default — the recompute would cancel the
forward win there).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 12 * 1024 * 1024


_Q_CHUNK = 64  # output columns per inner chunk (bounds live VMEM values)


def _tile_bytes(tp: int, pairs_p: int, itemsize: int = 2) -> int:
    q = pairs_p - 5
    qc = min(_Q_CHUNK, q)
    return (2 * (2 * tp + 2) * pairs_p * 128 * itemsize  # dbl-buffered c11
            + 8 * tp * qc * 128 * itemsize               # 8 lhs operands
            + 2 * tp * qc * 128 * 4                      # parity accs (fp32)
            + 2 * tp * q * 64 * itemsize)                # dbl-buffered out


def _plan_tiles(ph: int, pairs_p: int, itemsize: int = 2):
    """(tp, ph_padded): biggest fitting row tile (fewest, best-hidden DMAs
    and large matmul M); row padding is cheap — it extends the zero-pad
    region and is sliced off."""
    for tp in range(40, 3, -1):
        if _tile_bytes(tp, pairs_p, itemsize) <= _VMEM_BUDGET:
            return tp, ph + (-ph) % tp
    return None


def fused_block1_supported(hp: int, wp: int, channels: int = 64,
                           dtype=jnp.bfloat16) -> bool:
    """xp is (B, hp, wp, 3); conv outputs (hp-4, wp-4) must pool evenly."""
    ch, cw = hp - 4, wp - 4
    if channels != 64 or ch <= 0 or cw <= 0 or ch % 2 or cw % 2:
        return False
    pairs_p = -(-((cw + 2) // 2 + 4) // 8) * 8
    return _plan_tiles(ch // 2, pairs_p, jnp.dtype(dtype).itemsize) is not None


def _pack_k1_pairs(k1):
    """(3,3,3,co) -> (3,4,3,2*co): stride-(1,2) conv kernel emitting
    [even col out | odd col out] lanes (out col pair Q reads in cols
    2Q + e + dw, a 4-wide window)."""
    z = jnp.zeros_like(k1[:, 0])                    # (3, 3, co)
    cols = []
    for j in range(4):
        even = k1[:, j] if j < 3 else z
        odd = k1[:, j - 1] if j >= 1 else z
        cols.append(jnp.concatenate([even, odd], axis=-1))
    return jnp.stack(cols, axis=1)                  # (3, 4, 3, 2co)


def _pack_k2_taps(k2):
    """(3,3,ci,co) -> (2, 8, 2*ci, 2*co) tap matrices.

    Out col parity eo, tap (dh in 0..3, po in 0..1): input pair Q+po lane
    (e_in*ci + c) feeds output lane (e_row*co + c') with kernel
    k2[dh - e_row, 2*po + e_in - eo] when both indices land in [0,3)."""
    ci_n, co_n = k2.shape[2], k2.shape[3]
    z = jnp.zeros((ci_n, co_n), k2.dtype)

    def ktap(dh, dw):
        return k2[dh, dw] if 0 <= dh < 3 and 0 <= dw < 3 else z

    outs = []
    for eo in range(2):
        taps = []
        for dh in range(4):
            for po in range(2):
                taps.append(jnp.block(
                    [[ktap(dh - er, 2 * po + ei - eo) for er in range(2)]
                     for ei in range(2)]))
        outs.append(jnp.stack(taps))
    return jnp.stack(outs)                          # (2, 8, 2ci, 2co)


def _kernel(c11_hbm, k2_ref, b2_ref, out_ref, buf, sems,
            *, tp, q, pairs_p, n_tiles, dtype):
    """Per grid step (b, t): tp pool rows from 2*tp+2 packed conv1_1 rows;
    double-buffered halo DMA."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    rows = 2 * tp + 2

    def copy(slot, tt):
        return pltpu.make_async_copy(
            c11_hbm.at[b, pl.ds(2 * tp * tt, rows)], buf.at[slot],
            sems.at[slot])

    slot = jax.lax.rem(t, 2)

    @pl.when(t == 0)
    def _():
        copy(0, 0).start()

    @pl.when(t + 1 < n_tiles)
    def _():
        copy(1 - slot, t + 1).start()

    copy(slot, t).wait()

    b2p = b2_ref[0, :].astype(jnp.float32)
    v = buf[slot].reshape(tp + 1, 2, pairs_p, 128)

    # row views per dh (both column parities and all q-chunks reuse them)
    rows = [jax.lax.slice_in_dim(v, dh // 2, dh // 2 + tp, axis=0)[:, dh % 2]
            for dh in range(4)]

    # process output columns in chunks: bounds the live lhs/acc VMEM so the
    # planner can afford large row tiles (few, well-hidden DMAs)
    q0 = 0
    while q0 < q:
        qc = min(_Q_CHUNK, q - q0)
        lhs = {}
        for dh in range(4):
            for po in range(2):
                lhs[dh, po] = jax.lax.slice_in_dim(
                    rows[dh], q0 + po, q0 + po + qc,
                    axis=1).reshape(tp * qc, 128)

        def col_parity(eo):
            acc = jnp.zeros((tp * qc, 128), jnp.float32)
            for dh in range(4):
                for po in range(2):
                    acc = acc + jax.lax.dot_general(
                        lhs[dh, po], k2_ref[eo, dh * 2 + po],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
            return jnp.maximum(acc + b2p, 0.0)

        z = jnp.maximum(col_parity(0), col_parity(1))  # pool over columns
        z = jnp.maximum(z[:, :64], z[:, 64:])          # pool over row parity
        out_ref[0, :, q0:q0 + qc, :] = z.reshape(tp, qc, 64).astype(dtype)
        q0 += qc


def fused_block1(xp, k1, b1, k2, b2, *, dtype=jnp.bfloat16):
    """conv1_1(VALID) + relu + conv1_2(VALID) + relu + 2x2/2 max-pool.

    xp: (B, Hp, Wp, 3) zero-padded input; returns
    (B, (Hp-4)//2, (Wp-4)//2, 64). Requires fused_block1_supported(Hp, Wp).
    conv1_1 runs in XLA (2% of block FLOPs), emitting the width-paired
    layout directly; conv1_2 + pool run in the Pallas kernel.
    """
    B, hp, wp, _ = xp.shape
    ch, cw = hp - 4, wp - 4
    ph, pw = ch // 2, cw // 2
    pairs = (cw + 2) // 2                           # conv1_1-out pairs
    pairs_p = -(-(pairs + 4) // 8) * 8              # DMA-aligned
    plan = _plan_tiles(ph, pairs_p, jnp.dtype(dtype).itemsize)
    assert plan is not None, (hp, wp)
    tp, ph_pad = plan
    # widen so conv1_1 emits pairs_p pairs and 2*ph_pad+2 rows natively;
    # the extra area extends the zero-pad region and is never read back
    xp = jnp.pad(xp, ((0, 0), (0, 2 * (ph_pad - ph)),
                      (0, 2 * (pairs_p - pairs)), (0, 0)))
    c11p = jax.lax.conv_general_dilated(
        xp.astype(dtype), _pack_k1_pairs(k1).astype(dtype), (1, 2),
        ((0, 0), (0, 0)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    c11p = jnp.maximum(
        c11p + jnp.concatenate([b1, b1]).astype(dtype), 0)
    # c11p: (B, 2*ph_pad + 2, pairs_p, 128)

    q = pairs - 1
    n_tiles = ph_pad // tp
    kern = functools.partial(_kernel, tp=tp, q=q, pairs_p=pairs_p,
                             n_tiles=n_tiles, dtype=dtype)
    out = pl.pallas_call(
        kern,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # c11p stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # k2 (2, 8, 128, 128)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b2 (1, 128)
        ],
        out_specs=pl.BlockSpec((1, tp, q, 64), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, ph_pad, q, 64), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 2 * tp + 2, pairs_p, 128), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(
        c11p,
        _pack_k2_taps(k2).astype(dtype),
        jnp.concatenate([b2, b2]).reshape(1, -1).astype(jnp.float32),
    )
    return out[:, :ph, :pw, :]


def xla_block1(xp, k1, b1, k2, b2, dtype=jnp.bfloat16):
    """Reference implementation (also the custom-vjp backward path)."""
    def conv(h, k):
        return jax.lax.conv_general_dilated(
            h, k.astype(dtype), (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    h = jnp.maximum(conv(xp.astype(dtype), k1) + b1.astype(dtype), 0)
    h = jnp.maximum(conv(h, k2) + b2.astype(dtype), 0)
    B, hh, ww, c = h.shape
    h = h.reshape(B, hh // 2, 2, ww // 2, 2, c)
    return jnp.max(jnp.max(h, axis=4), axis=2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def block1_op(xp, k1, b1, k2, b2, dtype=jnp.bfloat16):
    return fused_block1(xp, k1, b1, k2, b2, dtype=dtype)


def _fwd(xp, k1, b1, k2, b2, dtype):
    return (fused_block1(xp, k1, b1, k2, b2, dtype=dtype),
            (xp, k1, b1, k2, b2))


def _bwd(dtype, res, g):
    xp, k1, b1, k2, b2 = res
    _, vjp = jax.vjp(
        lambda *a: xla_block1(*a, dtype=dtype), xp, k1, b1, k2, b2)
    return vjp(g)


block1_op.defvjp(_fwd, _bwd)
