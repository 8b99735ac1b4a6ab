"""Pallas kernel for VGG block 1's hot half: conv1_2 (64->64) + 2x2 pool.

Why a hand kernel: conv1_2 is the least MXU-friendly op in the FCN stack —
C=64 half-fills the 128 lanes and XLA runs it at ~14% MXU on v5e (11.4 ms
of a 36.4 ms B=16 forward, measured in isolation). This implementation
packs BOTH spatial parities into the lane dimension:

* conv1_1 emits the packed layout *directly*: a stride-(1,2) XLA conv with
  a (3,4,3,128) kernel whose output lane is (column parity, channel) — no
  relayout ever happens in HBM. (A Pallas s2d formulation of conv1_1 was
  measured slower; kept below as `conv1_1_pairs` with its oracle test.)
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

`block1_op` is differentiable end-to-end: conv1_1's packed-kernel grads
come from XLA autodiff, and conv1_2/pool grads from a second Pallas kernel
(`_conv2_pool_bwd`) that recomputes the tap accumulators per tile
flash-style instead of materializing the conv1_2 volume — so the fused
path serves BOTH serving and training (see the backward section below).
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
    """xp is (B, hp, wp, 3); conv outputs (hp-4, wp-4) must pool evenly.

    Requires VMEM plans for BOTH the forward kernel and the backward
    kernel (the op is differentiable; a geometry whose backward can't tile
    would fail only at grad-trace time otherwise)."""
    ch, cw = hp - 4, wp - 4
    if channels != 64 or ch <= 0 or cw <= 0 or ch % 2 or cw % 2:
        return False
    pairs = (cw + 2) // 2
    pairs_p = -(-(pairs + 4) // 8) * 8
    itemsize = jnp.dtype(dtype).itemsize
    plan = _plan_tiles(ch // 2, pairs_p, itemsize)
    if plan is None:
        return False
    return _plan_bwd(plan[1], pairs_p, pairs - 1, itemsize) is not None


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


# --------------------------------------------------------------------------
# conv1_1: space-to-depth Pallas kernel (EXPERIMENT — measured slower)
# --------------------------------------------------------------------------
#
# A plain XLA conv runs conv1_1 at ~2% MXU (contraction 3x3x3=27) and a
# 2x2x12->256 space-to-depth XLA conv is no better — XLA's conv lowering
# can't save a Cin this small. This kernel reformulates conv1_1 as ONE
# dense matmul per output row-pair:
#
# * input is space-to-depth'd on the XLA side to (B, row-pairs, 32, W/2)
#   with sublane = (col-shift dQ, row-parity ei, col-parity ej, ci padded
#   3->4) — a cheap one-time HBM relayout of the small 3-channel input
#   (the dQ=1 copy is pre-shifted because Mosaic lacks bf16 lane-rotate);
# * per output row-pair the kernel assembles a (64, W/2) operand from two
#   aligned 32-sublane copies: source row-pairs R and R+1 (the 2x2 s2d
#   window covers the original 3x3 window at every output parity);
# * one dot_general against a host-packed (64, 256) kernel matrix yields
#   all four output phases (er, ec) at once: result lanes are
#   (er*128 + ec*64 + c), so lanes [0:128) and [128:256) are exactly the
#   packed-pair c11p rows 2R and 2R+1 — the kernel writes the layout the
#   conv1_2 kernel consumes, and no relayout ever exists.
#
# MEASURED (dependent-chain, B=16 530^2, v5e): 5.60 ms vs 3.32 ms for the
# XLA stride-(1,2) packed conv — the per-row-pair (64,W/2)@(64,256) dots
# are latency-bound (~4200 tiny MXU ops per batch), so fused_block1 keeps
# the XLA conv1_1. Kept (with its oracle test) as the reference s2d
# formulation. The chain microbench (scripts/bench_block1.py) also shows
# the c11p HBM round-trip between the two stages costs ~5 ms at B=16 —
# the next lever is fusing conv1_1 into the conv1_2 kernel so c11p never
# exists in HBM, not a faster standalone conv1_1.


def _pack_k1_s2d(k1):
    """(3,3,3,co) -> (64, 4co): sublane (dRR*32 + dQ*16 + ei*8 + ej*4 + ci),
    lane (er*2co + ec*co + c'). Entry = k1[2dRR+ei-er, 2dQ+ej-ec, ci, c']
    where in-range (the 2x2 s2d window covering the 3x3 taps), else 0."""
    co = k1.shape[3]
    z = jnp.zeros((co,), k1.dtype)
    rows = []
    for drr in range(2):
        for dq in range(2):
            for ei in range(2):
                for ej in range(2):
                    for ci in range(4):
                        segs = []
                        for er in range(2):
                            for ec in range(2):
                                dh = 2 * drr + ei - er
                                dw = 2 * dq + ej - ec
                                ok = (0 <= dh < 3 and 0 <= dw < 3
                                      and ci < 3)
                                segs.append(k1[dh, dw, ci] if ok else z)
                        rows.append(jnp.concatenate(segs))
    return jnp.stack(rows)


def _s2d_input(xp):
    """(B, Hp, Wp, 3) -> (B, Hp/2, 32, Wp/2), sublane (dQ, ei, ej, ci4).

    Sublanes [0:16) hold the s2d grid as-is, [16:32) the same shifted one
    s2d column left (lane q reads source column q+1; the garbage last lane
    only feeds the dropped output pair). The shift lives here because
    Mosaic has no bf16 lane-rotate — XLA pays it once in the (tiny) input
    relayout instead of the kernel paying per row-pair."""
    b, hp, wp, _ = xp.shape
    x = jnp.pad(xp, ((0, 0), (0, 0), (0, 0), (0, 1)))
    x = x.reshape(b, hp // 2, 2, wp // 2, 2, 4)
    x = x.transpose(0, 1, 2, 4, 5, 3).reshape(b, hp // 2, 16, wp // 2)
    x_sh = jnp.pad(x[:, :, :, 1:], ((0, 0), (0, 0), (0, 0), (0, 1)))
    return jnp.concatenate([x, x_sh], axis=2)


def _c11_kernel(xs_hbm, k1_ref, b1_ref, out_ref, buf, pbuf, sems,
                *, trp, pp, n_tiles, dtype):
    b = pl.program_id(0)
    t = pl.program_id(1)

    def copy(slot, tt):
        return pltpu.make_async_copy(
            xs_hbm.at[b, pl.ds(trp * tt, trp + 1)], buf.at[slot],
            sems.at[slot])

    slot = jax.lax.rem(t, 2)

    @pl.when(t == 0)
    def _():
        copy(0, 0).start()

    @pl.when(t + 1 < n_tiles)
    def _():
        copy(1 - slot, t + 1).start()

    copy(slot, t).wait()

    b1p = b1_ref[0, :].astype(jnp.float32)
    for rr in range(trp):
        pbuf[0:32] = buf[slot, rr]
        pbuf[32:64] = buf[slot, rr + 1]
        res = jax.lax.dot_general(
            pbuf[:], k1_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        res = jnp.maximum(res + b1p, 0.0).astype(dtype)
        out_ref[0, 2 * rr] = res[:pp, :128]
        out_ref[0, 2 * rr + 1] = res[:pp, 128:]


def conv1_1_pairs(xp, k1, b1, *, dtype=jnp.bfloat16):
    """conv1_1(VALID) + relu emitting the packed-pair layout directly.

    xp: (B, Hp, Wp, 3) zero-padded input, Hp/Wp even. Returns
    (B, Hp-2, (Wp-2)//2, 128) with row r = conv row r and lane (e*64+c) =
    conv col 2q+e — the c11p layout fused_block1's conv1_2 kernel reads.
    """
    B, hp, wp, _ = xp.shape
    rp = hp // 2 - 1                   # output row-pairs
    w2 = wp // 2
    pp = w2 - 1
    # Mosaic DMA constraint: the minor (lane) dim of a sliced memref must be
    # a 128 multiple — pad the s2d width once on the XLA side (the pad
    # columns are matmul'd but never written out: res[:pp] below)
    w2p = -(-w2 // 128) * 128
    itemsize = jnp.dtype(dtype).itemsize
    trp = 16
    while trp > 2 and (2 * trp * pp * 128 + (4 * (trp + 1) + 4) * 16 * w2p
                       ) * itemsize + w2p * 256 * 4 > 10 * 1024 * 1024:
        trp //= 2
    trp = min(trp, rp)
    n_tiles = -(-rp // trp)
    xs = _s2d_input(xp.astype(dtype))
    xs = jnp.pad(xs, ((0, 0), (0, n_tiles * trp + 1 - xs.shape[1]),
                      (0, 0), (0, w2p - w2)))
    kern = functools.partial(_c11_kernel, trp=trp, pp=pp,
                             n_tiles=n_tiles, dtype=dtype)
    out = pl.pallas_call(
        kern,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # xs stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # packed k1 (64, 256)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b1 (1, 256)
        ],
        out_specs=pl.BlockSpec((1, 2 * trp, pp, 128),
                               lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 2 * n_tiles * trp, pp, 128),
                                       dtype),
        scratch_shapes=[
            pltpu.VMEM((2, trp + 1, 32, w2p), dtype),
            pltpu.VMEM((64, w2p), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(
        xs,
        _pack_k1_s2d(k1).astype(dtype),
        jnp.tile(b1, 4).reshape(1, -1).astype(jnp.float32),
    )
    return out[:, :2 * rp]


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


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _conv2_pool(c11p, k2p, b2p, q, pairs_p, ph_pad, dtype):
    """Pallas conv1_2 + relu + 2x2 pool on the packed-pair layout.

    c11p: (B, 2*ph_pad + 2, pairs_p, 128) post-relu packed conv1_1 output;
    k2p: (2, 8, 128, 128) packed taps; b2p: (1, 128). Returns
    (B, ph_pad, q, 64). Differentiable: the backward is a second Pallas
    kernel (flash-style — it recomputes the tap accumulators per tile
    instead of saving the 546 MB conv1_2 volume; see _conv2_pool_bwd).
    """
    return _conv2_pool_fwd_impl(c11p, k2p, b2p, q, pairs_p, ph_pad, dtype)


def _conv2_pool_fwd_impl(c11p, k2p, b2p, q, pairs_p, ph_pad, dtype):
    B = c11p.shape[0]
    tp = _plan_tiles(ph_pad, pairs_p, jnp.dtype(dtype).itemsize)[0]
    n_tiles = ph_pad // tp
    kern = functools.partial(_kernel, tp=tp, q=q, pairs_p=pairs_p,
                             n_tiles=n_tiles, dtype=dtype)
    return pl.pallas_call(
        kern,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # c11p stays in HBM
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
    )(c11p, k2p, b2p)


def fused_block1(xp, k1, b1, k2, b2, *, dtype=jnp.bfloat16):
    """conv1_1(VALID) + relu + conv1_2(VALID) + relu + 2x2/2 max-pool
    (TWO-stage form: XLA conv1_1 -> HBM -> Pallas conv1_2+pool).

    xp: (B, Hp, Wp, 3) zero-padded input; returns
    (B, (Hp-4)//2, (Wp-4)//2, 64). Requires fused_block1_supported(Hp, Wp).
    conv1_1 runs in XLA (2% of block FLOPs), emitting the width-paired
    layout directly; conv1_2 + pool run in the Pallas kernel. The whole
    composite is differentiable: conv1_1 grads come from XLA autodiff
    (incl. the packed-kernel/bias transposes), conv1_2/pool grads from the
    Pallas backward kernel. This is the TRAINING form (its VJP reuses the
    c11p intermediate); serving forward uses `fused_block1_full`, which
    keeps c11p out of HBM entirely.
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
    out = _conv2_pool(c11p, _pack_k2_taps(k2).astype(dtype),
                      jnp.concatenate([b2, b2]).reshape(1, -1).astype(
                          jnp.float32),
                      q, pairs_p, ph_pad, dtype)
    return out[:, :ph, :pw, :]


# --------------------------------------------------------------------------
# Fully-fused block 1: conv1_1 + conv1_2 + pool in ONE kernel (serving fwd)
# --------------------------------------------------------------------------
#
# The two-stage form's cost split at B=16 530² (scripts/bench_block1.py):
# XLA packed conv1_1 ~3.3 ms + c11p HBM round-trip ~5 ms + conv1_2 kernel.
# c11p is 543 MB/batch at 512² — pure bandwidth. This kernel computes the
# c11p rows each tile needs IN VMEM from the (tiny, 34 MB) space-to-depth
# input and never materializes them:
#
# * XLA side: `_s2d_input` relayout (one cheap pass over the 3-channel
#   image), rows padded so tile t streams s2d row-pairs [t*tp, t*tp+tp+2).
# * conv1_1 per tile: the s2d dot of `conv1_1_pairs`, but BATCHED — RC
#   row-pairs assemble side-by-side in the lane dimension and contract in
#   one (64, RC*w2p) @ (64, 256) MXU op. The standalone kernel measured
#   latency-bound at ~4200 one-row-pair dots/batch (5.60 ms); batching
#   cuts the op count RC-fold and drops the HBM write entirely.
# * conv1_2 + pool: identical tap machinery to `_kernel`, reading the
#   VMEM-resident pair buffer instead of a DMA'd c11p tile.
#
# Forward-only by construction: `block1_op`'s custom_vjp routes gradients
# through the two-stage form (whose backward wants c11p in HBM anyway), so
# training semantics and speed are unchanged.

_RC = 8  # row-pairs per batched conv1_1 dot (bounds the res transient)


def _tile_bytes_full(tp: int, pairs_p: int, w2p: int,
                     itemsize: int = 2) -> int:
    q = pairs_p - 5
    qc = min(_Q_CHUNK, q)
    return (2 * (tp + 2) * 32 * w2p * itemsize     # dbl-buffered s2d tiles
            + (tp + 1) * 2 * pairs_p * 128 * itemsize  # VMEM c11 pairs
            + 64 * _RC * w2p * itemsize            # batched s2d lhs
            + _RC * w2p * 256 * itemsize           # conv1_1 res (dtype)
            + 8 * tp * qc * 128 * itemsize         # 8 conv1_2 lhs operands
            + 2 * tp * qc * 128 * 4                # parity accs (fp32)
            + 2 * tp * q * 64 * itemsize)          # dbl-buffered out


def _plan_tiles_full(ph: int, pairs_p: int, w2p: int, itemsize: int = 2):
    for tp in range(40, 3, -1):
        if _tile_bytes_full(tp, pairs_p, w2p, itemsize) <= _VMEM_BUDGET:
            return tp, ph + (-ph) % tp
    return None


def fused_block1_full_supported(hp: int, wp: int, channels: int = 64,
                                dtype=jnp.bfloat16) -> bool:
    ch, cw = hp - 4, wp - 4
    if channels != 64 or ch <= 0 or cw <= 0 or ch % 2 or cw % 2:
        return False
    pairs = (cw + 2) // 2
    pairs_p = -(-(pairs + 4) // 8) * 8
    w2p = -(-(pairs_p + 1) // 128) * 128
    return _plan_tiles_full(ch // 2, pairs_p, w2p,
                            jnp.dtype(dtype).itemsize) is not None


def _kernel_full(xs_hbm, k1_ref, b1_ref, k2_ref, b2_ref, out_ref,
                 xsbuf, pbuf, vbuf, sems,
                 *, tp, q, pairs_p, w2p, n_tiles, dtype):
    """Per grid step (b, t): stream s2d rows, build the tile's c11 pairs in
    VMEM (batched s2d dots), then conv1_2 taps + pool exactly like _kernel."""
    b = pl.program_id(0)
    t = pl.program_id(1)

    def copy(slot, tt):
        return pltpu.make_async_copy(
            xs_hbm.at[b, pl.ds(tp * tt, tp + 2)], xsbuf.at[slot],
            sems.at[slot])

    slot = jax.lax.rem(t, 2)

    @pl.when(t == 0)
    def _():
        copy(0, 0).start()

    @pl.when(t + 1 < n_tiles)
    def _():
        copy(1 - slot, t + 1).start()

    copy(slot, t).wait()

    # ---- conv1_1: tp+1 c11 row-pairs from tp+2 s2d rows ------------------
    # MXU accumulates f32 (Mosaic requires a 32-bit acc); rounding to the
    # compute dtype BEFORE the bias-add reproduces the two-stage XLA packed
    # conv's arithmetic exactly (conv emits bf16, bias adds in bf16)
    b1p = b1_ref[0, :].astype(dtype)
    rp = 0
    while rp < tp + 1:
        k = min(_RC, tp + 1 - rp)
        for j in range(k):
            pbuf[0:32, (j) * w2p:(j + 1) * w2p] = xsbuf[slot, rp + j]
            pbuf[32:64, (j) * w2p:(j + 1) * w2p] = xsbuf[slot, rp + j + 1]
        res = jax.lax.dot_general(
            pbuf[:, :k * w2p], k1_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dtype)
        res = jnp.maximum(res + b1p, 0.0)
        for j in range(k):
            seg = jax.lax.slice_in_dim(res, j * w2p, j * w2p + pairs_p,
                                       axis=0)
            vbuf[rp + j, 0] = seg[:, :128]
            vbuf[rp + j, 1] = seg[:, 128:]
        rp += k

    # ---- conv1_2 + pool (same tap machinery as _kernel) ------------------
    b2p = b2_ref[0, :].astype(jnp.float32)
    v = vbuf[...]
    rows = [jax.lax.slice_in_dim(v, dh // 2, dh // 2 + tp, axis=0)[:, dh % 2]
            for dh in range(4)]

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

        z = jnp.maximum(col_parity(0), col_parity(1))
        z = jnp.maximum(z[:, :64], z[:, 64:])
        out_ref[0, :, q0:q0 + qc, :] = z.reshape(tp, qc, 64).astype(dtype)
        q0 += qc


def fused_block1_full(xp, k1, b1, k2, b2, *, dtype=jnp.bfloat16):
    """conv1_1 + relu + conv1_2 + relu + pool in ONE Pallas kernel; the
    packed conv1_1 output never exists in HBM. Forward-only fast path —
    `block1_op` routes autodiff through the two-stage form.

    xp: (B, Hp, Wp, 3); returns (B, (Hp-4)//2, (Wp-4)//2, 64). Requires
    fused_block1_full_supported(Hp, Wp).
    """
    B, hp, wp, _ = xp.shape
    ch, cw = hp - 4, wp - 4
    ph, pw = ch // 2, cw // 2
    pairs = (cw + 2) // 2
    pairs_p = -(-(pairs + 4) // 8) * 8
    w2p = -(-(pairs_p + 1) // 128) * 128
    plan = _plan_tiles_full(ph, pairs_p, w2p, jnp.dtype(dtype).itemsize)
    assert plan is not None, (hp, wp)
    tp, ph_pad = plan
    # widen exactly like fused_block1: zero-pad region, never read back
    xp = jnp.pad(xp, ((0, 0), (0, 2 * (ph_pad - ph)),
                      (0, 2 * (pairs_p - pairs)), (0, 0)))
    # s2d relayout of the 3-channel input (w2 = pairs_p + 1 after the pad,
    # so every tile's valid pair count is exactly pairs_p)
    xs = _s2d_input(xp.astype(dtype))
    xs = jnp.pad(xs, ((0, 0), (0, 0), (0, 0), (0, w2p - xs.shape[3])))

    q = pairs - 1
    n_tiles = ph_pad // tp
    kern = functools.partial(_kernel_full, tp=tp, q=q, pairs_p=pairs_p,
                             w2p=w2p, n_tiles=n_tiles, dtype=dtype)
    out = pl.pallas_call(
        kern,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # xs stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # k1 s2d (64, 256)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b1 (1, 256)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # k2 taps (2,8,128,128)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b2 (1, 128)
        ],
        out_specs=pl.BlockSpec((1, tp, q, 64), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, ph_pad, q, 64), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tp + 2, 32, w2p), dtype),
            pltpu.VMEM((64, _RC * w2p), dtype),
            pltpu.VMEM((tp + 1, 2, pairs_p, 128), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(
        xs,
        _pack_k1_s2d(k1).astype(dtype),
        jnp.tile(b1, 4).reshape(1, -1).astype(jnp.float32),
        _pack_k2_taps(k2).astype(dtype),
        jnp.concatenate([b2, b2]).reshape(1, -1).astype(jnp.float32),
    )
    return out[:, :ph, :pw, :]


# --------------------------------------------------------------------------
# Backward Pallas kernel: flash-style recompute of conv1_2 + pool
# --------------------------------------------------------------------------
#
# Training needs d(k2), d(b2) and d(c11p) from the pool-output cotangent g.
# The naive route materializes the 546 MB/batch conv1_2 volume (relu + pool
# masks) that the forward kernel exists to avoid; XLA's formulation of this
# backward (conv igrad + wgrad + select-and-scatter + two bias reductions)
# measures ~27 ms of a B=24 512^2 train step. This kernel instead recomputes
# the 16 packed-tap fp32 accumulators per tile — bitwise identical to the
# forward (same taps, same order, same K=128 contractions), so the pool
# first-max routing and relu masks are exact — then computes all three
# gradients from VMEM-resident dz:
#
# * routing: first-max in the original row-major window scan order
#   ((2r,2c),(2r,2c+1),(2r+1,2c),(2r+1,2c+1)), matching XLA
#   select-and-scatter / torch MaxPool2d tie-breaking (scripts/experiments/pool_bwd_pallas.py), then
#   relu'(pre > 0) (jax.nn.relu semantics: zero subgradient at 0).
# * dK[eo,tap] += dz_eo^T @ lhs (one dz transpose per parity, accumulated
#   fp32 in a VMEM-resident output block across the whole grid; emitted
#   transposed, un-transposed on the XLA side).
# * d(c11p): per tap dz_eo @ K^T, placed by value-level zero-pads (row
#   shift dh//2, column shift po) — no unaligned ref stores. Tiles emit
#   overlapping (tp+1)-pair segments; the XLA side overlap-adds them
#   (same trick as ops/conv7x7's 49-tap overlap-add).
# * db2 accumulates lane-wise; the two row-parity halves merge outside.


def _bwd_tile_bytes(tb: int, pairs_p: int, qpad: int, qc: int,
                    itemsize: int) -> int:
    f32 = 4
    return (2 * (2 * tb + 2) * pairs_p * 128 * itemsize  # dbl c11p buf
            + 2 * tb * qpad * 64 * itemsize              # g block (dbl)
            + 2 * tb * qpad * 128 * itemsize             # dz scratch
            + 2 * tb * qpad * 128 * itemsize             # dz transposes
            + 4 * tb * (qpad + 1) * 128 * itemsize       # padded rows_dh
            + 2 * tb * qc * 128 * f32                    # recompute accs
            + 3 * (tb + 1) * (qpad + 1) * 128 * f32      # dv accs + shifted
            + (2 * tb + 2) * (qpad + 1) * 128 * (f32 + itemsize)  # stack+cast
            + 2 * (2 * tb + 2) * pairs_p * 128 * itemsize  # dv out (dbl)
            + 2 * 8 * 128 * 128 * (f32 + 2 * itemsize))  # dK + k2 + k2T


def _plan_bwd(ph_pad: int, pairs_p: int, q: int, itemsize: int):
    """(tb, qpad, qc): row tile, 8-aligned dz width, balanced chunk."""
    qpad = -(-q // 8) * 8
    n_chunks = -(-qpad // 128)
    qc = -(-qpad // n_chunks // 8) * 8
    for tb in range(12, 1, -1):
        if _bwd_tile_bytes(tb, pairs_p, qpad, qc, itemsize) <= _VMEM_BUDGET:
            return tb, qpad, qc
    return None


def _bwd_kernel(c11_hbm, g_ref, k2_ref, k2t_ref, b2_ref,
                dv_ref, dkt_ref, db_ref, buf, dz_ref, sems,
                *, tb, q, qpad, qc, pairs_p, n_tiles, rows_total, dtype):
    b = pl.program_id(0)
    t = pl.program_id(1)
    rows = 2 * tb + 2

    def copy(slot, tt):
        # clamp: the last tile may start past the (unpadded) c11p rows; its
        # re-read rows produce garbage accs but its g rows are zero-padded,
        # so every dz there is exactly 0 and nothing propagates
        start = jnp.minimum(2 * tb * tt, rows_total - rows)
        return pltpu.make_async_copy(
            c11_hbm.at[b, pl.ds(start, rows)], buf.at[slot], sems.at[slot])

    slot = jax.lax.rem(t, 2)

    @pl.when(t == 0)
    def _():
        copy(0, 0).start()

    @pl.when(t + 1 < n_tiles)
    def _():
        copy(1 - slot, t + 1).start()

    copy(slot, t).wait()

    @pl.when((b == 0) & (t == 0))
    def _():
        dkt_ref[...] = jnp.zeros((2, 8, 128, 128), jnp.float32)
        db_ref[...] = jnp.zeros((1, 128), jnp.float32)

    b2p = b2_ref[0, :].astype(jnp.float32)
    v = buf[slot].reshape(tb + 1, 2, pairs_p, 128)
    # one extra pair column: the last output pair's po=1 taps read input
    # pair qpad, which can exceed pairs_p by 1; the pad value only ever
    # multiplies dz columns >= q, which are identically 0
    colpad = max(0, qpad + 1 - pairs_p)
    rows_dh = [jnp.pad(jax.lax.slice_in_dim(v, dh // 2, dh // 2 + tb,
                                            axis=0)[:, dh % 2],
                       ((0, 0), (0, colpad), (0, 0)))
               for dh in range(4)]                   # (tb, >=qpad+1, 128)
    gt = g_ref[0].astype(jnp.float32)                # (tb, qpad, 64)

    # ---- stage 1: recompute accs per q-chunk, route g into dz ----------
    q0 = 0
    while q0 < qpad:
        qc_ = min(qc, qpad - q0)
        lhs = {}
        for dh in range(4):
            for po in range(2):
                lhs[dh, po] = jax.lax.slice_in_dim(
                    rows_dh[dh], q0 + po, q0 + po + qc_,
                    axis=1).reshape(tb * qc_, 128)

        def parity_pre(eo):
            acc = jnp.zeros((tb * qc_, 128), jnp.float32)
            for dh in range(4):
                for po in range(2):
                    acc = acc + jax.lax.dot_general(
                        lhs[dh, po], k2_ref[eo, dh * 2 + po],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
            return acc + b2p

        pre0 = parity_pre(0)                          # lanes = er*64 + c
        pre1 = parity_pre(1)
        a00 = jnp.maximum(pre0[:, :64], 0.0)
        a10 = jnp.maximum(pre0[:, 64:], 0.0)
        a01 = jnp.maximum(pre1[:, :64], 0.0)
        a11 = jnp.maximum(pre1[:, 64:], 0.0)
        m = jnp.maximum(jnp.maximum(a00, a01), jnp.maximum(a10, a11))
        gc = jax.lax.slice_in_dim(gt, q0, q0 + qc_,
                                  axis=1).reshape(tb * qc_, 64)
        e00 = a00 == m                               # first-max chain in
        e01 = (a01 == m) & ~e00                      # window scan order
        e10 = (a10 == m) & ~(e00 | e01)
        e11 = ~(e00 | e01 | e10)
        z = jnp.zeros_like(gc)
        dz00 = jnp.where(e00 & (pre0[:, :64] > 0), gc, z)
        dz01 = jnp.where(e01 & (pre1[:, :64] > 0), gc, z)
        dz10 = jnp.where(e10 & (pre0[:, 64:] > 0), gc, z)
        dz11 = jnp.where(e11 & (pre1[:, 64:] > 0), gc, z)
        dz_ref[0, :, q0:q0 + qc_, :] = jnp.concatenate(
            [dz00, dz10], axis=-1).reshape(tb, qc_, 128).astype(dtype)
        dz_ref[1, :, q0:q0 + qc_, :] = jnp.concatenate(
            [dz01, dz11], axis=-1).reshape(tb, qc_, 128).astype(dtype)
        q0 += qc_

    # ---- stage 2: tile-wide tap matmuls --------------------------------
    dz = [dz_ref[0].reshape(tb * qpad, 128), dz_ref[1].reshape(tb * qpad, 128)]
    dzt = [dz[0].T, dz[1].T]                         # one transpose / parity
    db_ref[0, :] += (jnp.sum(dz[0].astype(jnp.float32), axis=0)
                     + jnp.sum(dz[1].astype(jnp.float32), axis=0))
    dv = [jnp.zeros((tb + 1, qpad + 1, 128), jnp.float32) for _ in range(2)]
    for eo in range(2):
        for dh in range(4):
            for po in range(2):
                lhs_full = jax.lax.slice_in_dim(
                    rows_dh[dh], po, po + qpad, axis=1).reshape(
                        tb * qpad, 128)
                dkt_ref[eo, dh * 2 + po] += jax.lax.dot_general(
                    dzt[eo], lhs_full, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                c = jax.lax.dot_general(
                    dz[eo], k2t_ref[eo, dh * 2 + po],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                c = jnp.pad(c.reshape(tb, qpad, 128),
                            ((dh // 2, 1 - dh // 2), (po, 1 - po), (0, 0)))
                dv[dh % 2] = dv[dh % 2] + c
    out = jnp.stack(dv, axis=1).reshape(2 * tb + 2, qpad + 1, 128)
    if qpad + 1 < pairs_p:
        out = jnp.pad(out, ((0, 0), (0, pairs_p - qpad - 1), (0, 0)))
    dv_ref[0, 0] = out[:, :pairs_p].astype(dtype)


def _conv2_pool_bwd_impl(c11p, k2p, b2p, g, q, pairs_p, ph_pad, dtype):
    B = c11p.shape[0]
    rows_total = 2 * ph_pad + 2
    itemsize = jnp.dtype(dtype).itemsize
    plan = _plan_bwd(ph_pad, pairs_p, q, itemsize)
    assert plan is not None, (ph_pad, pairs_p, q)
    tb, qpad, qc = plan
    n_tiles = -(-ph_pad // tb)
    g = jnp.pad(g, ((0, 0), (0, n_tiles * tb - ph_pad), (0, qpad - q),
                    (0, 0)))
    k2t = jnp.swapaxes(k2p, 2, 3)
    kern = functools.partial(
        _bwd_kernel, tb=tb, q=q, qpad=qpad, qc=qc, pairs_p=pairs_p,
        n_tiles=n_tiles, rows_total=rows_total, dtype=dtype)
    dv_seg, dkt, db = pl.pallas_call(
        kern,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # c11p stays in HBM
            pl.BlockSpec((1, tb, qpad, 64), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # k2 taps
            pl.BlockSpec(memory_space=pltpu.VMEM),  # k2 taps transposed
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b2 (1, 128)
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 2 * tb + 2, pairs_p, 128),
                         lambda b, t: (b, t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 8, 128, 128), lambda b, t: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, n_tiles, 2 * tb + 2, pairs_p, 128),
                                 dtype),
            jax.ShapeDtypeStruct((2, 8, 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((1, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 2 * tb + 2, pairs_p, 128), dtype),
            pltpu.VMEM((2, tb, qpad, 128), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(c11p, g, k2p, k2t, b2p)

    # overlap-add the (tb+1)-pair segments: segment t owns pairs
    # [tb*t, tb*t + tb + 1); its last pair coincides with segment t+1's
    # first — place the 2-row tails at stride 2*tb, shifted by one segment
    main = dv_seg[:, :, :2 * tb].reshape(B, n_tiles * 2 * tb, pairs_p, 128)
    tail = dv_seg[:, :, 2 * tb:]                     # (B, n_tiles, 2, ...)
    tail = jnp.concatenate(
        [tail, jnp.zeros((B, n_tiles, 2 * tb - 2, pairs_p, 128), dtype)],
        axis=2).reshape(B, n_tiles * 2 * tb, pairs_p, 128)
    shifted = jnp.pad(tail, ((0, 0), (2 * tb, 0), (0, 0), (0, 0)))
    main = jnp.pad(main, ((0, 0), (0, 2 * tb), (0, 0), (0, 0)))
    dc11p = (main + shifted)[:, :rows_total]
    dk2p = jnp.swapaxes(dkt, 2, 3).astype(k2p.dtype)
    return dc11p, dk2p, db.astype(b2p.dtype)


def _conv2_pool_fwd(c11p, k2p, b2p, q, pairs_p, ph_pad, dtype):
    out = _conv2_pool_fwd_impl(c11p, k2p, b2p, q, pairs_p, ph_pad, dtype)
    return out, (c11p, k2p, b2p)


def _conv2_pool_bwd(q, pairs_p, ph_pad, dtype, res, g):
    c11p, k2p, b2p = res
    return _conv2_pool_bwd_impl(c11p, k2p, b2p, g, q, pairs_p, ph_pad,
                                dtype)


_conv2_pool.defvjp(_conv2_pool_fwd, _conv2_pool_bwd)


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
    """Differentiable fused block 1 (kept as the models' entry point).

    Un-differentiated forward (serving/eval) = fused_block1_full, the ONE
    kernel that never writes the packed conv1_1 output to HBM. Under
    autodiff the custom_vjp's fwd rule runs the two-stage fused_block1
    instead — its backward wants the c11p intermediate in HBM anyway — so
    training keeps the round-3 kernel pair (XLA conv1_1 autodiff + the
    flash-style _conv2_pool_bwd), bit-for-bit. At bf16 the two forwards
    differ only by rounding-point placement: every deviation (from each
    other and from the fp32 reference) is within ~1 bf16 ULP at the output's
    max magnitude (pinned by test_full_vs_twostage_bf16_parity; per-element
    ULP agreement is unattainable for ANY bf16 pair here — conv1_1 rounding
    propagates through conv1_2's 576-term accumulation).
    """
    B, hp, wp, _ = xp.shape
    if fused_block1_full_supported(hp, wp, dtype=dtype):
        return fused_block1_full(xp, k1, b1, k2, b2, dtype=dtype)
    return fused_block1(xp, k1, b1, k2, b2, dtype=dtype)


def _block1_op_fwd(xp, k1, b1, k2, b2, dtype):
    out, vjp = jax.vjp(
        lambda *a: fused_block1(*a, dtype=dtype), xp, k1, b1, k2, b2)
    return out, vjp


def _block1_op_bwd(dtype, vjp, g):
    return vjp(g)


block1_op.defvjp(_block1_op_fwd, _block1_op_bwd)
