"""Support-pruned pad-100 VGG blocks — compute only where the data reaches.

The reference FCN-32s geometry pads conv1_1 by 100 (reference models.py:43),
inflating block 1 to (H+198)^2 activations for an H^2 input (1.9x the pixels
at 512^2) and blocks 2-4 proportionally. But everything the pad region
computes is *data-independent*: outside the input's receptive-field support,
layer activations equal the network's zero-input response ("frame") — a
per-channel constant in the interior of the pad region, with a thin boundary
rim (<= 3 px after any pool) shaped only by distance to the virtual edge.

This module evaluates the leading VGG blocks exactly while touching only the
support:

* data path: VALID convs over the support region grown by 1 px per conv,
  ring-padded with the per-channel zero-input constant c_l (exact, because
  the ring stays `rim` away from the virtual boundary — checked statically
  per geometry by `plan_blocks`); pools run on even-aligned/even-sized
  arrays, re-aligned with constant pads.
* constant chain: c_{l+1} = relu(sum_{taps,cin} K * c_l + b), c_0 = 0 — the
  interior value of the zero-input response at each layer.
* frame probe: one zero image of ~16^2..31^2 (chosen so the virtual ceil-pool
  parity chain matches the real input's: probe ≡ H mod 2^num_blocks) runs
  through the *plain* pad-100 stack, producing the full boundary-rim pattern
  at the materialization pool for ~1-2% of a batched forward's cost. The
  frame for the real virtual size is assembled from the probe by
  corner/edge/interior expansion (valid because frame values depend only on
  the distances to the virtual boundary, and the matched parity chain
  reproduces the ceil-pool padding pattern).
* materialization: the pruned pool support is placed into the assembled
  frame at its tracked virtual offset; the remaining blocks + fc6/fc7 then
  run unchanged, bit-compatible with the plain path.

Net effect at 512^2 with 4 pruned blocks: blocks 1-4 run at
516^2/262^2/136^2/73^2 instead of 710^2/355^2/178^2/89^2 — ~114 GFLOP/img
saved of the 389 GFLOP/img forward (1.4x fewer FLOPs) and ~45% less HBM
traffic in the layers that were bandwidth-bound, with identical numerics
(same multiplies on the support; the ring constants differ from the
conv-computed values only by fp reduction order). Gradients are exact
automatically: autodiff through the probe/frame reproduces the true
parameter gradients of the pad region.

Block 4's ring margins are tight (the support + rim nearly fills the 45^2
virtual array) and depend on the input size's parity chain, so `plan_blocks`
verifies every ring/alignment constraint with pure-int arithmetic before the
path is used; callers fall back 4 -> 3 -> plain. Block 5 is never prunable:
its ring would start inside the pool4 rim. FCN-8s stays at 3 blocks — its
skip connection needs the full pool3 array, which is exactly what the
3-block runner materializes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

# preferred / FCN-8s-compatible pruning depth (through pool4 / pool3)
NUM_PRUNED_BLOCKS = 4
NUM_PRUNED_BLOCKS_SKIP = 3
# zero-input frame rim width after pool3 (conv rims 3,4,5 -> pooled 3) and
# after pool4 (3 -> 4,5,6 -> pooled 3)
_FRAME_RIM = 3
_PROBE_BASE = 16  # probe side; + (input % 2^blocks) keeps the parity chain
_MIN_SIDE = 16    # below this the virtual array can undercut the probe's
# convs per block of the VGG16 stack (blocks 1-4)
_BLOCK_CONVS = (2, 2, 3, 3)


def _conv_valid(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _zero_input_response(k, c):
    """sum_{h,w,i} k[h,w,i,o] * c[i] -> (o,) fp32, as a multiply-reduce.

    The einsum("hwio,i->o") form put a `dot_general` in every program using
    pruned geometry; on this platform any XLA dot collapses H2D bandwidth
    (CLAUDE.md). The TPU backend was already lowering this contraction to
    broadcast+multiply+reduce, so the explicit form is the same computation.
    """
    return jnp.sum(k.astype(jnp.float32)
                   * c.astype(jnp.float32)[None, None, :, None], axis=(0, 1, 2))


def _padc(a, c, top, bottom, left, right):
    """Pad spatial dims with the per-channel constant vector c — built by
    concatenation (NOT pad(a-c)+c, which would perturb interior values)."""
    b, h, w, ch = a.shape
    c = c.astype(a.dtype)

    def band(hh, ww):
        return jnp.broadcast_to(c, (b, hh, ww, ch))

    if left or right:
        parts = ([band(h, left)] if left else []) + [a] + \
            ([band(h, right)] if right else [])
        a = jnp.concatenate(parts, axis=2) if len(parts) > 1 else a
        w = w + left + right
    if top or bottom:
        parts = ([band(top, w)] if top else []) + [a] + \
            ([band(bottom, w)] if bottom else [])
        a = jnp.concatenate(parts, axis=1) if len(parts) > 1 else a
    return a


def _expand_dim(p, axis, out_len):
    """Stretch a frame along `axis` from n to out_len by repeating the
    middle element — exact when the frame is constant beyond the rim on
    both sides of the middle (rim <= n//2 and rim <= n - n//2 - 1)."""
    n = p.shape[axis]
    if out_len == n:
        return p
    assert out_len > n, (out_len, n)
    m = n // 2
    head = jax.lax.slice_in_dim(p, 0, m, axis=axis)
    mid = jax.lax.slice_in_dim(p, m, m + 1, axis=axis)
    tail = jax.lax.slice_in_dim(p, m + 1, n, axis=axis)
    reps = out_len - (n - 1)
    mid_shape = list(mid.shape)
    mid_shape[axis] = reps
    mid = jnp.broadcast_to(mid, tuple(mid_shape))
    return jnp.concatenate([head, mid, tail], axis=axis)


def assemble_frame(probe, out_h, out_w):
    """(ph, pw, C) pooled zero-input response -> (out_h, out_w, C) frame."""
    assert min(probe.shape[0], probe.shape[1]) // 2 >= _FRAME_RIM
    return _expand_dim(_expand_dim(probe, 0, out_h), 1, out_w)


def probe_side(full_side: int, num_blocks: int) -> int:
    """Probe side length whose virtual ceil-pool parity chain matches the
    input's through `num_blocks` pools (identical mod 2^num_blocks)."""
    return _PROBE_BASE + full_side % (1 << num_blocks)


def plan_blocks(in_h: int, in_w: int, pad1: int, num_blocks: int):
    """Statically verify every ring/alignment/probe constraint of the pruned
    path for this geometry (pure-int simulation of `run_pruned_blocks`).

    Returns True when the `num_blocks`-deep pruned path is exact here.
    """
    if min(in_h, in_w) < _MIN_SIDE or num_blocks > len(_BLOCK_CONVS):
        return False
    s0, rim = 0, 0
    sz = [in_h, in_w]
    v = [in_h + 2 * pad1 - 2, in_w + 2 * pad1 - 2]
    pv = [probe_side(in_h, num_blocks) + 2 * pad1 - 2,
          probe_side(in_w, num_blocks) + 2 * pad1 - 2]
    for bi in range(num_blocks):
        for ci in range(_BLOCK_CONVS[bi]):
            first = bi == 0 and ci == 0
            if not first and not (
                    s0 - 2 >= rim and s0 + sz[0] + 2 + rim <= v[0]
                    and s0 + sz[1] + 2 + rim <= v[1]):
                return False
            sz = [s + 2 for s in sz]
            s0 += (pad1 - 2) if first else -1
            if not first:
                rim += 1
        if s0 % 2:
            if s0 - 1 < rim:
                return False
            s0 -= 1
            sz = [s + 1 for s in sz]
        for d in range(2):
            if sz[d] % 2:
                if s0 + sz[d] + 1 + rim > v[d]:
                    return False
                sz[d] += 1
        s0 //= 2
        sz = [s // 2 for s in sz]
        v = [-(-x // 2) for x in v]
        pv = [-(-x // 2) for x in pv]
        rim = -(-rim // 2)
    # frame assembly: probe large enough for the rim, virtual >= probe
    if rim > _FRAME_RIM:
        return False
    for d in range(2):
        if min(pv[d] // 2, pv[d] - pv[d] // 2 - 1) < _FRAME_RIM \
                or v[d] < pv[d]:
            return False
    return True


def prunable(in_h: int, in_w: int) -> bool:
    return min(in_h, in_w) >= _MIN_SIDE


def run_pruned_blocks(kbs, x, pad1: int, dtype, fused_block1: bool = False,
                      conv_relu=None):
    """Run the first len(kbs) VGG blocks (conv/relu stacks + 2x2 ceil pools)
    of the pad-100 geometry on the receptive-field support only.

    Args:
      kbs: [[(kernel, bias), ...] per block] — fp32 params, nn.Conv shapes.
      x: (B, H, W, 3) input image batch (pre-pad).
      pad1: conv1_1's big pad (reference models.py:43 — 100).
      dtype: compute dtype.
      fused_block1: route block 1 through the Pallas conv1_2+pool kernel
        (ops/block1_fused.py; forward-optimized, backward recomputes via
        XLA — serving/eval only). Falls back automatically when the
        geometry or width is unsupported.
      conv_relu: optional (a, k, b) -> activations hook replacing the
        VALID-conv+relu of the data path (e.g. models.quantized's int8
        conv); the frame probe and ring-constant chain stay fp — the
        zero-input response must be exact for the geometry argument.

    Returns the *full* virtual pool{len(kbs)} array, numerically equal to
    the plain pad-100 path. Callers must have validated the geometry with
    `plan_blocks` first.
    """
    B, H, W, _ = x.shape
    num_blocks = len(kbs)
    if conv_relu is None:
        def conv_relu(a, k, b):
            return nn.relu(_conv_valid(a, k.astype(dtype))
                           + b.astype(dtype))
    else:
        fused_block1 = False  # the hook replaces every data-path conv

    def plain_stack(h):
        for bi, blk in enumerate(kbs):
            for ci, (k, b) in enumerate(blk):
                pad = pad1 if (bi == 0 and ci == 0) else 1
                h = nn.relu(jax.lax.conv_general_dilated(
                    h, k.astype(dtype), (1, 1), ((pad, pad), (pad, pad)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                    + b.astype(dtype))
            h = nn.max_pool(h, (2, 2), strides=(2, 2),
                            padding=((0, (-h.shape[1]) % 2),
                                     (0, (-h.shape[2]) % 2)))
        return h

    # zero-input frame probe (batch-size 1; ~1-2% of a batched block cost)
    probe = plain_stack(jnp.zeros(
        (1, probe_side(H, num_blocks), probe_side(W, num_blocks), 3),
        dtype))[0]

    a = x.astype(dtype)
    c = jnp.zeros((3,), dtype)
    # s0 = coordinate of a[0, 0] on the current layer's full (virtual)
    # output grid. A ref conv with pad P, evaluated as our pad-q VALID conv,
    # maps s0 -> s0 - q + P: conv1_1 (P=pad1, q=2) lands the support at
    # pad1 - 2 on its (H + 2*pad1 - 2)-wide output; pad-1 convs shift by -1.
    s0 = 0
    vh, vw = H + 2 * pad1 - 2, W + 2 * pad1 - 2
    rim = 0                         # frame rim width at the current layer
    start_bi = 0
    if fused_block1 and len(kbs[0]) == 2 and kbs[0][1][0].shape[-1] == 64:
        from zeroshotsemanticsegmentation_tpu.ops.block1_fused import (
            block1_op, fused_block1_supported)
        # block 1's frame rim is 0, so its support segment is exactly plain
        # VALID convs on a zero-padded input: pad so the conv1_2 output
        # lands even-aligned for the pool ([pad1-4, ...) — +1 bottom/right
        # keeps odd extents pool-even)
        hp, wp_ = H + 10 + H % 2, W + 10 + W % 2
        if fused_block1_supported(hp, wp_, dtype=dtype) and pad1 >= 8:
            # conv1_2-out target [pad1-4, pad1-4+H+6): conv1_1 inputs span
            # [pad1-5, pad1+H+5) -> symmetric 5-px zero pad of the data
            (k1, b1), (k2, b2) = kbs[0]
            xp = jnp.pad(a, ((0, 0), (5, 5 + H % 2), (5, 5 + W % 2),
                             (0, 0)))
            a = block1_op(xp, k1, b1, k2, b2, dtype)
            # odd H/W: the +1 bottom/right pool-even pad computed one extra
            # pooled row/col beyond the standard path's support. It is
            # data-independent (conv rows >= s0+H+101 > data reach) and
            # equals the interior constant, so slicing it keeps this runner
            # in exact lockstep with the geometry plan_blocks simulated.
            a = a[:, :a.shape[1] - H % 2, :a.shape[2] - W % 2, :]
            for k, b in kbs[0]:
                c = nn.relu(_zero_input_response(k, c).astype(dtype)
                            + b.astype(dtype))
            s0 = (pad1 - 4) // 2
            vh, vw = -(-vh // 2), -(-vw // 2)
            rim = 1
            start_bi = 1
    for bi, blk in enumerate(kbs):
        if bi < start_bi:
            continue
        for ci, (k, b) in enumerate(blk):
            first = bi == 0 and ci == 0
            # ring-pad by 2 with the current constant: +1 halo for the VALID
            # conv, +1 so the support (which grows by 1) is fully computed
            assert first or (
                s0 - 2 >= rim and s0 + a.shape[1] + 2 + rim <= vh
                and s0 + a.shape[2] + 2 + rim <= vw), (bi, ci, s0, rim)
            a = _padc(a, c, 2, 2, 2, 2)
            a = conv_relu(a, k, b)
            s0 += (pad1 - 2) if first else -1
            # interior zero-input response: relu(sum_taps K c + b); fp32
            # accumulation mirrors the MXU conv (reduction order aside)
            c = nn.relu(_zero_input_response(k, c).astype(dtype)
                        + b.astype(dtype))
            if not first:
                rim += 1  # conv1_1's big pad is part of the virtual conv
        # 2x2/2 pool on an even-aligned, even-sized array (constant pads are
        # exact: they sit outside the support and beyond the rim)
        if s0 % 2:
            assert s0 - 1 >= rim
            a = _padc(a, c, 1, 0, 1, 0)
            s0 -= 1
        padb, padr = a.shape[1] % 2, a.shape[2] % 2
        if padb or padr:
            assert s0 + a.shape[1] + padb + rim <= vh
            assert s0 + a.shape[2] + padr + rim <= vw
            a = _padc(a, c, 0, padb, 0, padr)
        a = nn.max_pool(a, (2, 2), strides=(2, 2))
        s0 //= 2
        vh, vw = -(-vh // 2), -(-vw // 2)
        rim = -(-rim // 2)
    assert rim <= _FRAME_RIM, rim

    # a conv_relu hook may run the data path in a narrower dtype than the
    # fp ring/frame chain (e.g. int8 serving keeps bf16 activations); the
    # frame constants round to that dtype — negligible next to the hook's
    # own approximation, and a no-op for the standard path
    frame = assemble_frame(probe, vh, vw).astype(a.dtype)
    full = jnp.broadcast_to(frame[None], (B,) + frame.shape)
    return jax.lax.dynamic_update_slice(full, a, (0, s0, s0, 0))
