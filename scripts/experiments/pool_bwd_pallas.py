"""2x2/2 max pooling with a dense first-max backward (Pallas on TPU).

STATUS: shelved with findings — NOT wired into the models. Measured
in-context on v5e (B=24 512² train step, dependent-chain methodology):
select-and-scatter 204 ms/step, XLA dense backward 230 ms, this Pallas
backward 253 ms. The opaque custom call blocks XLA from fusing the pool
backward into the surrounding conv backwards, and the row-tile padding
adds full-tensor HBM copies; isolated timings that suggested S&S was
~170x off the bandwidth floor were artifacts of this platform's
identical-call dedup. Kept (with tests) as the reference first-max
formulation and for future Mosaic revisions.

XLA differentiates `reduce_window(max)` into a SelectAndScatter op. The
same semantics — the cotangent flows to the FIRST window element
(row-major scan order) attaining the max, matching both XLA's
select-and-scatter and torch's MaxPool2d backward tie-breaking (reference
models.py:45 pools) — is pure elementwise selection on the four window
planes:

    e00 = (x00 == m)
    e01 = (x01 == m) & ~e00            # first-max chain
    e10 = (x10 == m) & ~e00 & ~e01
    e11 = ~e00 & ~e01 & ~e10
    dx_ij = g * e_ij

On TPU this runs as a Pallas kernel (`pool_bwd_pallas`) whose blocks are
parity-decomposed by metadata-only reshapes — see _bwd_kernel; elsewhere
(CPU tests) an equivalent XLA formulation is used. Forward is XLA's
native reduce_window. Ceil mode pads bottom/right with -inf exactly like
flax's max_pool padding (init value of the max reduction), so odd extents
match nn.max_pool with padding=((0, pb), (0, pr)) bit-for-bit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _split_windows(x):
    """(B, 2h, 2w, C) -> the four (B, h, w, C) window planes, scan order."""
    b, hh, ww, c = x.shape
    x4 = x.reshape(b, hh // 2, 2, ww // 2, 2, c)
    return [x4[:, :, i, :, j, :] for i in range(2) for j in range(2)]


def _pool_forward(x, pad_bottom: int, pad_right: int):
    # reduce_window: XLA's native path (0.04 ms vs 0.36 ms for the
    # reshape-max form at B=24 516²x64 on v5e); -inf-padded like
    # nn.max_pool's ceil mode
    return jax.lax.reduce_window(
        x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
        else jnp.iinfo(x.dtype).min,
        jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
        ((0, 0), (0, pad_bottom), (0, pad_right), (0, 0)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def max_pool_2x2(x, pad_bottom: int = 0, pad_right: int = 0):
    """2x2 stride-2 max pool of NHWC `x` (+ optional ceil-mode padding).

    Equals nn.max_pool(x, (2,2), strides=(2,2),
    padding=((0, pad_bottom), (0, pad_right))) in value and gradient;
    the backward is the dense first-max formulation above instead of
    XLA's select-and-scatter.
    """
    return _pool_forward(x, pad_bottom, pad_right)


def _fwd(x, pad_bottom, pad_right):
    y = _pool_forward(x, pad_bottom, pad_right)
    return y, (x, y)


def _bwd(pad_bottom, pad_right, res, g):
    x, y = res
    b, h, w, c = x.shape
    xp = x
    if pad_bottom or pad_right:
        xp = jnp.pad(x, ((0, 0), (0, pad_bottom), (0, pad_right), (0, 0)),
                     constant_values=-jnp.inf)
    if jax.default_backend() == "tpu" and c >= 16:
        dx = pool_bwd_pallas(xp, y, g)
    else:
        planes = _split_windows(xp)
        taken = jnp.zeros(g.shape, bool)
        grads = []
        for p in planes:
            e = (p == y) & ~taken
            taken |= e
            grads.append(jnp.where(e, g, 0).astype(x.dtype))
        # interleave the four planes back to (B, 2h', 2w', C)
        hp, wp = h + pad_bottom, w + pad_right
        dx = jnp.stack([jnp.stack(grads[:2], axis=3),
                        jnp.stack(grads[2:], axis=3)], axis=2)
        dx = dx.reshape(g.shape[0], hp, wp, c)
    if pad_bottom or pad_right:
        dx = dx[:, :h, :w, :]
    return (dx,)


max_pool_2x2.defvjp(_fwd, _bwd)


# --------------------------------------------------------------------------
# Pallas backward (TPU): the whole first-max mask computation in VMEM
# --------------------------------------------------------------------------

def _bwd_kernel(x_ref, g_ref, y_ref, out_ref, *, c):
    """Blocks arrive parity-decomposed by pure METADATA reshapes (no data
    movement): x as (1, tp, 2, w2, 2c) — row parity a middle dim, column
    parity folded into lanes ((2q+e)*C+ch ≡ q*2C + (e*C+ch) row-major) —
    so no strided slices, no minor-dim reshapes, and 2c = 128 lanes for
    pool1's C=64. Comparisons upcast to fp32 (Mosaic rejects bf16 cmpf in
    these layouts); bf16->f32 is exact so first-max selection is unchanged.
    """
    xe = x_ref[0, :, 0]                            # (tp, w2, 2c)
    xo = x_ref[0, :, 1]
    g = g_ref[0]                                   # (tp, w2, c)
    y = y_ref[0].astype(jnp.float32)
    e00 = xe[:, :, :c].astype(jnp.float32) == y    # window scan order
    e01 = (xe[:, :, c:].astype(jnp.float32) == y) & ~e00
    e10 = (xo[:, :, :c].astype(jnp.float32) == y) & ~e00 & ~e01
    e11 = ~(e00 | e01 | e10)
    z = jnp.zeros_like(g)
    dt = g.dtype
    out_ref[0, :, 0] = jnp.concatenate(
        [jnp.where(e00, g, z), jnp.where(e01, g, z)], axis=-1).astype(dt)
    out_ref[0, :, 1] = jnp.concatenate(
        [jnp.where(e10, g, z), jnp.where(e11, g, z)], axis=-1).astype(dt)


def pool_bwd_pallas(x, y, g, *, row_tile: int = 8, interpret: bool = False):
    """dx of y = 2x2/2 max pool (even extents), first-max semantics.

    x: (B, 2h, 2w, C); y, g: (B, h, w, C). Row tiles stream through VMEM;
    rows are padded to the tile multiple (x rows with -inf so the padded
    windows never match a real max; g rows with 0 so they contribute
    nothing), then sliced back.
    """
    b, hh, ww, c = x.shape
    h2, w2 = hh // 2, ww // 2
    tp = min(row_tile, h2)
    pad = (-h2) % tp
    if pad:
        x = jnp.pad(x, ((0, 0), (0, 2 * pad), (0, 0), (0, 0)),
                    constant_values=-jnp.inf)
        y = jnp.pad(y, ((0, 0), (0, pad), (0, 0), (0, 0)),
                    constant_values=-jnp.inf)
        g = jnp.pad(g, ((0, 0), (0, pad), (0, 0), (0, 0)))
    hp = h2 + pad
    n_tiles = hp // tp
    # parity-decomposed views: metadata-only reshapes (row-major layout)
    xr = x.reshape(b, hp, 2, w2, 2 * c)
    from jax.experimental import pallas as pl
    kern = functools.partial(_bwd_kernel, c=c)
    dx = pl.pallas_call(
        kern,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tp, 2, w2, 2 * c),
                         lambda bi, t: (bi, t, 0, 0, 0)),
            pl.BlockSpec((1, tp, w2, c), lambda bi, t: (bi, t, 0, 0)),
            pl.BlockSpec((1, tp, w2, c), lambda bi, t: (bi, t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tp, 2, w2, 2 * c),
                               lambda bi, t: (bi, t, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hp, 2, w2, 2 * c), x.dtype),
        interpret=interpret,
    )(xr, g, y)
    dx = dx.reshape(b, 2 * hp, ww, c)
    return dx[:, :hh] if pad else dx


def ceil_max_pool_2x2(x):
    """Ceil-mode 2x2/2 pool (reference models.py ceil_mode=True): pads odd
    extents bottom/right, like nn.max_pool with computed padding."""
    return max_pool_2x2(x, x.shape[1] % 2, x.shape[2] % 2)
