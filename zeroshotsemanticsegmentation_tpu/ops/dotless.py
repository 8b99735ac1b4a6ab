"""Small contractions, dot-free WHEN THE POLICY SAYS SO (ops/dotpolicy.py).

House rule (CLAUDE.md): on this workspace's axon tunnel, compiling-or-loading
ANY XLA executable containing a `dot`/`dot_general` permanently collapses
host->device bandwidth (~1.5 GB/s -> ~15-40 MB/s; bisected in
scripts/probe_h2d.py), while convolutions, reduces, and Pallas kernels are
exempt. Under `dotpolicy.dot_free()` every contraction with a *small*
contracted or output axis in the hot programs therefore runs as an explicit
broadcast-multiply-reduce, which XLA fuses into a single pass (no
intermediate is materialized — the TPU backend was already lowering several
of these einsums to broadcast+multiply+reduce, see the optimized-HLO dump of
`hwio,i->o`), keeps autodiff dot-free (the VJPs are the same broadcast/
reduce shapes), and shards under GSPMD like any elementwise op. On a clean
TPU (policy off) the same functions emit the plain fp32-HIGHEST einsums —
the forms XLA tiles onto the MXU natively.

Numerics: products and accumulation in fp32 (matching the previous einsums'
`preferred_element_type=f32, precision=HIGHEST`); `select_rows` is exact in
any order because exactly one term per output is nonzero and adding 0.0
never rounds.

Large-K MXU-bound contractions (fc6's input gradient) use the Pallas matmul
twin in `ops/pdot.py` instead — the VPU multiply-reduce form would be
compute-bound there.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from zeroshotsemanticsegmentation_tpu.ops.dotpolicy import dot_free


def proj_rows(x: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """einsum("...c,kc->...k", x, m), fp32 out.

    x: (..., C); m: (K, C). Intended for small K·C (class projections:
    K, C ≲ a few hundred). Dot-free form: the virtual (..., K, C) broadcast
    fuses into the reduce, so HBM traffic is read x + write (..., K).
    MXU form: plain HIGHEST-precision einsum.
    """
    if not dot_free():
        return jnp.einsum("...c,kc->...k", x.astype(jnp.float32),
                          m.astype(jnp.float32),
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
    return jnp.sum(x.astype(jnp.float32)[..., None, :]
                   * m.astype(jnp.float32), axis=-1)


def select_rows(idx: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    """table[idx] for integer idx (...) over table (N, C) -> (..., C) fp32.

    Gather-free in BOTH modes (per-pixel gathers serialize on TPU — house
    rule): a one-hot selection whose single nonzero term makes it exact in
    every precision — multiply-reduce when dot-free, one-hot MXU matmul
    (HIGHEST, selecting fp32 values exactly) otherwise. idx must already be
    in [0, N).
    """
    onehot = jax.nn.one_hot(idx, table.shape[0], dtype=jnp.float32)
    if not dot_free():
        return jnp.einsum("...n,nc->...c", onehot, table.astype(jnp.float32),
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
    return jnp.sum(onehot[..., :, None] * table.astype(jnp.float32), axis=-2)


def matvec(x: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """einsum("...n,n->...", x, v), fp32 out."""
    if not dot_free():
        return jnp.einsum("...n,n->...", x.astype(jnp.float32),
                          v.astype(jnp.float32),
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
    return jnp.sum(x.astype(jnp.float32) * v.astype(jnp.float32), axis=-1)
