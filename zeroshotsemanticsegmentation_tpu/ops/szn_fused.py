"""Fully-fused SZN inference: class projection + bilinear upsample + stitched
argmax from the 1/32-resolution heads — full-res score volumes never exist.

Algebra: the ×32 bilinear upscore is linear and per-channel, and the class
projection is per-pixel linear, so they commute:

    upsample(score) · ê_k  ==  upsample(score · ê_k)        (ê = e/‖e‖)

and the per-pixel score norm is argmax-invariant. The
same holds for the seenmask gate: sign(upsample(s₀-s₁)) == seenmask argmax of
the upsampled head. So SZN inference needs only the (B, h₃₂, w₃₂, C) raw
heads:

  1. XLA pre-stage (tiny tensors): sims_small = score_small @ êᵀ, gate_small
     appended as an extra "class" row, row-axis upsample via the interp
     matrix → (B, out_h, K+1, w₃₂) ≈ a few MB.
  2. Pallas kernel: per output-row tile, column-upsample via one (K+1, w₃₂) ×
     (w₃₂, out_w) MXU dot, masked seen/unseen argmaxes (reference
     masked-class-= 0.0 semantics), gate select — emits int32 labels.

HBM traffic for B=16 512²: ~28 MB total vs ~700 MB for the unfused path
(materialized score + seenmask volumes + NNE reads).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zeroshotsemanticsegmentation_tpu.ops.bilinear import (
    _axis_upsample, upsample_matrix)

_UPSAMPLE_STRIDE = 32
_UPSAMPLE_KERNEL = 64
_CROP_OFFSET = 19

DEFAULT_ROW_TILE = 64


def _kernel(rows_ref, mw_ref, seen_ref, unseen_ref, fill_ref, out_ref):
    ty, kp1, w32 = rows_ref.shape
    out_w = mw_ref.shape[1]
    # ONE batched MXU dot for the whole row tile (a per-row fori of tiny dots
    # was latency-bound: 17x the bandwidth floor on v5e)
    s = rows_ref[...].reshape(ty * kp1, w32)
    up = jnp.dot(s, mw_ref[:], preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)  # (TY*(K+1), out_w)
    u3 = up.reshape(ty, kp1, out_w)
    # fill: 0.0 for excluded real classes (reference zeroed-row quirk),
    # -1e30 for the appended gate row so it can never win an argmax
    seen_vals = jnp.where(seen_ref[:][None, :, :] != 0, u3, fill_ref[:][None])
    unseen_vals = jnp.where(unseen_ref[:][None, :, :] != 0, u3,
                            fill_ref[:][None])
    seen_arg = jnp.argmax(seen_vals, axis=1).astype(jnp.int32)    # (TY, out_w)
    unseen_arg = jnp.argmax(unseen_vals, axis=1).astype(jnp.int32)
    gate_row = jax.lax.slice_in_dim(u3, kp1 - 1, kp1, axis=1)[:, 0, :]
    out_ref[...] = jnp.where(gate_row >= 0.0, unseen_arg, seen_arg)


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.jit, static_argnames=("out_h", "out_w", "row_tile",
                                             "interpret", "dot_free_mode"))
def _fused(score_small, gate_small, embed_scaled, seen_mask, unseen_mask,
           fill, out_h: int, out_w: int, row_tile: int, interpret: bool,
           dot_free_mode: bool = True):
    b, h32, w32, c = score_small.shape
    k = embed_scaled.shape[0]
    del dot_free_mode  # cache key only — proj_rows/_axis_upsample branch on
    # the same process-level policy this value was read from (dotpolicy.py)

    # Pre-stage, policy-selected lowering (ops/dotpolicy.py): dot-free on
    # the axon tunnel (any XLA dot collapses H2D bandwidth — CLAUDE.md):
    # class projection as a fused multiply-reduce, row-axis upsample as the
    # 2-tap blend of ops.bilinear; MXU HIGHEST-precision einsums on clean
    # TPUs. Both fp32, bit-identical. The (k, w) transpose happens on the
    # tiny 1/32-res tensor, before the 32x row expansion.
    from zeroshotsemanticsegmentation_tpu.ops.dotless import proj_rows
    sims = proj_rows(score_small, embed_scaled)
    aug = jnp.concatenate([sims, gate_small[..., None]], axis=-1)  # K+1

    mw = jnp.asarray(upsample_matrix(w32, _UPSAMPLE_STRIDE, _UPSAMPLE_KERNEL,
                                     _CROP_OFFSET, out_w)).T  # (w32, out_w)
    rows = _axis_upsample(jnp.transpose(aug, (0, 1, 3, 2)), 1,
                          stride=_UPSAMPLE_STRIDE,
                          kernel_size=_UPSAMPLE_KERNEL,
                          crop_offset=_CROP_OFFSET, out_len=out_h)
    n_rows = b * out_h
    pad = (-n_rows) % row_tile
    flat = rows.reshape(n_rows, k + 1, w32)
    if pad:
        flat = jnp.pad(flat, ((0, pad), (0, 0), (0, 0)))

    out = pl.pallas_call(
        _kernel,
        grid=((n_rows + pad) // row_tile,),
        in_specs=[
            pl.BlockSpec((row_tile, k + 1, w32), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w32, out_w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k + 1, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k + 1, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k + 1, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((row_tile, out_w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_rows + pad, out_w), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * (n_rows + pad) * (k + 1) * w32 * out_w,
            bytes_accessed=(n_rows + pad) * ((k + 1) * w32 * 4 + out_w * 4),
            transcendentals=0),
        interpret=interpret,
    )(flat, mw, seen_mask, unseen_mask, fill)
    return out[:n_rows].reshape(b, out_h, out_w)


def _fused_call(score_small, gate_small, embed_scaled, seen, unseen, fill,
                out_h: int, out_w: int, row_tile: int, interpret: bool,
                mesh=None):
    """Dispatch to _fused, optionally shard_mapped over the mesh 'data' axis.

    GSPMD cannot partition a pallas_call body, so under a mesh the un-mapped
    kernel would run on fully regathered inputs on every device. shard_map
    instead runs the kernel per data shard on the local batch slice (heads
    batch-sharded, embedding/mask operands replicated) — the same program a
    single chip runs, b/n_data at a time, with no collectives inside."""
    from zeroshotsemanticsegmentation_tpu.ops.dotpolicy import dot_free
    df = dot_free()
    if mesh is None or (mesh.shape.get("data", 1)
                        * mesh.shape.get("slice", 1)) == 1:
        return _fused(score_small, gate_small, embed_scaled, seen, unseen,
                      fill, out_h, out_w, row_tile, interpret,
                      dot_free_mode=df)
    from jax.sharding import PartitionSpec as P
    from zeroshotsemanticsegmentation_tpu.parallel.mesh import data_axes
    fn = functools.partial(_fused, out_h=out_h, out_w=out_w,
                           row_tile=row_tile, interpret=interpret,
                           dot_free_mode=df)
    b = P(data_axes(mesh))  # ('slice','data') jointly on multi-slice meshes
    return jax.shard_map(fn, mesh=mesh,
                         in_specs=(b, b, P(), P(), P(), P()),
                         out_specs=b, check_vma=False)(
        score_small, gate_small, embed_scaled, seen, unseen, fill)


def infer_labels_nne_fused(score_small: jnp.ndarray,
                           embeddings: jnp.ndarray,
                           out_hw: tuple[int, int],
                           *, row_tile: int = DEFAULT_ROW_TILE,
                           interpret: bool | None = None,
                           mesh=None) -> jnp.ndarray:
    """Plain (unstitched) NNE from the raw head — reference infer_lbl
    (utils.py:159-185) over ALL classes, fused like infer_labels_szn_fused.

    Reuses the SZN kernel with an always-negative gate (the bilinear
    upsample of a constant -1 field stays < 0 everywhere, so the seen branch
    — here: every class — always wins) and an empty unseen partition.
    Equivalent to ops.nne.infer_labels(upsample(score), embeddings).
    """
    e = embeddings.astype(jnp.float32)
    norm2 = jnp.sum(e * e, axis=1, keepdims=True)
    embed_scaled = e / jnp.sqrt(jnp.where(norm2 == 0, 1.0, norm2))
    k = e.shape[0]
    seen = jnp.concatenate([jnp.ones((k,), jnp.float32),
                            jnp.zeros((1,), jnp.float32)])[:, None]
    unseen = jnp.zeros((k + 1, 1), jnp.float32)
    fill = jnp.concatenate([jnp.zeros((k,), jnp.float32),
                            jnp.full((1,), -1e30, jnp.float32)])[:, None]
    gate_small = jnp.full(score_small.shape[:-1], -1.0, jnp.float32)
    return _fused_call(
        score_small, gate_small, embed_scaled, seen, unseen, fill,
        int(out_hw[0]), int(out_hw[1]), row_tile,
        _interpret_default() if interpret is None else interpret, mesh)


def infer_labels_szn_fused(score_small: jnp.ndarray,
                           seenmask_small: jnp.ndarray,
                           embeddings: jnp.ndarray,
                           unseen_class_mask,
                           out_hw: tuple[int, int],
                           *, row_tile: int = DEFAULT_ROW_TILE,
                           interpret: bool | None = None,
                           mesh=None) -> jnp.ndarray:
    """SZN labels from raw (1/32-res) heads (model mode='raw').

    Equivalent to upsampling both heads and running
    ops.nne.infer_labels_szn — validated against it in tests.
    """
    e = embeddings.astype(jnp.float32)
    norm2 = jnp.sum(e * e, axis=1, keepdims=True)
    embed_scaled = e / jnp.sqrt(jnp.where(norm2 == 0, 1.0, norm2))
    k = e.shape[0]
    unseen_vec = jnp.asarray(unseen_class_mask)
    # gate occupies the appended row K: excluded from both class partitions
    seen = jnp.concatenate([(~unseen_vec).astype(jnp.float32),
                            jnp.zeros((1,), jnp.float32)])[:, None]
    unseen = jnp.concatenate([unseen_vec.astype(jnp.float32),
                              jnp.zeros((1,), jnp.float32)])[:, None]
    fill = jnp.concatenate([jnp.zeros((k,), jnp.float32),
                            jnp.full((1,), -1e30, jnp.float32)])[:, None]
    gate_small = (seenmask_small[..., 0]
                  - seenmask_small[..., 1]).astype(jnp.float32)
    assert embed_scaled.shape == (k, score_small.shape[-1])
    return _fused_call(
        score_small, gate_small, embed_scaled, seen, unseen, fill,
        int(out_hw[0]), int(out_hw[1]), row_tile,
        _interpret_default() if interpret is None else interpret, mesh)
