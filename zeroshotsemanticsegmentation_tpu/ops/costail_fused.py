"""Fused train-step tail: masked cosine loss + NNE argmax histogram +
score_sum in ONE pass over the full-res score volume, with a flash-style
recompute backward.

The stage-1 "cos" train step (reference trainer_fcn.py:147-170 semantics)
spends its non-conv time re-reading the (B, H, W, C) fp32 score volume:
the target-embedding select materializes a second full-res volume
(ops/dotless.select_rows), the normalize/cos/mask/reduce chain reads both,
NNE inference (ops/nne.infer_labels) reads the score again for the metric
histogram, and the backward re-reads everything. At B=24 512² that volume
is 503 MB and the tail measures ~16 ms/step fwd+bwd plus ~8 ms of
inference (PLAN.md round-3/4 profiles). All of it is elementwise or
tiny-K contractions around ONE large read — exactly one Pallas kernel.

Layout: TRANSPOSED — channels on sublanes, pixels on lanes. The kernel
consumes (B, C, H·W) tiles; the wrapper transposes from NHWC in XLA, where
the copy can fuse with the upsample producer/consumer. This matters: the
first cut of this kernel tiled (pixels, C) and measured *slower* than the
XLA tail it replaced (train step 224.8 vs 186.0 ms/step, A/B 2026-08-20),
because with 2048 pixels on sublanes every per-pixel VPU op costs T/8=256
vregs no matter that C=20 fills 20/128 lanes — per-pixel scalars like the
norm are (T, 1) and just as expensive. Transposed, per-pixel scalars are
(1, Tl) rows (Tl/128 vregs), the (C, Tl) elementwise work uses every lane,
and all four contractions are natural MXU dots:

  forward  (per (sample, pixel-tile) grid step, score read ONCE):
    t̂    = ê_targetᵀ(C,K) @ onehot(label)(K,Tl)   rows pre-normalized
    ŝ    = s / sqrt(where(‖s‖²==0, 1, ‖s‖²))       (zero-norm guard of
            ops/losses._l2_normalize — 0/0 := 0, grads finite)
    cosΣ += Σ_valid ŝ·t̂ ;  nvΣ += Σ valid          per-sample accumulators
    sims  = ê_infer(K,C) @ ŝ(C,Tl);  pred = first-max index over K
            (cosine argmax; tie layout matches ops/nne within fp32 rounding)
    hist += onehot(label)_validᵀ ⊗ onehot(pred) contracted over pixels
            (the one-hot reduction form of ops/metrics.confusion_matrix)
    ssum += Σ s                                      (the step's score_sum)
  loss_b = (nv_b - cosΣ_b) / max(nv_b, 1)            (reference
            utils.py:75-102, ÷ per-SAMPLE valid-pixel count)

  backward (recompute, score read once, d_score written once):
    d s = -(g_b / max(nv_b,1)) · valid · where(‖s‖²==0, t̂, (t̂ - cos·ŝ)/‖s‖)
          + g_ssum
    — the exact JAX autodiff of the double-where normalize above.

Oracle: jax.vmap(ops.losses.cosine_loss) + ops.nne.infer_labels +
ops.metrics.confusion_matrix (tests/test_costail_fused.py checks values
AND grads). Losses/targets follow reference utils.py:75-102; the histogram
follows reference utils.py:104-119; label < 0 = ignore everywhere.

Dot policy: all contractions here live INSIDE the Pallas kernel, which is
exempt from the axon-tunnel dot collapse (CLAUDE.md), so this path is safe
in both SZN_DOT_FREE modes and removes two stablehlo-level dot candidates
(the select/proj einsums) from the train program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE = 8192  # pixels per grid step (lane axis; multiple of 128)


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _normalize_rows(e: jnp.ndarray) -> jnp.ndarray:
    """ops/losses._l2_normalize over embedding rows (zero rows stay zero).
    Selecting a pre-normalized row is bit-identical to normalizing the
    selected per-pixel target (selection copies exactly)."""
    e = e.astype(jnp.float32)
    n2 = jnp.sum(e * e, axis=-1, keepdims=True)
    return e / jnp.sqrt(jnp.where(n2 == 0, 1.0, n2))


def _common(score_ref, lbl_ref, tembT_ref, hw: int):
    """Shared fwd/bwd recompute: loads one (C, Tl) score tile and derives
    the per-pixel (1, Tl) quantities both passes need."""
    j = pl.program_id(1)
    s = score_ref[0].astype(jnp.float32)                     # (C, Tl)
    _, tl = s.shape
    lbl = lbl_ref[0].astype(jnp.int32)                       # (1, Tl)
    # in-bounds mask: the last tile of a sample may read past H*W — those
    # lanes carry unspecified data (compiled) or zeros (interpreted; zero
    # label would count as valid) and must be dead either way
    pix = jax.lax.broadcasted_iota(jnp.int32, (1, tl), 1) + j * tl
    inb = pix < hw                                           # (1, Tl)
    valid = (lbl >= 0) & inb
    k = tembT_ref.shape[1]
    kcol = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)
    oh_t = (lbl == kcol).astype(jnp.float32)                 # (K, Tl)
    t_hat = jnp.dot(tembT_ref[:], oh_t, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)     # (C, Tl)
    s = jnp.where(inb, s, 0.0)  # kill OOB garbage (incl. NaN/Inf) at source
    r2 = jnp.sum(s * s, axis=0, keepdims=True)               # (1, Tl)
    norm = jnp.sqrt(jnp.where(r2 == 0, 1.0, r2))
    sn = s / norm
    cos = jnp.sum(sn * t_hat, axis=0, keepdims=True)         # (1, Tl)
    vf = valid.astype(jnp.float32)
    return s, lbl, inb, vf, t_hat, r2, norm, sn, cos, kcol


def _fwd_kernel(score_ref, lbl_ref, tembT_ref, iemb_ref,
                nv_ref, cos_ref, hist_ref, ssum_ref, *, hw: int, n: int):
    b, j = pl.program_id(0), pl.program_id(1)
    s, lbl, inb, vf, t_hat, r2, norm, sn, cos, kcol = _common(
        score_ref, lbl_ref, tembT_ref, hw)

    # outputs are full-array blocks (TPU requires (8,128)-divisible or
    # full-dim blocks); they persist across the whole grid, so zero once
    @pl.when((b == 0) & (j == 0))
    def _():
        for bb in range(nv_ref.shape[0]):  # SMEM takes scalar stores only
            nv_ref[bb, 0] = 0.0
            cos_ref[bb, 0] = 0.0
        ssum_ref[0, 0] = 0.0
        hist_ref[...] = jnp.zeros_like(hist_ref)

    nv_ref[b, 0] += jnp.sum(vf)
    cos_ref[b, 0] += jnp.sum(vf * cos)
    ssum_ref[0, 0] += jnp.sum(s)  # s already zeroed outside hw

    # NNE argmax over ê_infer rows as max + first-matching-index over the
    # K sublanes (Mosaic cannot legalize a vector argmax here; identical
    # first-tie semantics to ops/nne's jnp.argmax)
    sims = jnp.dot(iemb_ref[:], sn, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)      # (K, Tl)
    colmax = jnp.max(sims, axis=0, keepdims=True)            # (1, Tl)
    pred = jnp.min(jnp.where(sims == colmax, kcol, n),
                   axis=0, keepdims=True)                    # (1, Tl)
    oh_p = (pred == kcol).astype(jnp.float32)                # (K, Tl)
    oh_tv = (lbl == kcol).astype(jnp.float32) * vf           # valid cols only
    # per-tile counts are exact in f32 (≤ Tl < 2^24); accumulate in int32
    tile_hist = jax.lax.dot_general(
        oh_tv, oh_p, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (n, n)
    hist_ref[...] += tile_hist.astype(jnp.int32)


def _bwd_kernel(score_ref, lbl_ref, tembT_ref, g_ref, nv_ref, gss_ref,
                ds_ref, *, hw: int):
    b = pl.program_id(0)
    s, lbl, inb, vf, t_hat, r2, norm, sn, cos, kcol = _common(
        score_ref, lbl_ref, tembT_ref, hw)
    nv = jnp.maximum(nv_ref[b, 0], 1.0)
    coef = -(g_ref[b, 0] / nv)
    # exact autodiff of the double-where normalize: at ‖s‖²==0 the norm is
    # the constant 1.0 branch, so d cos/d s = t̂ there
    dcos = jnp.where(r2 == 0, t_hat, (t_hat - cos * sn) / norm)
    ds = coef * vf * dcos + gss_ref[0, 0] * inb.astype(jnp.float32)
    ds_ref[0] = ds.astype(ds_ref.dtype)


def _pick_tile(hw: int, tile: int) -> int:
    if hw <= tile:
        return hw  # one full block (equal-to-array dims is always legal)
    return tile  # multiple of 128; the last block OOB-masks


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _cos_tail(scoreT, label8, tembT_n, iemb_n, num_classes, tile, interpret):
    out, _ = _cos_tail_fwd(scoreT, label8, tembT_n, iemb_n, num_classes,
                           tile, interpret)
    return out


def _cos_tail_fwd(scoreT, label8, tembT_n, iemb_n, num_classes, tile,
                  interpret):
    b, c, hw = scoreT.shape
    k = iemb_n.shape[0]
    n = num_classes
    t = _pick_tile(hw, tile)
    grid_j = -(-hw // t)
    nv, cossum, hist, ssum = pl.pallas_call(
        functools.partial(_fwd_kernel, hw=hw, n=n),
        grid=(b, grid_j),
        in_specs=[
            pl.BlockSpec((1, c, t), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, k), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            # full-array blocks with constant index maps: one persistent
            # accumulator buffer across the whole grid
            pl.BlockSpec((b, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((b, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n, n), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, n), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(scoreT, label8, tembT_n, iemb_n)
    nv = nv[:, 0]
    losses = (nv - cossum[:, 0]) / jnp.maximum(nv, 1.0)
    out = (losses, hist, ssum[0, 0])
    return out, (scoreT, label8, tembT_n, nv)


def _cos_tail_bwd(num_classes, tile, interpret, res, g):
    scoreT, label8, tembT_n, nv = res
    g_losses, _g_hist, g_ssum = g
    b, c, hw = scoreT.shape
    k = tembT_n.shape[1]
    t = _pick_tile(hw, tile)
    grid_j = -(-hw // t)
    # d loss_b / d cosΣ_b = -1/max(nv,1) is applied in-kernel; g carries
    # d(final)/d loss_b directly
    g2 = g_losses.astype(jnp.float32).reshape(b, 1)
    nv2 = nv.astype(jnp.float32).reshape(b, 1)
    gss = jnp.asarray(g_ssum, jnp.float32).reshape(1, 1)
    ds = pl.pallas_call(
        functools.partial(_bwd_kernel, hw=hw),
        grid=(b, grid_j),
        in_specs=[
            pl.BlockSpec((1, c, t), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, k), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((b, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, c, t), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(scoreT.shape, scoreT.dtype),
        interpret=interpret,
    )(scoreT, label8, tembT_n, g2, nv2, gss)
    return ds, None, jnp.zeros_like(tembT_n), None


_cos_tail.defvjp(_cos_tail_fwd, _cos_tail_bwd)


def fused_cos_tail(score, label, target_embeddings, infer_embeddings,
                   num_classes: int, *, tile: int = DEFAULT_TILE,
                   interpret: bool | None = None, mesh=None):
    """(per-sample cosine losses (B,), confusion hist (n, n) int32,
    score_sum scalar f32) from an NHWC score volume in one fused pass.

    Differentiable in `score` (losses AND score_sum contribute); the
    embedding matrices are treated as constants (they are host-side assets
    in every trainer — train/steps.py `_host_const`). Matches, with fp32
    accumulation-order tolerance:
      losses    == jax.vmap(lambda s, l: cosine_loss(s[None], l[None], E[l]))
      hist      == confusion_matrix(label, infer_labels(score, iemb), n)
      score_sum == jnp.sum(score.astype(f32))

    `mesh`: GSPMD cannot partition a pallas_call body, so under a mesh the
    un-mapped kernel would run on fully regathered inputs on every device.
    Like the serving kernel (ops/szn_fused._fused_call), the tail instead
    shard_maps over the batch-sharding axes: each device runs the
    single-chip kernel on its local batch slice (embeddings replicated),
    then the batch-summed outputs (hist, score_sum) psum over those axes
    while the per-sample losses stay batch-sharded. Autodiff composes —
    the custom_vjp backward also runs per shard, no collectives needed
    (per-sample losses only touch local samples).
    """
    b, h, w, c = score.shape
    if num_classes != target_embeddings.shape[0] or \
            num_classes != infer_embeddings.shape[0]:
        raise ValueError(
            f"num_classes {num_classes} != embedding rows "
            f"{target_embeddings.shape[0]}/{infer_embeddings.shape[0]}")
    if num_classes > 127:
        raise ValueError("int8 label feed caps classes at 127")
    if interpret is None:
        interpret = _interpret_default()
    tembT_n = _normalize_rows(jnp.asarray(target_embeddings)).T  # (C, K)
    iemb_n = _normalize_rows(jnp.asarray(infer_embeddings))      # (K, C)
    hw = h * w

    def local(score, label, tembT_n, iemb_n):
        lb = score.shape[0]
        # NCHW for the kernel (pixels on lanes); XLA fuses this transpose
        # with the upsample producer / backward consumer where possible
        scoreT = jnp.transpose(score.reshape(lb, hw, c), (0, 2, 1))
        label8 = jnp.clip(label.reshape(lb, 1, hw), -1, 127).astype(jnp.int8)
        return _cos_tail(scoreT, label8, tembT_n, iemb_n,
                         num_classes, tile, bool(interpret))

    if mesh is None or (mesh.shape.get("data", 1)
                        * mesh.shape.get("slice", 1)) == 1:
        return local(score, label, tembT_n, iemb_n)

    from jax.sharding import PartitionSpec as P
    from zeroshotsemanticsegmentation_tpu.parallel.mesh import data_axes
    axes = data_axes(mesh)
    n_shards = int(np.prod([mesh.shape[a] for a in axes]))
    if b % n_shards:
        raise ValueError(
            f"fused_cos_tail: batch {b} not divisible by the mesh's "
            f"{n_shards} batch shards {axes}")

    def fn(score, label, tembT_n, iemb_n):
        losses, hist, ssum = local(score, label, tembT_n, iemb_n)
        return (losses, jax.lax.psum(hist, axes), jax.lax.psum(ssum, axes))

    bspec = P(axes)
    return jax.shard_map(fn, mesh=mesh,
                         in_specs=(bspec, bspec, P(), P()),
                         out_specs=(bspec, P(), P()), check_vma=False)(
        score, label, tembT_n, iemb_n)


def fused_tail_enabled() -> bool:
    """Policy: `SZN_FUSED_TAIL` = auto (default: on when the backend is
    TPU) | 1 | 0. Mirrors ops/dotpolicy.py's shape: a mode, not an
    identity — the XLA path stays the semantic definition."""
    import os
    v = os.environ.get("SZN_FUSED_TAIL", "auto").lower()
    if v in ("1", "true", "on"):
        return True
    if v in ("0", "false", "off"):
        return False
    return jax.default_backend() == "tpu"
