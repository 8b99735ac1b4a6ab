"""Nearest-neighbor-embedding (NNE) zero-shot inference — XLA path.

Reference semantics (utils.py:156-205): per-pixel cosine similarity between
the regressed embedding and each class embedding, argmax over classes. For
seen/unseen stitching the reference builds copies of the embedding matrix with
the other partition's rows zeroed (trainer_fcn.py:56-64); a zeroed row yields
similarity exactly 0 (its norm is guarded to 1, utils.py:175) and *still
participates in the argmax* — if every live class has negative cosine
similarity, a zeroed row wins. That quirk is load-bearing for parity, so the
restricted argmax here masks similarities to 0.0, not -inf.

This module is the straight-line XLA implementation (single fused program
under jit); `szn_fused.py` provides the hand-fused Pallas kernel for the hot
eval path. Both share these semantics and are cross-checked in tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cosine_similarities(score: jnp.ndarray, embeddings: jnp.ndarray) -> jnp.ndarray:
    """Cosine similarity of each pixel vector against each class embedding.

    score: (..., C) float; embeddings: (K, C) float -> (..., K) float32.
    Zero-norm embeddings get norm 1 (reference utils.py:175); zero-norm score
    vectors likewise (the reference would produce NaNs there).
    """
    from zeroshotsemanticsegmentation_tpu.ops.dotless import proj_rows
    s = score.astype(jnp.float32)
    e = embeddings.astype(jnp.float32)
    # fp32 contraction via ops.dotless (policy-selected lowering): the TPU
    # default bf16-level matmul would flip argmaxes between near-tied
    # classes vs the fp32 reference, so both forms accumulate fp32; the
    # dot-free form additionally keeps the program safe on the axon tunnel
    # (CLAUDE.md / scripts/probe_h2d.py)
    sims = proj_rows(s, e)
    # double-where: keeps the (rarely used) backward pass finite at zero norms
    s_norm2 = jnp.sum(s * s, axis=-1, keepdims=True)
    e_norm2 = jnp.sum(e * e, axis=-1)
    s_norm = jnp.sqrt(jnp.where(s_norm2 == 0, 1.0, s_norm2))
    e_norm = jnp.sqrt(jnp.where(e_norm2 == 0, 1.0, e_norm2))
    return sims / (s_norm * e_norm)


def _restricted_argmax(sims: jnp.ndarray, class_mask: jnp.ndarray | None) -> jnp.ndarray:
    """Argmax over classes; masked-out classes score exactly 0.0 (see module doc)."""
    if class_mask is not None:
        sims = jnp.where(class_mask, sims, 0.0)
    return jnp.argmax(sims, axis=-1).astype(jnp.int32)


def infer_labels(score: jnp.ndarray, embeddings: jnp.ndarray,
                 class_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """NNE label map: (B, H, W, C) score × (K, C) embeddings -> (B, H, W) int32.

    `class_mask` (K,) bool restricts inference to a class subset the way the
    reference's zeroed-row embedding matrices do (utils.py:159-185 +
    trainer_fcn.py:56-64).
    """
    return _restricted_argmax(cosine_similarities(score, embeddings), class_mask)


def infer_labels_stitched(score: jnp.ndarray, embeddings: jnp.ndarray,
                          unseen_class_mask: jnp.ndarray,
                          pixel_unseen_mask: jnp.ndarray) -> jnp.ndarray:
    """Composite prediction (reference stich_seen_unseen_with_mask, utils.py:201-205).

    Seen-restricted NNE where the pixel is predicted seen, unseen-restricted
    NNE where predicted unseen. One similarity matmul serves both argmaxes.
    """
    sims = cosine_similarities(score, embeddings)
    seen_lbl = _restricted_argmax(sims, ~unseen_class_mask)
    unseen_lbl = _restricted_argmax(sims, unseen_class_mask)
    return jnp.where(pixel_unseen_mask, unseen_lbl, seen_lbl)


def infer_labels_szn(fcn_score: jnp.ndarray, seenmask_score: jnp.ndarray,
                     embeddings: jnp.ndarray,
                     unseen_class_mask: jnp.ndarray) -> jnp.ndarray:
    """Full seenmask-zeroshot-network inference (reference utils.py:195-199).

    The 2-channel seenmask head's argmax (1 = seen) gates which class
    partition each pixel classifies against.
    """
    pixel_unseen = jnp.argmax(seenmask_score, axis=-1) == 0
    return infer_labels_stitched(fcn_score, embeddings, unseen_class_mask,
                                 pixel_unseen)


def infer_labels_forced_unseen(score: jnp.ndarray, target: jnp.ndarray,
                               embeddings: jnp.ndarray,
                               unseen_class_mask: jnp.ndarray) -> jnp.ndarray:
    """Oracle stitching from ground-truth membership (reference utils.py:188-192)."""
    tgt_safe = jnp.clip(target, 0, embeddings.shape[0] - 1)
    # Gather-free lookup of mask[tgt]: compare against class iota and reduce.
    # (Per-pixel gathers serialize on TPU; unseen_class_mask may be a host np
    # array — jnp.asarray inlines it as a literal, keeping the program
    # device-const-free.)
    mask = jnp.asarray(unseen_class_mask, dtype=bool)
    k_iota = jnp.arange(embeddings.shape[0], dtype=jnp.int32)
    pixel_unseen = jnp.any((tgt_safe[..., None] == k_iota) & mask, axis=-1)
    pixel_unseen = pixel_unseen & (target >= 0)
    return infer_labels_stitched(score, embeddings, unseen_class_mask,
                                 pixel_unseen)
