"""Masked segmentation losses (reference semantics: utils.py:19-102).

All losses operate on NHWC scores with integer (B, H, W) labels where label
< 0 means "ignore" (unlabeled pixels and — in this framework — static-shape
padding). Because every loss normalizes by the count of *valid* pixels,
padding variable-size images to a fixed XLA-friendly bucket leaves loss values
bit-identical to the reference's per-image computation (pad pixels carry
label -1 and contribute nothing).

Accumulation is float32 regardless of the score dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _valid_mask(target: jnp.ndarray) -> jnp.ndarray:
    # ignore -1 (unknown classes / padding); don't ignore 0 (reference utils.py:39)
    return target >= 0


def cross_entropy2d(score: jnp.ndarray, target: jnp.ndarray, *,
                    size_average: bool = False) -> jnp.ndarray:
    """Masked pixelwise cross-entropy (reference utils.py:19-48).

    score: (B, H, W, C) float; target: (B, H, W) int.
    Sums NLL over valid pixels; divides by valid-pixel count iff size_average.
    """
    logp = jax.nn.log_softmax(score.astype(jnp.float32), axis=-1)
    valid = _valid_mask(target)
    tgt = jnp.where(valid, target, 0)
    # one-hot multiply-sum instead of take_along_axis: the minor-dim gather
    # lowers catastrophically on TPU (measured 105 ms extra on a
    # 24x512^2x2 seenmask batch vs ~0 for the one-hot form). The where()
    # keeps it exact even when log_softmax hits -inf on non-target entries
    # (fp32 logit-gap overflow, e.g. diverged training): -inf * 0.0 would be
    # NaN, where the reference's gather only ever reads the target entry.
    onehot = jax.nn.one_hot(tgt, score.shape[-1], dtype=logp.dtype)
    nll = -jnp.sum(jnp.where(onehot > 0, logp, 0.0), axis=-1)
    loss = jnp.sum(jnp.where(valid, nll, 0.0))
    if size_average:
        loss = loss / jnp.maximum(jnp.sum(valid), 1).astype(jnp.float32)
    return loss


def mse_loss(score: jnp.ndarray, target: jnp.ndarray,
             target_embed: jnp.ndarray) -> jnp.ndarray:
    """Masked MSE between score and target embedding volumes (utils.py:50-73).

    score, target_embed: (B, H, W, C); target: (B, H, W) int.
    Sum of squared error over all channels of valid pixels, divided by the
    number of valid *pixels* (not pixel·channels — reference divides by
    mask.sum() over (n, h, w), utils.py:63,71).
    """
    valid = _valid_mask(target)
    d2 = jnp.sum(
        (score.astype(jnp.float32) - target_embed.astype(jnp.float32)) ** 2,
        axis=-1)
    n = jnp.maximum(jnp.sum(valid), 1).astype(jnp.float32)
    return jnp.sum(jnp.where(valid, d2, 0.0)) / n


def _l2_normalize(x: jnp.ndarray) -> jnp.ndarray:
    # The reference divides by the raw norm (utils.py:87-91); a zero-norm pixel
    # would NaN there and trip its NaN guard. We define 0/0 := 0 instead.
    # Double-where keeps sqrt away from 0 so the *backward* pass stays finite
    # at exactly-zero vectors (e.g. static-shape padding regions): the cheap
    # `where(norm==0, 1, norm)` form still NaNs in grad via 0 * d(sqrt(0)).
    norm2 = jnp.sum(x * x, axis=-1, keepdims=True)
    norm = jnp.sqrt(jnp.where(norm2 == 0, 1.0, norm2))
    return x / norm


def cosine_loss(score: jnp.ndarray, target: jnp.ndarray,
                target_embed: jnp.ndarray) -> jnp.ndarray:
    """Masked negative-cosine-similarity loss (reference utils.py:75-102).

    loss = (n_valid - sum over valid pixels of cos(score, target_embed)) / n_valid.
    """
    s = _l2_normalize(score.astype(jnp.float32))
    t = _l2_normalize(target_embed.astype(jnp.float32))
    valid = _valid_mask(target)
    cos = jnp.sum(s * t, axis=-1)
    n = jnp.maximum(jnp.sum(valid), 1).astype(jnp.float32)
    return (jnp.sum(valid).astype(jnp.float32)
            - jnp.sum(jnp.where(valid, cos, 0.0))) / n
