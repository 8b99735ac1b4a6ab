"""Losses vs hand-computed numpy oracles, incl. masking and pad invariance."""

import numpy as np
import jax.numpy as jnp

from zeroshotsemanticsegmentation_tpu.ops import (
    cross_entropy2d, mse_loss, cosine_loss)


def np_log_softmax(x):
    x = x - x.max(axis=-1, keepdims=True)
    return x - np.log(np.exp(x).sum(axis=-1, keepdims=True))


def make_case(rng, b=2, h=5, w=6, c=4, n_class=4, ignore_frac=0.3):
    score = rng.randn(b, h, w, c).astype(np.float32)
    target = rng.randint(0, n_class, size=(b, h, w)).astype(np.int32)
    target[rng.rand(b, h, w) < ignore_frac] = -1
    embed = rng.randn(n_class, c).astype(np.float32)
    tgt_embed = embed[np.clip(target, 0, None)]
    return score, target, tgt_embed


def test_cross_entropy_sum_and_average(rng):
    score, target, _ = make_case(rng)
    logp = np_log_softmax(score.astype(np.float64))
    valid = target >= 0
    want_sum = -logp[valid, target[valid]].sum()
    got_sum = float(cross_entropy2d(jnp.asarray(score), jnp.asarray(target)))
    np.testing.assert_allclose(got_sum, want_sum, rtol=1e-5)
    got_avg = float(cross_entropy2d(jnp.asarray(score), jnp.asarray(target),
                                    size_average=True))
    np.testing.assert_allclose(got_avg, want_sum / valid.sum(), rtol=1e-5)


def test_mse_divides_by_pixel_count(rng):
    score, target, tgt_embed = make_case(rng)
    valid = target >= 0
    want = (((score - tgt_embed) ** 2).sum(axis=-1) * valid).sum() / valid.sum()
    got = float(mse_loss(jnp.asarray(score), jnp.asarray(target),
                         jnp.asarray(tgt_embed)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_cosine_loss_oracle(rng):
    score, target, tgt_embed = make_case(rng)
    valid = target >= 0

    def norm(x):
        n = np.linalg.norm(x, axis=-1, keepdims=True)
        return x / np.where(n == 0, 1, n)

    cos = (norm(score) * norm(tgt_embed)).sum(axis=-1)
    want = (valid.sum() - cos[valid].sum()) / valid.sum()
    got = float(cosine_loss(jnp.asarray(score), jnp.asarray(target),
                            jnp.asarray(tgt_embed)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_padding_invariance(rng):
    """Padding images with label -1 must not change any loss value."""
    score, target, tgt_embed = make_case(rng, ignore_frac=0.0)
    pad_s = np.pad(score, ((0, 0), (0, 3), (0, 2), (0, 0)))
    pad_t = np.pad(target, ((0, 0), (0, 3), (0, 2)), constant_values=-1)
    pad_e = np.pad(tgt_embed, ((0, 0), (0, 3), (0, 2), (0, 0)))
    for fn, args, pargs in [
        (cross_entropy2d, (score, target), (pad_s, pad_t)),
        (mse_loss, (score, target, tgt_embed), (pad_s, pad_t, pad_e)),
        (cosine_loss, (score, target, tgt_embed), (pad_s, pad_t, pad_e)),
    ]:
        a = float(fn(*[jnp.asarray(x) for x in args]))
        b = float(fn(*[jnp.asarray(x) for x in pargs]))
        np.testing.assert_allclose(a, b, rtol=1e-6)


def test_all_ignored_is_finite():
    score = jnp.ones((1, 2, 2, 3))
    target = -jnp.ones((1, 2, 2), jnp.int32)
    embed = jnp.ones((1, 2, 2, 3))
    assert np.isfinite(float(cross_entropy2d(score, target, size_average=True)))
    assert np.isfinite(float(mse_loss(score, target, embed)))
    assert np.isfinite(float(cosine_loss(score, target, embed)))
