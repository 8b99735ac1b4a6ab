"""NNE inference vs numpy oracle — incl. zeroed-row quirk and stitching."""

import numpy as np
import jax.numpy as jnp

from zeroshotsemanticsegmentation_tpu.ops import (
    cosine_similarities, infer_labels, infer_labels_stitched,
    infer_labels_szn, infer_labels_forced_unseen)
from zeroshotsemanticsegmentation_tpu.ops.metrics import unseen_mask_vector


def oracle_infer(score, embed_arr):
    """Reference-semantics NNE: matmul, norm with zero-norm guard, argmax."""
    b, h, w, c = score.shape
    flat = score.reshape(-1, c).astype(np.float64)
    e = embed_arr.astype(np.float64)
    sims = flat @ e.T
    sn = np.linalg.norm(flat, axis=1, keepdims=True)
    en = np.linalg.norm(e, axis=1)[None, :]
    en = np.where(en == 0, 1.0, en)
    sn = np.where(sn == 0, 1.0, sn)
    return (sims / (sn * en)).argmax(axis=1).reshape(b, h, w)


def test_infer_labels_matches_oracle(rng):
    score = rng.randn(2, 6, 7, 20).astype(np.float32)
    embed = rng.randn(21, 20).astype(np.float32)
    got = np.asarray(infer_labels(jnp.asarray(score), jnp.asarray(embed)))
    np.testing.assert_array_equal(got, oracle_infer(score, embed))


def test_zero_norm_embedding_guard(rng):
    """A zeroed class row must yield similarity exactly 0, not NaN."""
    score = rng.randn(1, 3, 3, 8).astype(np.float32)
    embed = rng.randn(5, 8).astype(np.float32)
    embed[2] = 0.0
    sims = np.asarray(cosine_similarities(jnp.asarray(score), jnp.asarray(embed)))
    assert np.all(np.isfinite(sims))
    np.testing.assert_array_equal(sims[..., 2], 0.0)


def test_restricted_matches_zeroed_rows(rng):
    """class_mask restriction == reference's zeroed-row embedding matrices."""
    score = rng.randn(1, 5, 5, 10).astype(np.float32)
    embed = rng.randn(8, 10).astype(np.float32)
    unseen = [1, 6]
    seen_embed = embed.copy()
    seen_embed[unseen] = 0.0
    mask = unseen_mask_vector(8, unseen)
    got = np.asarray(infer_labels(jnp.asarray(score), jnp.asarray(embed),
                                  class_mask=jnp.asarray(~mask)))
    np.testing.assert_array_equal(got, oracle_infer(score, seen_embed))


def test_zeroed_row_can_win_when_all_sims_negative():
    """Reference quirk: masked classes score 0.0 and win over negative sims."""
    # single pixel whose embedding is anti-aligned with every live class
    embed = np.array([[1.0, 0.0], [0.0, 1.0], [0.7, 0.7]], np.float32)
    score = -np.ones((1, 1, 1, 2), np.float32)
    mask = unseen_mask_vector(3, [2])  # class 2 unseen
    got = int(infer_labels(jnp.asarray(score), jnp.asarray(embed),
                           class_mask=jnp.asarray(mask))[0, 0, 0])
    # only class 2 is live but scores negative; classes 0/1 are masked to 0.0
    # and argmax picks the first of them -> 0 (reference behavior)
    assert got == 0


def test_stitch_and_szn(rng):
    score = rng.randn(1, 4, 4, 6).astype(np.float32)
    embed = rng.randn(5, 6).astype(np.float32)
    unseen = [0, 3]
    mask = unseen_mask_vector(5, unseen)
    seen_embed, unseen_embed = embed.copy(), embed.copy()
    seen_embed[unseen] = 0.0
    unseen_embed[[i for i in range(5) if i not in unseen]] = 0.0

    pix_unseen = rng.rand(1, 4, 4) > 0.5
    want = oracle_infer(score, seen_embed)
    want[pix_unseen] = oracle_infer(score, unseen_embed)[pix_unseen]
    got = np.asarray(infer_labels_stitched(
        jnp.asarray(score), jnp.asarray(embed), jnp.asarray(mask),
        jnp.asarray(pix_unseen)))
    np.testing.assert_array_equal(got, want)

    # SZN: mask derived from 2-channel seenmask head argmax (0 = unseen)
    sm = rng.randn(1, 4, 4, 2).astype(np.float32)
    pix_unseen_szn = sm.argmax(-1) == 0
    want = oracle_infer(score, seen_embed)
    want[pix_unseen_szn] = oracle_infer(score, unseen_embed)[pix_unseen_szn]
    got = np.asarray(infer_labels_szn(
        jnp.asarray(score), jnp.asarray(sm), jnp.asarray(embed),
        jnp.asarray(mask)))
    np.testing.assert_array_equal(got, want)


def test_forced_unseen_oracle_mask(rng):
    score = rng.randn(1, 4, 4, 6).astype(np.float32)
    embed = rng.randn(5, 6).astype(np.float32)
    unseen = [2]
    mask = unseen_mask_vector(5, unseen)
    target = rng.randint(-1, 5, size=(1, 4, 4)).astype(np.int32)
    got = np.asarray(infer_labels_forced_unseen(
        jnp.asarray(score), jnp.asarray(target), jnp.asarray(embed),
        jnp.asarray(mask)))
    pix_unseen = np.isin(target, unseen)
    seen_embed, unseen_embed = embed.copy(), embed.copy()
    seen_embed[unseen] = 0.0
    unseen_embed[[i for i in range(5) if i not in unseen]] = 0.0
    want = oracle_infer(score, seen_embed)
    want[pix_unseen] = oracle_infer(score, unseen_embed)[pix_unseen]
    np.testing.assert_array_equal(got, want)
