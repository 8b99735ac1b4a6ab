"""Pallas fused NNE kernel vs the XLA semantic definition (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from zeroshotsemanticsegmentation_tpu.ops import (
    infer_labels, infer_labels_szn)
from zeroshotsemanticsegmentation_tpu.ops.metrics import unseen_mask_vector
from zeroshotsemanticsegmentation_tpu.ops.nne_pallas import (
    infer_labels_pallas, infer_labels_szn_pallas)


def make_case(rng, b=2, h=17, w=23, c=20, k=21):
    score = rng.randn(b, h, w, c).astype(np.float32)
    embed = rng.randn(k, c).astype(np.float32)
    embed /= np.linalg.norm(embed, axis=1, keepdims=True)
    sm = rng.randn(b, h, w, 2).astype(np.float32)
    return jnp.asarray(score), jnp.asarray(embed), jnp.asarray(sm)


@pytest.mark.parametrize("k,c", [(21, 20), (33, 20), (21, 300)])
def test_full_argmax_matches_xla(rng, k, c):
    score, embed, _ = make_case(rng, k=k, c=c)
    want = np.asarray(infer_labels(score, embed))
    got = np.asarray(infer_labels_pallas(score, embed, tile=256))
    np.testing.assert_array_equal(got, want)


def test_restricted_argmax_matches_xla(rng):
    score, embed, _ = make_case(rng)
    mask = jnp.asarray(~unseen_mask_vector(21, [1, 13]))
    want = np.asarray(infer_labels(score, embed, class_mask=mask))
    got = np.asarray(infer_labels_pallas(score, embed, class_mask=mask,
                                         tile=256))
    np.testing.assert_array_equal(got, want)


def test_szn_matches_xla(rng):
    score, embed, sm = make_case(rng)
    unseen_vec = jnp.asarray(unseen_mask_vector(21, [1, 6, 13]))
    want = np.asarray(infer_labels_szn(score, sm, embed, unseen_vec))
    got = np.asarray(infer_labels_szn_pallas(score, sm, embed, unseen_vec,
                                             tile=256))
    np.testing.assert_array_equal(got, want)


def test_non_tile_multiple_and_zero_rows(rng):
    """Pixel count not divisible by tile; zero-norm score rows; zero embed row."""
    score, embed, sm = make_case(rng, b=1, h=13, w=11)
    score = score.at[0, :5].set(0.0)
    embed = embed.at[2].set(0.0)
    unseen_vec = jnp.asarray(unseen_mask_vector(21, [2, 13]))
    want = np.asarray(infer_labels_szn(score, sm, embed, unseen_vec))
    got = np.asarray(infer_labels_szn_pallas(score, sm, embed, unseen_vec,
                                             tile=512))
    np.testing.assert_array_equal(got, want)


def test_all_negative_sims_unrestricted(rng):
    """Padded class columns must not win the unrestricted argmax."""
    embed = np.array([[1.0, 0.0], [0.0, 1.0], [0.5, 0.5]], np.float32)
    score = -np.ones((1, 4, 4, 2), np.float32)
    want = np.asarray(infer_labels(jnp.asarray(score), jnp.asarray(embed)))
    got = np.asarray(infer_labels_pallas(jnp.asarray(score),
                                         jnp.asarray(embed), tile=128))
    np.testing.assert_array_equal(got, want)
    assert got.max() < 3  # never a padded class id
