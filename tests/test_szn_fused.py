"""Fused upsample+NNE kernel vs the unfused reference pipeline."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zeroshotsemanticsegmentation_tpu.models import FCN32s
from zeroshotsemanticsegmentation_tpu.ops import (
    infer_labels_szn, upsample_bilinear_cropped)
from zeroshotsemanticsegmentation_tpu.ops.metrics import unseen_mask_vector
from zeroshotsemanticsegmentation_tpu.ops.szn_fused import (
    infer_labels_szn_fused)


def unfused(score_small, sm_small, embed, uv, out_hw):
    up = lambda t: upsample_bilinear_cropped(  # noqa: E731
        t, stride=32, kernel_size=64, crop_offset=19,
        out_h=out_hw[0], out_w=out_hw[1])
    return infer_labels_szn(up(score_small), up(sm_small), embed, uv)


@pytest.mark.parametrize("b,h32,w32,c,k,out", [
    (2, 5, 5, 20, 21, (96, 96)),
    (1, 4, 6, 20, 33, (70, 130)),
])
def test_fused_matches_unfused(rng, b, h32, w32, c, k, out):
    score = jnp.asarray(rng.randn(b, h32, w32, c).astype(np.float32))
    sm = jnp.asarray(rng.randn(b, h32, w32, 2).astype(np.float32))
    embed = rng.randn(k, c).astype(np.float32)
    embed /= np.linalg.norm(embed, axis=1, keepdims=True)
    uv = jnp.asarray(unseen_mask_vector(k, [1, k - 2]))
    want = np.asarray(unfused(score, sm, jnp.asarray(embed), uv, out))
    got = np.asarray(infer_labels_szn_fused(score, sm, jnp.asarray(embed), uv,
                                            out, row_tile=16))
    assert (got != want).mean() < 1e-4  # ±1ulp tie flips only
    assert got.max() < k  # gate row never wins


def test_fused_from_model_raw_heads(rng):
    """End-to-end: model mode='raw' -> fused kernel == full-res pipeline."""
    model = FCN32s(num_classes=8, channel_scale=1 / 16)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, mode="both")
    embed = rng.randn(9, 8).astype(np.float32)
    embed /= np.linalg.norm(embed, axis=1, keepdims=True)
    uv = jnp.asarray(unseen_mask_vector(9, [2, 5]))

    f, s = model.apply(variables, x, mode="both")
    want = np.asarray(infer_labels_szn(f, s, jnp.asarray(embed), uv))
    f_raw, s_raw = model.apply(variables, x, mode="raw")
    got = np.asarray(infer_labels_szn_fused(f_raw, s_raw, jnp.asarray(embed),
                                            uv, (64, 64), row_tile=16))
    assert (got != want).mean() < 1e-4


def test_nne_fused_matches_infer_labels(rng):
    """Plain-NNE fused path (always-seen gate trick) == ops.nne.infer_labels
    on the upsampled score."""
    from zeroshotsemanticsegmentation_tpu.ops import infer_labels
    from zeroshotsemanticsegmentation_tpu.ops.szn_fused import (
        infer_labels_nne_fused)
    score = jnp.asarray(rng.randn(2, 5, 5, 16).astype(np.float32))
    embed = rng.randn(11, 16).astype(np.float32)
    embed /= np.linalg.norm(embed, axis=1, keepdims=True)
    up = upsample_bilinear_cropped(score, stride=32, kernel_size=64,
                                   crop_offset=19, out_h=96, out_w=96)
    want = np.asarray(infer_labels(up, jnp.asarray(embed)))
    got = np.asarray(infer_labels_nne_fused(score, jnp.asarray(embed),
                                            (96, 96), row_tile=16))
    assert (got != want).mean() < 1e-4
    assert got.max() < 11


def test_fused_eval_steps_match_unfused(rng):
    """Trainer validation with fused=True: identical losses, predictions up
    to fp argmax ties, for both the fcn and the full-SZN eval step."""
    from zeroshotsemanticsegmentation_tpu.train.steps import (
        make_fcn_eval_step, make_szn_eval_step)
    model = FCN32s(num_classes=8, channel_scale=1 / 16)
    batch = {
        "image": jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32)),
        "label": jnp.asarray(rng.randint(-1, 9, (2, 64, 64)).astype(np.int32)),
        "sizes": jnp.asarray(np.full((2, 2), 64, np.int32)),
        "num_real": jnp.asarray(2, jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(0), batch["image"][:1],
                        mode="both")["params"]
    embed = rng.randn(9, 8).astype(np.float32)
    embed /= np.linalg.norm(embed, axis=1, keepdims=True)
    uv = jnp.asarray(unseen_mask_vector(9, [2, 5]))
    kw = dict(loss_name="cos", num_classes=9, embeddings=jnp.asarray(embed),
              all_unseen_vec=uv, val_unseen_vec=uv)
    for maker in (make_fcn_eval_step, make_szn_eval_step):
        base = maker(model, fused=False, **kw)(params, batch)
        fused = maker(model, fused=True, **kw)(params, batch)
        np.testing.assert_allclose(float(fused["loss_sum"]),
                                   float(base["loss_sum"]), rtol=1e-6)
        np.testing.assert_allclose(float(fused["score_sum"]),
                                   float(base["score_sum"]), rtol=1e-5)
        flips = (np.asarray(fused["pred"]) != np.asarray(base["pred"])).mean()
        assert flips < 1e-4, f"{maker.__name__}: {flips:.2e} pred flips"
        assert np.abs(np.asarray(fused["hists"]).astype(np.int64)
                      - np.asarray(base["hists"])).sum() <= 4


def test_fused_edge_cases_zero_norms_and_negative_sims(rng):
    """Quirk coverage inherited from the retired standalone NNE kernel:
    zero-norm score pixels, a zeroed embedding row (reference seen/unseen
    matrices zero the other partition, trainer_fcn.py:56-64), and
    all-negative similarities (a masked-to-0.0 class must win then)."""
    score = jnp.asarray(rng.randn(1, 4, 5, 8).astype(np.float32))
    score = score.at[0, :2].set(0.0)          # zero-norm pixels
    embed = rng.randn(9, 8).astype(np.float32)
    embed /= np.linalg.norm(embed, axis=1, keepdims=True)
    embed[3] = 0.0                             # zeroed class row
    uv = jnp.asarray(unseen_mask_vector(9, [3, 7]))
    sm = jnp.asarray(rng.randn(1, 4, 5, 2).astype(np.float32))
    want = np.asarray(unfused(score, sm, jnp.asarray(embed), uv, (70, 90)))
    got = np.asarray(infer_labels_szn_fused(score, sm, jnp.asarray(embed),
                                            uv, (70, 90), row_tile=16))
    assert (got != want).mean() < 1e-3
    assert got.max() < 9

    # all-negative sims, unrestricted: never a gate/padded id
    from zeroshotsemanticsegmentation_tpu.ops.szn_fused import (
        infer_labels_nne_fused)
    neg = jnp.asarray(-np.abs(rng.randn(1, 4, 5, 8)).astype(np.float32))
    got2 = np.asarray(infer_labels_nne_fused(neg, jnp.asarray(embed),
                                             (70, 90), row_tile=16))
    assert got2.max() < 9
