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
