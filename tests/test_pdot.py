"""ops.pdot: the Pallas matmul twin vs numpy/XLA oracles (interpret on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zeroshotsemanticsegmentation_tpu.ops.pdot import pdot


@pytest.mark.parametrize("m,k,n", [
    (8, 128, 128),        # single block
    (17, 21, 33),         # everything needs padding
    (130, 257, 140),      # multi-block on every axis
    (1, 300, 1),          # degenerate edges
])
def test_matches_numpy_fp32(rng, m, k, n):
    a = rng.randn(m, k).astype(np.float32)
    b = rng.randn(k, n).astype(np.float32)
    got = pdot(jnp.asarray(a), jnp.asarray(b), highest=True,
               bm=64, bn=128, bk=128)
    # atol covers fp32 reduction-order differences (K accumulates in
    # bk-sized chunks, numpy in one pass)
    np.testing.assert_allclose(np.asarray(got), a @ b, rtol=1e-5, atol=1e-4)


def test_bf16_accumulates_fp32(rng):
    # bf16 inputs, fp32 accumulation: matches the XLA dot with
    # preferred_element_type=f32 on the same rounded inputs
    a = rng.randn(64, 256).astype(np.float32)
    b = rng.randn(256, 128).astype(np.float32)
    a16, b16 = jnp.asarray(a, jnp.bfloat16), jnp.asarray(b, jnp.bfloat16)
    got = pdot(a16, b16, out_dtype=jnp.float32)
    want = jax.lax.dot(a16, b16, preferred_element_type=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)
    # and to the fp32 product within bf16 input-rounding error
    np.testing.assert_allclose(
        np.asarray(got),
        np.asarray(a16, np.float32) @ np.asarray(b16, np.float32),
        rtol=1e-4, atol=1e-3)


def test_out_dtype_and_shape_errors(rng):
    a = jnp.asarray(rng.randn(16, 32).astype(np.float32))
    b = jnp.asarray(rng.randn(32, 8).astype(np.float32))
    assert pdot(a, b, out_dtype=jnp.bfloat16).dtype == jnp.bfloat16
    with pytest.raises(ValueError):
        pdot(a, jnp.asarray(rng.randn(31, 8).astype(np.float32)))
