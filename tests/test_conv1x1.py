"""ops.conv1x1: forward/vjp vs plain XLA conv autodiff (interpret on CPU).

The custom op exists because XLA's 1x1-conv *weight* gradient canonicalizes
to a dot mid-pipeline, which collapses H2D bandwidth on the target platform
(ops/conv1x1.py docstring); its numerics must match plain autodiff exactly
on fp32 (same fp32 accumulation, only reduction order differs).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zeroshotsemanticsegmentation_tpu.ops.conv1x1 import (
    _conv1x1, conv1x1_mmwgrad)
from zeroshotsemanticsegmentation_tpu.ops.pdot import pdot


@pytest.mark.parametrize("m,k,n", [(8, 128, 128), (17, 21, 33),
                                   (130, 257, 140)])
def test_pdot_trans_a_matches_numpy(rng, m, k, n):
    a = rng.randn(k, m).astype(np.float32)  # (K, M): pdot contracts rows
    b = rng.randn(k, n).astype(np.float32)
    got = pdot(jnp.asarray(a), jnp.asarray(b), trans_a=True, highest=True,
               bm=128, bn=128, bk=64)
    np.testing.assert_allclose(np.asarray(got), a.T @ b,
                               rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("b,h,w,ci,co", [
    (2, 5, 7, 16, 4),     # odd spatial, small channels
    (3, 4, 4, 33, 21),    # unaligned channels (pdot pads)
    (1, 1, 1, 8, 2),      # degenerate 1-pixel image
])
def test_conv1x1_fwd_and_vjp_match_xla(rng, b, h, w, ci, co):
    x = jnp.asarray(rng.randn(b, h, w, ci).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 1, ci, co).astype(np.float32) * 0.1)
    g = jnp.asarray(rng.randn(b, h, w, co).astype(np.float32))

    out, vjp = jax.vjp(conv1x1_mmwgrad, x, k)
    ref_out, ref_vjp = jax.vjp(_conv1x1, x, k)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref_out))

    dx, dk = vjp(g)
    rdx, rdk = ref_vjp(g)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(rdx),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(rdk),
                               rtol=1e-5, atol=1e-4)
    assert dx.dtype == x.dtype and dk.dtype == k.dtype


def test_conv1x1_grad_through_model_layer(rng):
    # end-to-end through a jit + loss, bf16 compute like the model layers
    x = jnp.asarray(rng.randn(2, 3, 3, 24).astype(np.float32), jnp.bfloat16)
    k = jnp.asarray(rng.randn(1, 1, 24, 8).astype(np.float32) * .1,
                    jnp.bfloat16)

    def loss(fn):
        return lambda x, k: jnp.sum(jnp.tanh(fn(x, k).astype(jnp.float32)))

    gx, gk = jax.jit(jax.grad(loss(conv1x1_mmwgrad), argnums=(0, 1)))(x, k)
    rx, rk = jax.jit(jax.grad(loss(_conv1x1), argnums=(0, 1)))(x, k)
    np.testing.assert_allclose(np.asarray(gx, np.float32),
                               np.asarray(rx, np.float32),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(gk, np.float32),
                               np.asarray(rk, np.float32),
                               rtol=2e-2, atol=2e-2)
