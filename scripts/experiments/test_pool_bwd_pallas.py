"""ops.pool: dense-backward max pool vs flax nn.max_pool autodiff oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
import pytest

from pool_bwd_pallas import (
    ceil_max_pool_2x2, max_pool_2x2)


def ref_pool(x, pb, pr):
    return nn.max_pool(x, (2, 2), strides=(2, 2),
                       padding=((0, pb), (0, pr)))


@pytest.mark.parametrize("shape,pb,pr", [
    ((2, 8, 8, 3), 0, 0),
    ((1, 7, 9, 4), 1, 1),
    ((2, 9, 8, 2), 1, 0),
])
def test_forward_matches_flax(rng, shape, pb, pr):
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(max_pool_2x2(x, pb, pr)),
                                  np.asarray(ref_pool(x, pb, pr)))


@pytest.mark.parametrize("tie_mode", ["dense_ties", "relu_zeros", "smooth"])
def test_backward_matches_select_and_scatter(rng, tie_mode):
    """Gradients identical to XLA's select-and-scatter (first-max window
    scan order), including exact ties — the case that distinguishes
    first-max from split-gradient formulations."""
    if tie_mode == "dense_ties":
        # small-int values: ~60% of windows contain a tied max
        x = rng.randint(0, 3, (2, 8, 10, 4)).astype(np.float32)
    elif tie_mode == "relu_zeros":
        # relu-style: many exact zeros (the common tie in VGG blocks)
        x = np.maximum(rng.randn(2, 8, 10, 4), 0).astype(np.float32)
        x[x < 0.5] = 0.0
    else:
        x = rng.randn(2, 8, 10, 4).astype(np.float32)
    x = jnp.asarray(x)
    g = jnp.asarray(rng.randn(2, 4, 5, 4).astype(np.float32))

    def loss_ours(x):
        return jnp.vdot(max_pool_2x2(x), g)

    def loss_ref(x):
        return jnp.vdot(ref_pool(x, 0, 0), g)

    np.testing.assert_array_equal(np.asarray(jax.grad(loss_ours)(x)),
                                  np.asarray(jax.grad(loss_ref)(x)))


def test_backward_odd_extent(rng):
    x = jnp.asarray(rng.randint(0, 3, (1, 7, 9, 2)).astype(np.float32))
    g = jnp.asarray(rng.randn(1, 4, 5, 2).astype(np.float32))

    def loss_ours(x):
        return jnp.vdot(ceil_max_pool_2x2(x), g)

    def loss_ref(x):
        return jnp.vdot(ref_pool(x, 1, 1), g)

    np.testing.assert_array_equal(np.asarray(jax.grad(loss_ours)(x)),
                                  np.asarray(jax.grad(loss_ref)(x)))


def test_bf16(rng):
    x = jnp.asarray(rng.randn(2, 6, 6, 8).astype(np.float32)).astype(
        jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(max_pool_2x2(x).astype(jnp.float32)),
        np.asarray(ref_pool(x, 0, 0).astype(jnp.float32)))
