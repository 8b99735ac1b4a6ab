"""Optimizer parameter-group rules vs torch-semantics oracles."""

import jax
import jax.numpy as jnp
import numpy as np

from zeroshotsemanticsegmentation_tpu.train import (
    make_fcn_optimizer, make_seenmask_optimizer)


def make_params(rng):
    return {
        "conv1_1": {"kernel": jnp.asarray(rng.randn(3, 3, 3, 4), jnp.float32),
                    "bias": jnp.asarray(rng.randn(4), jnp.float32)},
        "score_fr": {"kernel": jnp.asarray(rng.randn(1, 1, 4, 2), jnp.float32),
                     "bias": jnp.asarray(rng.randn(2), jnp.float32)},
        "seenmask_score": {"kernel": jnp.asarray(rng.randn(1, 1, 4, 2),
                                                 jnp.float32),
                           "bias": jnp.asarray(rng.randn(2), jnp.float32)},
    }


def ones_like(tree):
    return jax.tree_util.tree_map(jnp.ones_like, tree)


def test_sgd_matches_torch_semantics(rng):
    """First step of torch SGD(momentum=.99, wd=5e-4, bias lr x2, bias wd 0)."""
    params = make_params(rng)
    lr = 0.1
    tx = make_fcn_optimizer(params, optim="sgd", lr=lr)
    opt_state = tx.init(params)
    grads = ones_like(params)
    updates, _ = tx.update(grads, opt_state, params)
    # weights: buf = g + wd*p ; update = -lr * buf
    w = np.asarray(params["conv1_1"]["kernel"])
    want_w = -lr * (1.0 + 5e-4 * w)
    np.testing.assert_allclose(np.asarray(updates["conv1_1"]["kernel"]),
                               want_w, rtol=1e-6)
    # biases: no decay, lr doubled
    np.testing.assert_allclose(np.asarray(updates["conv1_1"]["bias"]),
                               -2 * lr * np.ones(4), rtol=1e-6)


def test_sgd_momentum_accumulates(rng):
    params = make_params(rng)
    tx = make_fcn_optimizer(params, optim="sgd", lr=1.0, weight_decay=0.0)
    state = tx.init(params)
    g = ones_like(params)
    u1, state = tx.update(g, state, params)
    u2, state = tx.update(g, state, params)
    # second step: buf = 0.99*1 + 1 = 1.99
    np.testing.assert_allclose(np.asarray(u2["conv1_1"]["kernel"]),
                               -1.99 * np.ones((3, 3, 3, 4)), rtol=1e-6)


def test_adam_bias_lr_doubled(rng):
    params = make_params(rng)
    tx = make_fcn_optimizer(params, optim="adam", lr=1e-3)
    state = tx.init(params)
    u, _ = tx.update(ones_like(params), state, params)
    # first adam step is ~ -lr * g/|g| = -lr for unit grads
    np.testing.assert_allclose(np.asarray(u["conv1_1"]["kernel"]),
                               -1e-3 * np.ones((3, 3, 3, 4)), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(u["conv1_1"]["bias"]),
                               -2e-3 * np.ones(4), rtol=1e-4)


def test_stage1_never_touches_seenmask_head(rng):
    """Reference stage-1 get_parameters skips seenmask_* (train.py:316-318):
    even SGD's weight-decay term must leave the head bitwise unchanged when
    its gradient is zero."""
    for optim, lr in (("sgd", 0.1), ("adam", 1e-3)):
        params = make_params(rng)
        tx = make_fcn_optimizer(params, optim=optim, lr=lr)
        state = tx.init(params)
        grads = ones_like(params)
        # fcn-mode training: seenmask head gets zero gradient
        grads["seenmask_score"] = jax.tree_util.tree_map(
            jnp.zeros_like, grads["seenmask_score"])
        p = params
        for _ in range(3):
            u, state = tx.update(grads, state, p)
            p = jax.tree_util.tree_map(lambda a, b: a + b, p, u)
        np.testing.assert_array_equal(
            np.asarray(p["seenmask_score"]["kernel"]),
            np.asarray(params["seenmask_score"]["kernel"]))
        np.testing.assert_array_equal(
            np.asarray(p["seenmask_score"]["bias"]),
            np.asarray(params["seenmask_score"]["bias"]))
        # and the rest still moves
        assert np.all(np.asarray(u["conv1_1"]["kernel"]) != 0)


def test_seenmask_freezes_everything_else(rng):
    params = make_params(rng)
    tx = make_seenmask_optimizer(params, lr=1e-3)
    state = tx.init(params)
    u, _ = tx.update(ones_like(params), state, params)
    assert np.all(np.asarray(u["conv1_1"]["kernel"]) == 0)
    assert np.all(np.asarray(u["score_fr"]["kernel"]) == 0)
    assert np.all(np.asarray(u["seenmask_score"]["kernel"]) != 0)
    assert np.all(np.asarray(u["seenmask_score"]["bias"]) != 0)
