"""Support-pruned pad-100 blocks (models/pruned.py) vs the plain path.

The pruned path computes blocks 1-3 only on the data's receptive-field
support, ring-padded with the zero-input constants, and reconstructs the
full virtual pool3 array from a small zero-input frame probe. It must be
numerically indistinguishable from the plain pad-100 geometry (reference
models.py:43) for every mode, shape parity, architecture, and gradient.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zeroshotsemanticsegmentation_tpu.models import FCN8s, FCN32s
from zeroshotsemanticsegmentation_tpu.models.pruned import (
    _MIN_SIDE, prunable, probe_side)

_CS = 0.125  # thin backbone: fast on the CPU test mesh


def _pair(model_cls, **kw):
    plain = model_cls(num_classes=7, dtype=jnp.float32, channel_scale=_CS,
                      prune_pad=False, **kw)
    pruned = model_cls(num_classes=7, dtype=jnp.float32, channel_scale=_CS,
                       prune_pad=True, **kw)
    return plain, pruned


@pytest.mark.parametrize("hw", [(64, 64), (70, 96), (71, 65), (66, 78)])
def test_pruned_forward_bitexact_fp32(hw):
    """All four (H, W) parities: identical fp32 outputs, all modes."""
    h, w = hw
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, h, w, 3).astype(np.float32) * 40)
    plain, pruned = _pair(FCN32s)
    params = plain.init(jax.random.PRNGKey(0), x[:1], mode="both")["params"]
    assert (jax.tree_util.tree_structure(params) ==
            jax.tree_util.tree_structure(
                pruned.init(jax.random.PRNGKey(0), x[:1],
                            mode="both")["params"]))
    for mode in ("raw", "fcn", "seenmask", "both"):
        a = plain.apply({"params": params}, x, mode=mode)
        b = pruned.apply({"params": params}, x, mode=mode)
        for ta, tb in zip(jax.tree_util.tree_leaves(a),
                          jax.tree_util.tree_leaves(b)):
            np.testing.assert_allclose(np.asarray(ta), np.asarray(tb),
                                       rtol=0, atol=1e-5)


def test_pruned_gradients_match_plain():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32) * 40)
    tgt = jnp.asarray(rng.randn(2, 64, 64, 7).astype(np.float32))
    plain, pruned = _pair(FCN32s)
    params = plain.init(jax.random.PRNGKey(0), x[:1], mode="both")["params"]

    def loss(m):
        return lambda p: jnp.mean(
            (m.apply({"params": p}, x, mode="fcn") - tgt) ** 2)

    l0, g0 = jax.value_and_grad(loss(plain))(params)
    for kw in ({}, {"remat": True}):
        m = FCN32s(num_classes=7, dtype=jnp.float32, channel_scale=_CS,
                   prune_pad=True, **kw)
        l1, g1 = jax.value_and_grad(loss(m))(params)
        assert abs(float(l0 - l1)) < 1e-7
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g1)):
            scale = max(float(jnp.max(jnp.abs(a))), 1e-8)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=0, atol=1e-5 * scale)


def test_pruned_fcn8s_matches_plain():
    """FCN-8s taps pool3 (materialized full array) — must stay exact."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 64, 96, 3).astype(np.float32) * 40)
    plain, pruned = _pair(FCN8s)
    params = plain.init(jax.random.PRNGKey(0), x, mode="both")["params"]
    a = plain.apply({"params": params}, x, mode="both")
    b = pruned.apply({"params": params}, x, mode="both")
    for ta, tb in zip(jax.tree_util.tree_leaves(a),
                      jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(ta), np.asarray(tb),
                                   rtol=0, atol=1e-5)


def test_pruned_bf16_close_to_plain_bf16():
    """bf16 compute: ring constants are einsum- not conv-computed, so allow
    one-ULP bf16 wiggle near the support boundary."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32) * 40)
    plain = FCN32s(num_classes=7, dtype=jnp.bfloat16, channel_scale=_CS,
                   prune_pad=False)
    pruned = FCN32s(num_classes=7, dtype=jnp.bfloat16, channel_scale=_CS,
                    prune_pad=True)
    params = plain.init(jax.random.PRNGKey(0), x, mode="both")["params"]
    a = np.asarray(plain.apply({"params": params}, x, mode="fcn"))
    b = np.asarray(pruned.apply({"params": params}, x, mode="fcn"))
    scale = np.abs(a).max()
    np.testing.assert_allclose(a, b, rtol=0, atol=0.03 * scale)


def test_prunable_gate_plan_and_probe_parity():
    from zeroshotsemanticsegmentation_tpu.models.pruned import plan_blocks
    assert not prunable(_MIN_SIDE - 1, 512)
    assert prunable(_MIN_SIDE, _MIN_SIDE)
    assert not plan_blocks(_MIN_SIDE - 1, 512, 100, 4)
    # the production geometries all support the full 4-block pruning
    for side in (512, 480, 640):
        assert plan_blocks(side, side, 100, 4)
    # probe keeps the ceil-pool parity chain: probe ≡ full (mod 2^blocks)
    for side in (512, 513, 518, 70):
        for nb in (3, 4):
            assert (probe_side(side, nb) - side) % (1 << nb) == 0


def test_pruned_tiny_input_falls_back():
    """Below the gate the plain path runs — output must still be right."""
    from zeroshotsemanticsegmentation_tpu.models.fcn32s import min_input_size
    side = max(min_input_size(), 8)
    if side >= _MIN_SIDE:
        pytest.skip("min model input already prunable")
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, side, side, 3).astype(np.float32))
    plain, pruned = _pair(FCN32s)
    params = plain.init(jax.random.PRNGKey(0), x, mode="both")["params"]
    a = plain.apply({"params": params}, x, mode="fcn")
    b = pruned.apply({"params": params}, x, mode="fcn")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_plan_and_runner_agree_across_geometries():
    """plan_blocks is a pure-int replica of the runner's constraint checks;
    trace (eval_shape, no compute) the model across a geometry grid so any
    drift trips the runner's asserts, and pruned output shapes match the
    plain path everywhere."""
    from zeroshotsemanticsegmentation_tpu.models.pruned import plan_blocks
    sizes = [(16, 16), (17, 23), (32, 48), (33, 47), (64, 64), (70, 96),
             (71, 65), (80, 90), (96, 128), (121, 99), (480, 640),
             (512, 512)]
    for h, w in sizes:
        for nb in (3, 4):
            plan_blocks(h, w, 100, nb)  # must never raise
        x = jnp.zeros((1, h, w, 3), jnp.float32)
        plain = FCN32s(num_classes=5, channel_scale=_CS, prune_pad=False)
        pruned = FCN32s(num_classes=5, channel_scale=_CS, prune_pad=True)
        sp = jax.eval_shape(
            lambda m=plain, xx=x: m.init(jax.random.PRNGKey(0), xx,
                                         mode="both"))
        sq = jax.eval_shape(
            lambda m=pruned, xx=x: m.init(jax.random.PRNGKey(0), xx,
                                          mode="both"))
        assert (jax.tree_util.tree_structure(sp) ==
                jax.tree_util.tree_structure(sq)), (h, w)
        ap = jax.eval_shape(
            lambda v, xx: plain.apply(v, xx, mode="both"), sp, x)
        aq = jax.eval_shape(
            lambda v, xx: pruned.apply(v, xx, mode="both"), sq, x)
        assert jax.tree_util.tree_map(lambda a: a.shape, ap) == \
            jax.tree_util.tree_map(lambda a: a.shape, aq), (h, w)
