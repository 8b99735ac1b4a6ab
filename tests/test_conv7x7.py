"""conv_valid_mmgrad: forward and both grads == XLA's conv autodiff.

The op replaces fc6's input gradient (full-conv with an 83% zero border at
the 512^2 bucket geometry) with a dense matmul + static overlap-add; the
sum is the same up to reduction order, so fp32 CPU agreement is ~1e-6.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zeroshotsemanticsegmentation_tpu.ops.conv7x7 import conv_valid_mmgrad


def _ref_conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("shape,ksize", [
    ((2, 11, 12, 5), (3, 3)),
    ((2, 13, 13, 8), (7, 7)),   # fc6-like: output 7x7 from 13x13
    ((1, 7, 9, 4), (7, 7)),     # minimum-height output row
])
def test_matches_xla_conv_and_grads(rng, shape, ksize):
    co = 6
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    k = jnp.asarray(
        rng.randn(*ksize, shape[-1], co).astype(np.float32) * 0.3)

    y = conv_valid_mmgrad(x, k)
    np.testing.assert_allclose(np.asarray(y), np.asarray(_ref_conv(x, k)),
                               rtol=1e-6, atol=1e-6)

    g = jnp.asarray(rng.randn(*y.shape).astype(np.float32))

    def loss(f):
        return lambda x, k: jnp.vdot(f(x, k), g)

    dx, dk = jax.grad(loss(conv_valid_mmgrad), argnums=(0, 1))(x, k)
    dx_r, dk_r = jax.grad(loss(_ref_conv), argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_r),
                               rtol=1e-5, atol=1e-5)


def test_fc6_param_compat_and_forward(rng):
    """The fc6 swap keeps nn.Conv-compatible params (name, HWIO shape —
    checkpoints / VGG import / mesh partition specs key on these) and the
    model forward equals re-applying fc6 as a plain XLA conv."""
    from zeroshotsemanticsegmentation_tpu.models import FCN32s
    model = FCN32s(num_classes=4, channel_scale=0.05, prune_pad=False)
    x = jnp.asarray(rng.randn(1, 96, 96, 3).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x, mode="fcn")["params"]
    cs = model.width(512), model.width(4096)
    assert params["fc6"]["kernel"].shape == (7, 7) + cs
    assert params["fc6"]["bias"].shape == (cs[1],)
    # lecun_normal fan-in init, like nn.Conv's default
    std = float(jnp.std(params["fc6"]["kernel"]))
    np.testing.assert_allclose(std, (1.0 / (49 * cs[0])) ** 0.5, rtol=0.2)

    # grads flow through the custom op inside the full model (fp32 CPU)
    def loss(p):
        return jnp.mean(model.apply({"params": p}, x, mode="fcn") ** 2)

    g6 = jax.grad(loss)(params)["fc6"]["kernel"]
    assert np.isfinite(np.asarray(g6)).all() and float(jnp.abs(g6).max()) > 0
