"""ops/block1_fused.py — standalone fused block-1 op (interpret mode).

The Pallas kernel runs on TPU; on the CPU test mesh it executes through the
Pallas interpreter, pinning the packed-tap arithmetic against the XLA
reference implementation (which is also the op's custom-vjp backward).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import zeroshotsemanticsegmentation_tpu.ops.block1_fused as bf


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True))


def _params(rng):
    return (jnp.asarray(rng.randn(3, 3, 3, 64).astype(np.float32) * 0.2),
            jnp.asarray(rng.randn(64).astype(np.float32) * 0.1),
            jnp.asarray(rng.randn(3, 3, 64, 64).astype(np.float32) * 0.05),
            jnp.asarray(rng.randn(64).astype(np.float32) * 0.1))


@pytest.mark.parametrize("hw", [(78, 82), (90, 78)])
def test_fused_block1_matches_xla(rng, hw):
    hp, wp = hw
    assert bf.fused_block1_supported(hp, wp)
    xp = jnp.asarray(rng.randn(2, hp, wp, 3).astype(np.float32))
    k1, b1, k2, b2 = _params(rng)
    want = np.asarray(bf.xla_block1(xp, k1, b1, k2, b2, dtype=jnp.float32))
    got = np.asarray(bf.fused_block1(xp, k1, b1, k2, b2, dtype=jnp.float32))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-4)


def test_block1_op_differentiable(rng):
    """Pallas backward kernel == XLA path's gradients (k2 only, legacy)."""
    xp = jnp.asarray(rng.randn(1, 30, 30, 3).astype(np.float32))
    k1, b1, k2, b2 = _params(rng)

    def loss_fused(k2_):
        return jnp.sum(bf.block1_op(xp, k1, b1, k2_, b2, jnp.float32) ** 2)

    def loss_xla(k2_):
        return jnp.sum(bf.xla_block1(xp, k1, b1, k2_, b2,
                                     dtype=jnp.float32) ** 2)

    g_fused = jax.grad(loss_fused)(k2)
    g_xla = jax.grad(loss_xla)(k2)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_xla),
                               rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("hw", [(30, 34),   # qpad+1 <= pairs_p (no colpad)
                                (30, 26)])  # qpad+1 == pairs_p+1 (the 512^2
                                            # bucket's one-column overhang)
def test_block1_backward_all_grads(rng, hw):
    """The flash-style Pallas backward (_conv2_pool_bwd) == XLA autodiff
    for EVERY input: conv1_1 kernel/bias (via the packed-conv transpose),
    conv1_2 kernel/bias (via the tap-matmul kernel), and the input image
    (via dc11p). Weighted-sum loss exercises non-uniform cotangents."""
    hp, wp = hw
    xp = jnp.asarray(rng.randn(2, hp, wp, 3).astype(np.float32))
    k1, b1, k2, b2 = _params(rng)
    gseed = jnp.asarray(rng.randn(
        2, (hp - 4) // 2, (wp - 4) // 2, 64).astype(np.float32))

    def loss(fn, k1_, b1_, k2_, b2_, xp_):
        return jnp.sum(fn(xp_, k1_, b1_, k2_, b2_, dtype=jnp.float32)
                       * gseed)

    args = (k1, b1, k2, b2, xp)
    got = jax.grad(functools.partial(loss, bf.fused_block1),
                   argnums=(0, 1, 2, 3, 4))(*args)
    want = jax.grad(functools.partial(loss, bf.xla_block1),
                    argnums=(0, 1, 2, 3, 4))(*args)
    for name, a, b in zip(("k1", "b1", "k2", "b2", "xp"), got, want):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        rel = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)
        assert rel < 1e-4, (name, rel)


def test_supported_gate():
    assert bf.fused_block1_supported(522, 522)   # the 512^2 bucket
    assert not bf.fused_block1_supported(77, 82)  # odd conv height
    assert not bf.fused_block1_supported(522, 522, channels=32)


def test_model_with_fused_block1_matches(rng):
    """FCN32s(fused_block1=True) == the default pruned path (fp32)."""
    from zeroshotsemanticsegmentation_tpu.models import FCN32s
    x = jnp.asarray(rng.randn(1, 64, 70, 3).astype(np.float32) * 40)
    base = FCN32s(num_classes=5, dtype=jnp.float32, channel_scale=1.0)
    fused = FCN32s(num_classes=5, dtype=jnp.float32, channel_scale=1.0,
                   fused_block1=True)
    params = base.init(jax.random.PRNGKey(0), x, mode="both")["params"]
    a = np.asarray(base.apply({"params": params}, x, mode="fcn"))
    b = np.asarray(fused.apply({"params": params}, x, mode="fcn"))
    np.testing.assert_allclose(b, a, rtol=0, atol=1e-4)


@pytest.mark.parametrize("hw", [(78, 82), (90, 78), (30, 26)])
def test_fused_block1_full_matches_xla(rng, hw):
    """The ONE-kernel form (conv1_1 + conv1_2 + pool, c11p never in HBM)
    == the XLA reference."""
    hp, wp = hw
    assert bf.fused_block1_full_supported(hp, wp)
    xp = jnp.asarray(rng.randn(2, hp, wp, 3).astype(np.float32))
    k1, b1, k2, b2 = _params(rng)
    want = np.asarray(bf.xla_block1(xp, k1, b1, k2, b2, dtype=jnp.float32))
    got = np.asarray(bf.fused_block1_full(xp, k1, b1, k2, b2,
                                          dtype=jnp.float32))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-4)


def test_full_vs_twostage_bf16_parity(rng):
    """ADVICE r4: block1_op's un-differentiated forward (fused_block1_full)
    and its custom_vjp fwd (fused_block1) are different programs — eval and
    serving activations come from the former, training-time forwards from
    the latter. Pin their agreement AT bf16 (the production compute dtype).

    bf16 rounding of the conv1_1 intermediate propagates through conv1_2's
    576-term accumulation, so PER-ELEMENT agreement to an output-value ULP
    is not achievable by ANY bf16 program pair (measured: both Pallas
    programs and the XLA bf16 reference mutually differ on ~25-44% of
    elements). The invariant that IS guaranteed — and pinned here — is that
    every deviation (between the two Pallas programs, and of each from the
    fp32 reference) stays within ~1 bf16 ULP at the output's max magnitude
    (measured 1.02; bound 2 with margin)."""
    hp, wp = 30, 26
    assert bf.fused_block1_full_supported(hp, wp)
    xp = jnp.asarray(rng.randn(2, hp, wp, 3).astype(np.float32))
    k1, b1, k2, b2 = _params(rng)
    full = np.asarray(bf.fused_block1_full(
        xp, k1, b1, k2, b2, dtype=jnp.bfloat16)).astype(np.float32)
    two = np.asarray(bf.fused_block1(
        xp, k1, b1, k2, b2, dtype=jnp.bfloat16)).astype(np.float32)
    ref = np.asarray(bf.xla_block1(
        xp, k1, b1, k2, b2, dtype=jnp.float32)).astype(np.float32)
    ulp_at_scale = np.abs(ref).max() * 2.0 ** -8  # bf16 eps = 2^-8
    assert np.abs(full - two).max() <= 2 * ulp_at_scale, \
        "full vs two-stage at bf16"
    assert np.abs(full - ref).max() <= 2 * ulp_at_scale, \
        "full kernel vs fp32 reference"
    assert np.abs(two - ref).max() <= 2 * ulp_at_scale, \
        "two-stage kernel vs fp32 reference"


def test_block1_op_routes_full_when_undifferentiated(rng):
    """block1_op == full kernel un-differentiated, == two-stage under grad;
    both match the XLA reference (values AND gradients)."""
    xp = jnp.asarray(rng.randn(1, 30, 34, 3).astype(np.float32))
    k1, b1, k2, b2 = _params(rng)
    want = np.asarray(bf.xla_block1(xp, k1, b1, k2, b2, dtype=jnp.float32))
    got = np.asarray(bf.block1_op(xp, k1, b1, k2, b2, jnp.float32))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-4)

    gx = np.asarray(jax.grad(
        lambda x: jnp.sum(bf.block1_op(x, k1, b1, k2, b2, jnp.float32) ** 2)
    )(xp))
    wx = np.asarray(jax.grad(
        lambda x: jnp.sum(bf.xla_block1(x, k1, b1, k2, b2,
                                        dtype=jnp.float32) ** 2))(xp))
    np.testing.assert_allclose(gx, wx, rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("hw", [(38, 42), (66, 34)])
def test_conv1_1_pairs_matches_conv(rng, hw):
    """The s2d conv1_1 kernel == plain VALID conv+relu, repacked to the
    (pair, col-parity*64+ch) layout it claims to emit."""
    hp, wp = hw
    xp = jnp.asarray(rng.randn(2, hp, wp, 3).astype(np.float32))
    k1 = jnp.asarray(rng.randn(3, 3, 3, 64).astype(np.float32) * 0.2)
    b1 = jnp.asarray(rng.randn(64).astype(np.float32) * 0.1)
    ref = jax.lax.conv_general_dilated(
        xp, k1, (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ref = np.asarray(jnp.maximum(ref + b1, 0))
    pp = (wp - 2) // 2
    want = np.concatenate(
        [ref[:, :, 0:2 * pp:2], ref[:, :, 1:2 * pp:2]], axis=-1)
    got = np.asarray(bf.conv1_1_pairs(xp, k1, b1, dtype=jnp.float32))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-4)
