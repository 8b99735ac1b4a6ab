"""ops.dotpolicy: dot-free is a mode, not an identity (VERDICT r3 item 2).

Covers (a) the env/auto gate resolution, (b) numerical equality of the MXU
(einsum/dot) and dot-free lowerings for every branched op, and (c) that the
mode actually changes the lowering (MXU mode emits dot_general where
expected; dot-free mode emits none).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zeroshotsemanticsegmentation_tpu.ops import dotpolicy
from zeroshotsemanticsegmentation_tpu.ops.bilinear import (
    _axis_upsample, upsample_matrix)
from zeroshotsemanticsegmentation_tpu.ops.conv1x1 import conv1x1_mmwgrad
from zeroshotsemanticsegmentation_tpu.ops.conv7x7 import conv_valid_mmgrad
from zeroshotsemanticsegmentation_tpu.ops.dotless import (
    matvec, proj_rows, select_rows)


@pytest.fixture(autouse=True)
def _restore_policy():
    yield
    dotpolicy.set_dot_free(None)


def _fresh(fn):
    # jax.jit caches traces on the wrapped function's identity — a policy
    # flip between two jits of the SAME function object would silently reuse
    # the first trace. A fresh wrapper per call forces a re-trace.
    return jax.jit(lambda *a: fn(*a))


def _run_both(fn, *args):
    dotpolicy.set_dot_free(True)
    df = _fresh(fn)(*args)
    dotpolicy.set_dot_free(False)
    mxu = _fresh(fn)(*args)
    return jax.tree.map(np.asarray, df), jax.tree.map(np.asarray, mxu)


def _lowered_text(fn, *args):
    return _fresh(fn).lower(*args).as_text()


# ---------------------------------------------------------------- gate

def test_env_gate_resolution(monkeypatch):
    dotpolicy.set_dot_free(None)
    monkeypatch.setenv("SZN_DOT_FREE", "1")
    assert dotpolicy.dot_free() is True
    dotpolicy.set_dot_free(None)
    monkeypatch.setenv("SZN_DOT_FREE", "0")
    assert dotpolicy.dot_free() is False
    dotpolicy.set_dot_free(None)
    monkeypatch.setenv("SZN_DOT_FREE", "bogus")
    with pytest.raises(ValueError):
        dotpolicy.dot_free()


def test_auto_gate_follows_axon_detection(monkeypatch):
    monkeypatch.setenv("SZN_DOT_FREE", "auto")
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    dotpolicy.set_dot_free(None)
    assert dotpolicy.dot_free() is True  # tunnel env var present

    monkeypatch.delenv("PALLAS_AXON_POOL_IPS")
    dotpolicy.set_dot_free(None)
    assert dotpolicy.dot_free() is False  # clean environment

    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    dotpolicy.set_dot_free(None)
    assert dotpolicy.dot_free() is True


def test_cached_resolution_is_sticky(monkeypatch):
    monkeypatch.setenv("SZN_DOT_FREE", "0")
    dotpolicy.set_dot_free(None)
    assert dotpolicy.dot_free() is False
    monkeypatch.setenv("SZN_DOT_FREE", "1")
    assert dotpolicy.dot_free() is False  # cached until reset
    dotpolicy.set_dot_free(None)
    assert dotpolicy.dot_free() is True


# ------------------------------------------------- both modes agree

def test_proj_rows_modes_agree(rng):
    x = rng.randn(3, 9, 9, 40).astype(np.float32)
    m = rng.randn(21, 40).astype(np.float32)
    df, mxu = _run_both(proj_rows, jnp.asarray(x), jnp.asarray(m))
    # fp32 either way; differences are FMA-vs-separate-rounding ulps
    np.testing.assert_allclose(df, mxu, rtol=1e-4, atol=1e-5)


def test_select_rows_modes_agree_exactly(rng):
    table = rng.randn(21, 40).astype(np.float32)
    idx = rng.randint(0, 21, (2, 8, 8)).astype(np.int32)
    df, mxu = _run_both(select_rows, jnp.asarray(idx), jnp.asarray(table))
    # both are one-hot selections of fp32 values: exact
    np.testing.assert_array_equal(df, mxu)
    np.testing.assert_array_equal(mxu, table[idx])


def test_matvec_modes_agree(rng):
    x = rng.randn(4, 7, 13).astype(np.float32)
    v = rng.randn(13).astype(np.float32)
    df, mxu = _run_both(matvec, jnp.asarray(x), jnp.asarray(v))
    np.testing.assert_allclose(df, mxu, rtol=1e-6, atol=1e-6)


def test_axis_upsample_modes_agree(rng):
    # the tap blend's terms are exactly the matrix rows' nonzeros and adding
    # 0.0 never rounds, so the two lowerings differ only by the backend
    # dot's FMA keeping w*x unrounded before the 2-term add (last-ulp)
    x = rng.randn(2, 17, 5, 4).astype(np.float32)
    fn = lambda x: _axis_upsample(x, 1, stride=32, kernel_size=64,
                                  crop_offset=19, out_len=512)
    df, mxu = _run_both(fn, jnp.asarray(x))
    np.testing.assert_allclose(df, mxu, rtol=1e-4, atol=1e-6)
    # and both equal the explicit matrix product
    m = upsample_matrix(17, 32, 64, 19, 512)
    want = np.einsum("Oh,bhwc->bOwc", m, x)
    np.testing.assert_allclose(mxu, want, rtol=1e-5, atol=1e-5)


def test_axis_upsample_grads_agree(rng):
    x = jnp.asarray(rng.randn(1, 9, 3, 2).astype(np.float32))
    fn = lambda x: jnp.sum(jnp.sin(_axis_upsample(
        x, 1, stride=8, kernel_size=16, crop_offset=4, out_len=48)))
    dotpolicy.set_dot_free(True)
    g_df = np.asarray(jax.grad(fn)(x))
    dotpolicy.set_dot_free(False)
    g_mxu = np.asarray(jax.grad(fn)(x))
    np.testing.assert_allclose(g_df, g_mxu, rtol=1e-5, atol=1e-6)


def test_conv1x1_value_and_grads_agree(rng):
    x = jnp.asarray(rng.randn(2, 5, 5, 12).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 1, 12, 7).astype(np.float32))

    def loss(x, k):
        return jnp.sum(jnp.tanh(conv1x1_mmwgrad(x, k)))

    dotpolicy.set_dot_free(True)
    v_df = float(loss(x, k))
    gx_df, gk_df = jax.jit(jax.grad(loss, argnums=(0, 1)))(x, k)
    dotpolicy.set_dot_free(False)
    v_mxu = float(loss(x, k))
    gx_mxu, gk_mxu = jax.jit(jax.grad(loss, argnums=(0, 1)))(x, k)
    np.testing.assert_allclose(v_df, v_mxu, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gx_df), np.asarray(gx_mxu),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gk_df), np.asarray(gk_mxu),
                               rtol=1e-5, atol=1e-5)


def test_conv7x7_grads_agree(rng):
    x = jnp.asarray(rng.randn(1, 11, 11, 3).astype(np.float32))
    k = jnp.asarray(rng.randn(7, 7, 3, 5).astype(np.float32))

    def loss(x, k):
        return jnp.sum(jnp.tanh(conv_valid_mmgrad(x, k)))

    dotpolicy.set_dot_free(True)
    gx_df, gk_df = jax.jit(jax.grad(loss, argnums=(0, 1)))(x, k)
    dotpolicy.set_dot_free(False)
    gx_mxu, gk_mxu = jax.jit(jax.grad(loss, argnums=(0, 1)))(x, k)
    np.testing.assert_allclose(np.asarray(gx_df), np.asarray(gx_mxu),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk_df), np.asarray(gk_mxu),
                               rtol=1e-5, atol=1e-5)


def test_szn_fused_modes_agree(rng):
    from zeroshotsemanticsegmentation_tpu.ops.szn_fused import (
        infer_labels_szn_fused)
    score = jnp.asarray(rng.randn(2, 17, 17, 20).astype(np.float32))
    seen = jnp.asarray(rng.randn(2, 17, 17, 2).astype(np.float32))
    emb = jnp.asarray(rng.randn(21, 20).astype(np.float32))
    unseen = np.zeros(21, bool)
    unseen[[1, 13]] = True

    dotpolicy.set_dot_free(True)
    df = np.asarray(infer_labels_szn_fused(score, seen, emb, unseen,
                                           (512, 512)))
    dotpolicy.set_dot_free(False)
    mxu = np.asarray(infer_labels_szn_fused(score, seen, emb, unseen,
                                            (512, 512)))
    np.testing.assert_array_equal(df, mxu)


# ------------------------------------------------- lowering actually flips

def test_mode_changes_lowering(rng):
    x = jnp.asarray(rng.randn(4, 12).astype(np.float32))
    m = jnp.asarray(rng.randn(6, 12).astype(np.float32))
    dotpolicy.set_dot_free(True)
    assert "stablehlo.dot_general" not in _lowered_text(proj_rows, x, m)
    dotpolicy.set_dot_free(False)
    assert "stablehlo.dot_general" in _lowered_text(proj_rows, x, m)


def test_mode_changes_upsample_lowering(rng):
    x = jnp.asarray(rng.randn(1, 9, 3, 2).astype(np.float32))
    fn = lambda x: _axis_upsample(x, 1, stride=8, kernel_size=16,
                                  crop_offset=4, out_len=48)
    dotpolicy.set_dot_free(True)
    assert "stablehlo.dot_general" not in _lowered_text(fn, x)
    dotpolicy.set_dot_free(False)
    assert "stablehlo.dot_general" in _lowered_text(fn, x)
