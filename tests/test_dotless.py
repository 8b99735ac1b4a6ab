"""ops.dotless: multiply-reduce contractions vs einsum/gather oracles.

These ops exist so the production programs contain no XLA `dot_general`
(H2D-collapse trigger 2, CLAUDE.md); each test checks both halves of that
contract: numerical equality with the einsum it replaces, and dot-freedom
of the lowered program (value AND gradient). The modules under test are
pure XLA (no Pallas), so the StableHLO check is valid on the CPU backend.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zeroshotsemanticsegmentation_tpu.ops import dotpolicy
from zeroshotsemanticsegmentation_tpu.ops.dotless import (
    matvec, proj_rows, select_rows)


@pytest.fixture(autouse=True)
def _pin_dot_free():
    """These tests exercise the dot-free lowering specifically."""
    dotpolicy.set_dot_free(True)
    yield
    dotpolicy.set_dot_free(None)


def _assert_dot_free(fn, *args):
    txt = jax.jit(fn).lower(*args).as_text()
    assert "stablehlo.dot_general" not in txt


@pytest.mark.parametrize("shape,k,c", [
    ((6, 5), 21, 40),       # class projection shape family
    ((2, 9, 9), 3, 17),     # batched spatial
    ((4,), 1, 1),           # degenerate
])
def test_proj_rows_matches_einsum(rng, shape, k, c):
    x = rng.randn(*shape, c).astype(np.float32)
    m = rng.randn(k, c).astype(np.float32)
    got = proj_rows(jnp.asarray(x), jnp.asarray(m))
    want = np.einsum("...c,kc->...k", x, m)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)
    _assert_dot_free(proj_rows, jnp.asarray(x), jnp.asarray(m))


def test_proj_rows_bf16_inputs_accumulate_fp32(rng):
    x = rng.randn(7, 33).astype(np.float32)
    m = rng.randn(5, 33).astype(np.float32)
    got = proj_rows(jnp.asarray(x, jnp.bfloat16), jnp.asarray(m, jnp.bfloat16))
    # fp32 accumulation over bf16-rounded inputs
    want = (np.asarray(jnp.asarray(x, jnp.bfloat16), np.float32)
            @ np.asarray(jnp.asarray(m, jnp.bfloat16), np.float32).T)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_proj_rows_grad_matches_einsum_grad_and_is_dot_free(rng):
    x = rng.randn(4, 12).astype(np.float32)
    m = rng.randn(6, 12).astype(np.float32)

    def loss_dotless(x, m):
        return jnp.sum(jnp.sin(proj_rows(x, m)))

    def loss_einsum(x, m):
        return jnp.sum(jnp.sin(jnp.einsum(
            "...c,kc->...k", x, m, precision=jax.lax.Precision.HIGHEST)))

    gx, gm = jax.grad(loss_dotless, argnums=(0, 1))(
        jnp.asarray(x), jnp.asarray(m))
    wx, wm = jax.grad(loss_einsum, argnums=(0, 1))(
        jnp.asarray(x), jnp.asarray(m))
    np.testing.assert_allclose(np.asarray(gx), np.asarray(wx),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gm), np.asarray(wm),
                               rtol=1e-5, atol=1e-5)
    _assert_dot_free(jax.grad(loss_dotless, argnums=(0, 1)),
                     jnp.asarray(x), jnp.asarray(m))


def test_select_rows_matches_gather_exactly(rng):
    table = rng.randn(21, 40).astype(np.float32)
    idx = rng.randint(0, 21, (3, 8, 8)).astype(np.int32)
    idx.flat[0], idx.flat[1] = 0, 20  # hit both edges
    got = select_rows(jnp.asarray(idx), jnp.asarray(table))
    # EXACT: one nonzero term per output, adding 0.0 never rounds
    np.testing.assert_array_equal(np.asarray(got), table[idx])
    _assert_dot_free(select_rows, jnp.asarray(idx), jnp.asarray(table))


def test_select_rows_exact_on_bf16_table(rng):
    # selection must not quantize the values: bf16 table rows come out as
    # their exact fp32 promotions
    table16 = jnp.asarray(rng.randn(9, 5).astype(np.float32), jnp.bfloat16)
    idx = rng.randint(0, 9, (11,)).astype(np.int32)
    got = select_rows(jnp.asarray(idx), table16)
    want = np.asarray(table16, np.float32)[idx]
    assert got.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(got), want)


def test_matvec_matches_einsum(rng):
    x = rng.randn(4, 7, 13).astype(np.float32)
    v = rng.randn(13).astype(np.float32)
    got = matvec(jnp.asarray(x), jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(got), np.einsum("...n,n->...", x, v),
                               rtol=1e-5, atol=1e-5)
    _assert_dot_free(matvec, jnp.asarray(x), jnp.asarray(v))
