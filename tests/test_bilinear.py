"""Bilinear upsample: interpolation-matrix path vs direct transposed-conv oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from zeroshotsemanticsegmentation_tpu.ops import (
    bilinear_filter_1d,
    bilinear_upsampling_kernel,
    upsample_matrix,
    upsample_bilinear_cropped,
)


def conv_transpose_oracle(x, kernel, stride):
    """Direct numpy transposed conv, NHWC input, HWIO kernel, zero padding."""
    b, h, w, cin = x.shape
    kh, kw, _, cout = kernel.shape
    out = np.zeros((b, (h - 1) * stride + kh, (w - 1) * stride + kw, cout))
    for i in range(h):
        for j in range(w):
            patch = np.einsum("bc,hwcd->bhwd", x[:, i, j, :], kernel)
            out[:, i * stride:i * stride + kh, j * stride:j * stride + kw, :] += patch
    return out


def test_filter_matches_closed_form():
    # odd kernel: symmetric triangle peaking at 1
    f = bilinear_filter_1d(7)
    assert f[3] == 1.0
    np.testing.assert_allclose(f, f[::-1])
    # even kernel 4, stride 2 classic: [0.25, 0.75, 0.75, 0.25]
    np.testing.assert_allclose(bilinear_filter_1d(4), [0.25, 0.75, 0.75, 0.25])


def test_kernel_is_diagonal_separable():
    k = bilinear_upsampling_kernel(3, 8)
    assert k.shape == (8, 8, 3, 3)
    f = bilinear_filter_1d(8)
    for c in range(3):
        np.testing.assert_allclose(k[:, :, c, c], np.outer(f, f), rtol=1e-6)
    # off-diagonal channels are zero
    k2 = k.copy()
    for c in range(3):
        k2[:, :, c, c] = 0
    assert np.all(k2 == 0)


@pytest.mark.parametrize("in_len,stride,ksize,crop,out_len", [
    (17, 32, 64, 19, 512),   # canonical FCN-32s geometry for 512x512 inputs
    (5, 32, 64, 19, 64),
    (4, 2, 4, 1, 6),
])
def test_upsample_matrix_rows_sum(in_len, stride, ksize, crop, out_len):
    m = upsample_matrix(in_len, stride, ksize, crop, out_len)
    assert m.shape == (out_len, in_len)
    # interior rows of a bilinear interpolation matrix sum to 1
    interior = m[(np.arange(out_len) + crop >= ksize - stride)
                 & (np.arange(out_len) + crop < (in_len - 1) * stride + stride)]
    np.testing.assert_allclose(interior.sum(axis=1), 1.0, atol=1e-6)


@pytest.mark.parametrize("h,w,c,stride,ksize,crop", [
    (5, 7, 3, 32, 64, 19),
    (4, 4, 2, 2, 4, 1),
    (9, 6, 20, 8, 16, 4),
])
def test_matches_conv_transpose_oracle(rng, h, w, c, stride, ksize, crop):
    x = rng.randn(2, h, w, c).astype(np.float32)
    kernel = bilinear_upsampling_kernel(c, ksize, dtype=np.float64)
    full = conv_transpose_oracle(x.astype(np.float64), kernel, stride)
    out_h = (h - 1) * stride + ksize - 2 * crop
    out_w = (w - 1) * stride + ksize - 2 * crop
    want = full[:, crop:crop + out_h, crop:crop + out_w, :]
    got = upsample_bilinear_cropped(
        jnp.asarray(x), stride=stride, kernel_size=ksize, crop_offset=crop,
        out_h=out_h, out_w=out_w)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_crop_out_of_range_raises():
    with pytest.raises(ValueError):
        upsample_matrix(4, 2, 4, 3, 8)  # full = 10, 3+8 > 10


@pytest.mark.parametrize("h,w,c,stride,ksize,crop,out_h,out_w", [
    (17, 17, 5, 32, 64, 19, 512, 512),  # canonical FCN-32s at 512²
    (5, 7, 3, 8, 16, 4, 21, 37),
    (4, 4, 2, 2, 4, 1, 6, 5),
    (3, 3, 1, 32, 64, 19, 26, 26),      # edge-dominated tiny geometry
])
def test_matches_interp_matrix_bitexact(rng, h, w, c, stride, ksize, crop,
                                        out_h, out_w):
    """The tap-blend implementation == the fp32 interpolation-matrix product,
    bit for bit (the matrix rows' extra terms are exact zeros), including the
    VJP (the transpose map is the same 2-tap structure)."""
    import jax
    import jax.numpy as jnp

    x = rng.randn(2, h, w, c).astype(np.float32)
    mh = upsample_matrix(h, stride, ksize, crop, out_h)
    mw = upsample_matrix(w, stride, ksize, crop, out_w)

    def oracle(x):
        y = np.einsum("Hh,bhwc->bHwc", mh, x, dtype=np.float64)
        return np.einsum("Ww,bHwc->bHWc", mw, y, dtype=np.float64)

    got = np.asarray(upsample_bilinear_cropped(
        jnp.asarray(x), stride=stride, kernel_size=ksize, crop_offset=crop,
        out_h=out_h, out_w=out_w))
    # fp64 matrix oracle: agreement to fp32 eps (bit-exactness vs the fp32
    # matmul is asserted implicitly — both round the same 2-term fp32 sums)
    np.testing.assert_allclose(got, oracle(x.astype(np.float64)),
                               rtol=1e-6, atol=1e-6)

    g = rng.randn(*got.shape).astype(np.float32)
    up = lambda x: upsample_bilinear_cropped(
        x, stride=stride, kernel_size=ksize, crop_offset=crop,
        out_h=out_h, out_w=out_w)
    (dx,) = jax.vjp(up, jnp.asarray(x))[1](jnp.asarray(g))
    want_dx = np.einsum("Hh,Ww,bHWc->bhwc", mh, mw, g.astype(np.float64))
    np.testing.assert_allclose(np.asarray(dx), want_dx, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------- trained
# upscore: arbitrary-kernel transposed conv (stage 2 trains seenmask_upscore,
# reference train.py:168-171,304-307)

from zeroshotsemanticsegmentation_tpu.ops.bilinear import (  # noqa: E402
    upscore_conv_transpose_cropped)


@pytest.mark.parametrize("h,w,cin,cout,stride,ksize,crop", [
    (5, 7, 2, 2, 32, 64, 19),   # reference seenmask geometry (K = 2s path)
    (4, 4, 3, 2, 2, 4, 1),      # K = 2s, tiny
    (3, 3, 1, 1, 32, 64, 19),   # edge-dominated, K = 2s
    (4, 5, 2, 3, 4, 6, 2),      # K != 2s -> lhs-dilated-conv fallback
])
def test_trained_upscore_matches_oracle(rng, h, w, cin, cout, stride, ksize,
                                        crop):
    """Random (asymmetric, cross-channel) kernel vs the fp64 numpy
    transposed-conv oracle — covers the phase-matmul fast path (K = 2·s)
    and the general fallback, values and both VJPs."""
    import jax

    x = rng.randn(2, h, w, cin).astype(np.float32)
    kernel = rng.randn(ksize, ksize, cin, cout).astype(np.float32)
    full = conv_transpose_oracle(x.astype(np.float64),
                                 kernel.astype(np.float64), stride)
    out_h = (h - 1) * stride + ksize - 2 * crop
    out_w = (w - 1) * stride + ksize - 2 * crop
    want = full[:, crop:crop + out_h, crop:crop + out_w, :]

    def op(x, k):
        return upscore_conv_transpose_cropped(
            x, k, stride=stride, crop_offset=crop, out_h=out_h, out_w=out_w)

    got = np.asarray(op(jnp.asarray(x), jnp.asarray(kernel)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    # VJPs w.r.t. BOTH x and kernel against the fp64 linear-map transpose:
    # d<g,y>/dx[u] = sum_p g[p]·K[p−su] — evaluated by running the oracle
    # machinery in reverse via numeric contraction with the full map.
    g = rng.randn(*want.shape).astype(np.float32)
    out, vjp = jax.vjp(op, jnp.asarray(x), jnp.asarray(kernel))
    dx, dk = vjp(jnp.asarray(g))

    # numeric oracle for dx: correlate g (padded back to full) with K
    gfull = np.zeros(full.shape, np.float64)
    gfull[:, crop:crop + out_h, crop:crop + out_w, :] = g
    want_dx = np.zeros(x.shape, np.float64)
    want_dk = np.zeros(kernel.shape, np.float64)
    for i in range(h):
        for j in range(w):
            win = gfull[:, i * stride:i * stride + ksize,
                        j * stride:j * stride + ksize, :]
            want_dx[:, i, j, :] = np.einsum(
                "bhwd,hwcd->bc", win, kernel.astype(np.float64))
            want_dk += np.einsum("bc,bhwd->hwcd",
                                 x[:, i, j, :].astype(np.float64), win)
    np.testing.assert_allclose(np.asarray(dx), want_dx, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dk), want_dk, rtol=1e-4, atol=1e-4)


def test_trained_upscore_dot_free_twin(rng):
    """The phase fast path is policy-coherent: dot-free and MXU lowerings
    agree (proj_rows twins are exact at fp32 up to summation order)."""
    from zeroshotsemanticsegmentation_tpu.ops.dotpolicy import set_dot_free

    x = rng.randn(2, 5, 5, 2).astype(np.float32)
    kernel = rng.randn(64, 64, 2, 2).astype(np.float32)

    def run():
        return np.asarray(upscore_conv_transpose_cropped(
            jnp.asarray(x), jnp.asarray(kernel), stride=32, crop_offset=19,
            out_h=128, out_w=128))

    try:
        set_dot_free(False)
        mxu = run()
        set_dot_free(True)
        free = run()
    finally:
        set_dot_free(None)
    np.testing.assert_allclose(mxu, free, rtol=1e-5, atol=1e-5)
