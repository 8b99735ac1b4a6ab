"""ops/costail_fused vs its XLA semantic definition (house rule: the XLA
ops are the oracle — losses.cosine_loss / nne.infer_labels /
metrics.confusion_matrix)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zeroshotsemanticsegmentation_tpu.ops.costail_fused import fused_cos_tail
from zeroshotsemanticsegmentation_tpu.ops.losses import cosine_loss
from zeroshotsemanticsegmentation_tpu.ops.metrics import confusion_matrix
from zeroshotsemanticsegmentation_tpu.ops.nne import infer_labels
from zeroshotsemanticsegmentation_tpu.ops.dotless import select_rows


def _oracle(score, label, temb, iemb, n):
    def one(s, l):
        te = select_rows(jnp.clip(l, 0, None), temb)
        return cosine_loss(s[None], l[None], te[None])
    losses = jax.vmap(one)(score, label)
    hist = confusion_matrix(label, infer_labels(score, iemb), n)
    return losses, hist, jnp.sum(score.astype(jnp.float32))


def _data(rng, b, h, w, c, n, *, zero_row=False, zero_pixels=False):
    score = rng.randn(b, h, w, c).astype(np.float32)
    label = rng.randint(-1, n, (b, h, w)).astype(np.int32)
    temb = rng.randn(n, c).astype(np.float32)
    iemb = rng.randn(n, c).astype(np.float32)
    if zero_row:
        temb[0] = 0.0  # background one-hot rows can be all-zero upstream
        iemb[3] = 0.0
    if zero_pixels:
        score[:, :2, :3] = 0.0  # exercise the 0/0 := 0 normalize guard
    return (jnp.asarray(score), jnp.asarray(label), jnp.asarray(temb),
            jnp.asarray(iemb))


@pytest.mark.parametrize("shape", [(2, 16, 16), (3, 37, 53), (1, 8, 8)])
def test_forward_matches_oracle(rng, shape):
    b, h, w = shape
    c, n = 20, 21
    score, label, temb, iemb = _data(rng, b, h, w, c, n, zero_row=True,
                                     zero_pixels=True)
    losses, hist, ssum = fused_cos_tail(score, label, temb, iemb, n, tile=256)
    o_losses, o_hist, o_ssum = _oracle(score, label, temb, iemb, n)
    np.testing.assert_allclose(losses, o_losses, rtol=2e-6, atol=2e-6)
    np.testing.assert_array_equal(hist, o_hist)
    # score_sum is a cancellation-heavy sum of ~HW·C randn values; bound the
    # accumulation-order error against the uncancelled magnitude instead
    np.testing.assert_allclose(ssum, o_ssum, rtol=1e-5,
                               atol=1e-7 * float(np.sum(np.abs(score))))


def test_all_ignore_sample(rng):
    """A sample with zero valid pixels must not divide by zero (n := 1)."""
    c, n = 8, 5
    score, label, temb, iemb = _data(rng, 2, 8, 8, c, n)
    label = label.at[1].set(-1)
    losses, hist, _ = fused_cos_tail(score, label, temb, iemb, n, tile=64)
    o_losses, o_hist, _ = _oracle(score, label, temb, iemb, n)
    np.testing.assert_allclose(losses, o_losses, rtol=2e-6, atol=2e-6)
    np.testing.assert_array_equal(hist, o_hist)
    assert float(losses[1]) == 0.0


def test_grad_matches_oracle(rng):
    b, h, w, c, n = 2, 24, 16, 12, 9
    score, label, temb, iemb = _data(rng, b, h, w, c, n, zero_row=True,
                                     zero_pixels=True)
    wvec = jnp.asarray(rng.randn(b).astype(np.float32))

    def fused_scalar(s):
        losses, _hist, ssum = fused_cos_tail(s, label, temb, iemb, n,
                                             tile=128)
        return jnp.sum(losses * wvec) + 0.37 * ssum

    def oracle_scalar(s):
        losses, _hist, ssum = _oracle(s, label, temb, iemb, n)
        return jnp.sum(losses * wvec) + 0.37 * ssum

    v1, g1 = jax.value_and_grad(fused_scalar)(score)
    v2, g2 = jax.value_and_grad(oracle_scalar)(score)
    np.testing.assert_allclose(v1, v2, rtol=2e-6, atol=2e-6)
    np.testing.assert_allclose(g1, g2, rtol=2e-5, atol=2e-6)


def test_grad_at_zero_norm_pixels(rng):
    """The double-where guard's gradient (d cos/d s = t̂ at ‖s‖ == 0) must
    match XLA's autodiff exactly — padding regions hit this every step."""
    b, h, w, c, n = 1, 8, 8, 6, 4
    score, label, temb, iemb = _data(rng, b, h, w, c, n)
    score = score.at[:, :4].set(0.0)
    g1 = jax.grad(lambda s: jnp.sum(
        fused_cos_tail(s, label, temb, iemb, n, tile=64)[0]))(score)
    g2 = jax.grad(lambda s: jnp.sum(
        _oracle(s, label, temb, iemb, n)[0]))(score)
    np.testing.assert_allclose(g1, g2, rtol=2e-5, atol=2e-6)


def test_train_step_equivalence(rng):
    """make_fcn_train_step with the fused tail == with the XLA tail (same
    params in, same params out) on a tiny model."""
    import os
    from test_training import tiny_cfg
    from zeroshotsemanticsegmentation_tpu.models import FCN32s
    from zeroshotsemanticsegmentation_tpu.train import make_fcn_optimizer
    from zeroshotsemanticsegmentation_tpu.train.state import TrainState
    from zeroshotsemanticsegmentation_tpu.train.steps import (
        make_fcn_train_step)

    cfg = tiny_cfg()
    c, n = 4, 21
    model = FCN32s(num_classes=c, dtype=jnp.float32,
                   channel_scale=cfg.channel_scale)
    img = jnp.asarray(rng.randn(2, 96, 96, 3).astype(np.float32) * 10)
    lbl = jnp.asarray(rng.randint(-1, n, (2, 96, 96)).astype(np.int32))
    batch = {"image": img, "label": lbl,
             "sizes": jnp.asarray(np.full((2, 2), 96, np.int32)),
             "num_real": jnp.asarray(2, jnp.int32)}
    params = model.init(jax.random.PRNGKey(0), img[:1], mode="both")["params"]
    embed = rng.randn(n, c).astype(np.float32)
    tx = make_fcn_optimizer(params, optim="adam", lr=1e-5)
    key = jax.random.PRNGKey(1)

    outs = {}
    for mode in ("0", "1"):
        os.environ["SZN_FUSED_TAIL"] = mode
        try:
            step = make_fcn_train_step(model, tx, loss_name="cos",
                                       num_classes=n, embeddings=embed)
            state = TrainState(params=params, opt_state=tx.init(params),
                               step=jnp.zeros((), jnp.int32))
            state, aux = step(state, batch, key)
            outs[mode] = (state, aux)
        finally:
            os.environ.pop("SZN_FUSED_TAIL", None)

    (s0, a0), (s1, a1) = outs["0"], outs["1"]
    np.testing.assert_allclose(a1["loss"], a0["loss"], rtol=1e-5, atol=1e-7)
    # the NNE argmax can flip on fp32 near-ties (smooth upsampled fields
    # cross class boundaries sub-pixel; (s/‖s‖)·ê vs (s·e)/(‖s‖‖e‖) round
    # differently) — row sums are tie-invariant (true labels only) and the
    # flipped mass must be a sliver of the batch
    h0, h1 = np.asarray(a0["hist"]), np.asarray(a1["hist"])
    np.testing.assert_array_equal(h1.sum(axis=1), h0.sum(axis=1))
    assert np.abs(h1 - h0).sum() <= max(16, 0.005 * h0.sum())
    np.testing.assert_allclose(a1["score_sum"], a0["score_sum"], rtol=1e-4)
    np.testing.assert_allclose(a1["score_fr_grad_sum"],
                               a0["score_fr_grad_sum"], rtol=1e-3, atol=1e-9)
    flat0 = jax.tree_util.tree_leaves(s0.params)
    flat1 = jax.tree_util.tree_leaves(s1.params)
    for x0, x1 in zip(flat0, flat1):
        np.testing.assert_allclose(x1, x0, rtol=1e-4, atol=1e-6)


def test_mesh_shard_map_matches_single(rng):
    """fused_cos_tail(mesh=...) — the kernel shard_mapped per data shard
    with psum'd hist/score_sum — matches the un-mapped kernel in values AND
    grads (GSPMD cannot partition a pallas_call; this is the mesh route the
    train step takes, train/steps.py make_fcn_train_step)."""
    from zeroshotsemanticsegmentation_tpu.parallel.mesh import make_mesh
    c, n = 12, 7
    score, label, temb, iemb = _data(rng, 8, 9, 11, c, n, zero_row=True,
                                     zero_pixels=True)
    mesh = make_mesh(4, 2)  # batch shards over 'data' only

    def tot(s, mesh):
        losses, hist, ssum = fused_cos_tail(s, label, temb, iemb, n,
                                            tile=256, mesh=mesh)
        # losses AND score_sum both carry gradients in the train step
        return jnp.sum(losses) + 0.01 * ssum, (losses, hist, ssum)

    (_, (rl, rh, rs)), rg = jax.value_and_grad(
        lambda s: tot(s, None), has_aux=True)(score)
    (_, (ml, mh, ms)), mg = jax.value_and_grad(
        lambda s: tot(s, mesh), has_aux=True)(score)
    np.testing.assert_allclose(np.asarray(ml), np.asarray(rl),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(mh), np.asarray(rh))
    np.testing.assert_allclose(float(ms), float(rs), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(mg), np.asarray(rg),
                               rtol=1e-6, atol=1e-7)


def test_mesh_batch_not_divisible_raises(rng):
    from zeroshotsemanticsegmentation_tpu.parallel.mesh import make_mesh
    score, label, temb, iemb = _data(rng, 3, 8, 8, 6, 5)
    with pytest.raises(ValueError, match="not divisible"):
        fused_cos_tail(score, label, temb, iemb, 5, mesh=make_mesh(4, 2))
