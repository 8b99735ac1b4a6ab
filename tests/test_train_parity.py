"""Torch-reference lockstep training parity.

The strongest air-gapped proxy for end-metric (mIoU) parity: an independent
torch implementation of the reference's *training dynamics* — forward
(models.py:27-193), losses (utils.py:19-102), NNE inference
(utils.py:159-185), optimizer parameter groups (train.py:125-133,302-331) and
update math — runs in lockstep with this framework's production train step
from identical fp32 weights and inputs. Asserted per step: loss, score sum,
score_fr gradient sum, NNE-prediction confusion matrices; after N steps:
parameter deltas.

Covers the three reference training modes:
  * Adam + cosine embedding regression (zero-shot configs 2,4,14,16,18)
  * SGD(momentum .99, wd 5e-4, bias lr x2) + summed CE (baseline config 1)
  * stage-2 seenmask head: Adam on the head only, size-averaged binary CE
    (trainer_seenmask.py:50-102)

Dropout is structurally pinned elsewhere (test_model.py); here rate=0 on both
sides so the trajectories are deterministic and comparable.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from zeroshotsemanticsegmentation_tpu.models import FCN32s
from zeroshotsemanticsegmentation_tpu.ops import bilinear_upsampling_kernel
from zeroshotsemanticsegmentation_tpu.train import (
    make_fcn_optimizer, make_seenmask_optimizer)
from zeroshotsemanticsegmentation_tpu.train.state import TrainState
from zeroshotsemanticsegmentation_tpu.train.steps import (
    make_fcn_train_step, make_seenmask_train_step)

SCALE = 0.25  # backbone width multiplier: keeps 6 CPU train steps ~seconds
H = W = 64
N_CLASS = 21

from torch_oracle import (  # noqa: E402 — tests dir module
    TorchFCN, np_hist, torch_cosine_loss, torch_cross_entropy2d,
    torch_infer_lbl, torch_infer_lbl_szn, torch_stage1_optimizer,
    torch_stage2_optimizer, np_label_accuracy_score)

# --------------------------------------------------------------------------
# shared fixtures
# --------------------------------------------------------------------------

def make_batches(rng, n_steps, *, frac_ignore=0.1):
    batches = []
    for _ in range(n_steps):
        img = rng.randn(1, H, W, 3).astype(np.float32)
        lbl = rng.randint(0, N_CLASS, (1, H, W)).astype(np.int32)
        lbl[rng.rand(1, H, W) < frac_ignore] = -1
        batches.append((img, lbl))
    return batches


def flax_to_numpy(params):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), params)


def torch_deltas(model, init_params):
    out = {}
    for name, conv in model.convs.items():
        k0 = np.asarray(init_params[name]["kernel"])
        k1 = conv.weight.detach().numpy().transpose(2, 3, 1, 0)
        out[name] = {"kernel": k1 - k0,
                     "bias": conv.bias.detach().numpy()
                     - np.asarray(init_params[name]["bias"])}
    # the trainable seenmask upscore (kernel only, no bias) — frozen in
    # stage 1, Adam-trained in stage 2 (reference train.py:304-307,324-327)
    out["seenmask_upscore"] = {
        "kernel": model.up_seenmask_score.detach().numpy()
        .transpose(2, 3, 0, 1)
        - np.asarray(init_params["seenmask_upscore"]["kernel"])}
    return out


def assert_tree_delta_close(jax_deltas, torch_deltas_, rtol=2e-3,
                            atol_scale=2e-3, max_outlier_frac=1e-4):
    """Element-wise delta agreement with an fp-noise outlier budget: Adam's
    g/sqrt(nu) amplifies last-ulp conv differences for a handful of elements
    with near-zero second moments, so demand (1 - max_outlier_frac) of
    elements within tolerance rather than all of them."""
    for name in jax_deltas:
        for leaf in jax_deltas[name]:  # upscore has no bias
            a = np.asarray(jax_deltas[name][leaf])
            b = torch_deltas_[name][leaf]
            scale = max(np.max(np.abs(b)), 1e-12)
            bad = ~np.isclose(a, b, rtol=rtol, atol=atol_scale * scale)
            frac = float(bad.mean())
            assert frac <= max_outlier_frac, (
                f"param delta mismatch: {name}/{leaf}: "
                f"{bad.sum()}/{bad.size} elements off "
                f"(max |a-b|={np.max(np.abs(a - b)):.3e}, scale={scale:.3e})")


def init_shared(seed=0, head_channels=20):
    model = FCN32s(num_classes=head_channels, channel_scale=SCALE,
                   dropout_rate=0.0)
    params = model.init(jax.random.PRNGKey(seed),
                        jnp.zeros((1, H, W, 3)), mode="both")["params"]
    return model, params


def jax_batch(img, lbl):
    return {"image": jnp.asarray(img), "label": jnp.asarray(lbl),
            "sizes": jnp.asarray(np.full((1, 2), H, np.int32)),
            "num_real": jnp.asarray(1, jnp.int32)}


# --------------------------------------------------------------------------
# the lockstep tests
# --------------------------------------------------------------------------

@pytest.mark.parametrize("optim,loss_name,lr", [
    # zero-shot configs: lr scaled up so deltas dominate fp32 conv noise
    ("adam", "cos", 1e-3),
    # baseline config 1: CE is a *sum* over pixels (utils.py:45-47) so its
    # grads are ~1e4 larger — reference uses lr 1e-10; 1e-6 keeps the
    # lockstep trajectory out of the chaotic regime while still exercising
    # momentum + weight decay accumulation
    ("sgd", "cross_entropy", 1e-6),
])
def test_train_lockstep_with_torch_oracle(optim, loss_name, lr):
    n_steps = 5
    rng = np.random.RandomState(42)
    zeroshot = loss_name != "cross_entropy"
    head = 20 if zeroshot else N_CLASS
    model, params = init_shared(head_channels=head)
    init_params = flax_to_numpy(params)
    batches = make_batches(rng, n_steps)

    embeddings = None
    if zeroshot:
        e = rng.randn(N_CLASS, head).astype(np.float32)
        embeddings = e / np.linalg.norm(e, axis=1, keepdims=True)

    # --- jax: the production step factories
    tx = make_fcn_optimizer(params, optim=optim, lr=lr)
    step = make_fcn_train_step(
        model, tx, loss_name=loss_name, num_classes=N_CLASS,
        embeddings=None if embeddings is None else jnp.asarray(embeddings))
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    jax_log = []
    for img, lbl in batches:
        state, aux = step(state, jax_batch(img, lbl), jax.random.PRNGKey(0))
        jax_log.append({k: np.asarray(v) for k, v in aux.items()})

    # --- torch: independent reference-semantics implementation
    tmodel = TorchFCN(init_params)
    topt = torch_stage1_optimizer(tmodel, optim, lr)
    temb = None if embeddings is None else torch.from_numpy(embeddings)
    torch_log = []
    for img, lbl in batches:
        x = torch.from_numpy(img.transpose(0, 3, 1, 2).copy())
        t = torch.from_numpy(lbl.astype(np.int64))
        topt.zero_grad()
        score = tmodel(x, mode="fcn")
        if loss_name == "cos":
            tvec = embeddings[np.clip(lbl, 0, None)]  # (1,H,W,C) lookup
            tvec = torch.from_numpy(tvec.transpose(0, 3, 1, 2).copy())
            loss = torch_cosine_loss(score, t, tvec)
        else:
            loss = torch_cross_entropy2d(score, t) / 1  # /num_real at bs=1
        loss.backward()
        if temb is not None:
            pred = torch_infer_lbl(score.detach(), temb)
        else:
            pred = score.detach().argmax(1).numpy()
        torch_log.append({
            "loss": float(loss.detach()),
            "score_sum": float(score.detach().sum()),
            "grad_sum": float(tmodel.convs["score_fr"].weight.grad.sum()),
            "hist": np_hist(lbl, pred, N_CLASS),
        })
        topt.step()

    # --- per-step agreement
    for i, (ja, to) in enumerate(zip(jax_log, torch_log)):
        np.testing.assert_allclose(float(ja["loss"]), to["loss"], rtol=1e-4,
                                   err_msg=f"loss diverged at step {i}")
        np.testing.assert_allclose(float(ja["score_sum"]), to["score_sum"],
                                   rtol=1e-3, atol=1.0,
                                   err_msg=f"score sum diverged at step {i}")
        # the grad *sum* is cancellation-dominated (elements O(0.1), sum
        # O(1e-4)), so this is only a gross-error sanity check — true grad
        # parity is pinned element-wise by the end-state delta check below
        assert abs(float(ja["score_fr_grad_sum"]) - to["grad_sum"]) <= \
            max(1e-3, 0.05 * abs(to["grad_sum"])), \
            f"grad sum diverged at step {i}"
        # NNE predictions: identical up to fp argmax ties (<0.5% of pixels)
        l1 = np.abs(ja["hist"].astype(np.int64) - to["hist"]).sum()
        assert l1 <= 2 * 0.005 * H * W, (
            f"step {i}: {l1 // 2} prediction pixels diverged")

    # --- end-state parameter deltas
    jax_deltas = jax.tree_util.tree_map(
        lambda a, b: np.asarray(a) - b, state.params, init_params)
    assert_tree_delta_close(jax_deltas, torch_deltas(tmodel, init_params))
    # frozen head: bitwise identical on both sides
    np.testing.assert_array_equal(
        np.asarray(state.params["seenmask_score"]["kernel"]),
        init_params["seenmask_score"]["kernel"])


def test_seenmask_stage_lockstep_with_torch_oracle():
    """Stage-2: Adam on the seenmask head AND the seenmask upscore, size-
    averaged binary CE (trainer_seenmask.py:50-102, train.py:168-171,
    302-307 — the upscore is genuinely optimized in the reference)."""
    n_steps = 3
    rng = np.random.RandomState(7)
    train_unseen = (1, 13)
    model, params = init_shared(seed=1)
    init_params = flax_to_numpy(params)
    batches = make_batches(rng, n_steps)
    lr = 1e-3

    seen = np.array([c not in train_unseen for c in range(N_CLASS)])
    tx = make_seenmask_optimizer(params, lr=lr)
    step = make_seenmask_train_step(model, tx, seen_vec=jnp.asarray(seen))
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    jax_losses = []
    for img, lbl in batches:
        state, aux = step(state, jax_batch(img, lbl), jax.random.PRNGKey(0))
        jax_losses.append(float(aux["loss"]))

    tmodel = TorchFCN(init_params)
    # reference freezes everything but the head + its upscore
    # (train.py:166-171)
    for p in tmodel.parameters():
        p.requires_grad = False
    head = tmodel.convs["seenmask_score"]
    head.weight.requires_grad = True
    head.bias.requires_grad = True
    tmodel.up_seenmask_score.requires_grad = True
    topt = torch_stage2_optimizer(tmodel, lr)
    torch_losses = []
    for img, lbl in batches:
        x = torch.from_numpy(img.transpose(0, 3, 1, 2).copy())
        # reference in1d: unlabeled (-1) maps to 0 = not-seen
        tgt = np.isin(lbl, np.where(seen)[0]).astype(np.int64)
        topt.zero_grad()
        score = tmodel(x, mode="seenmask")
        loss = torch_cross_entropy2d(score, torch.from_numpy(tgt),
                                     size_average=True)
        loss.backward()
        torch_losses.append(float(loss.detach()))
        topt.step()

    np.testing.assert_allclose(jax_losses, torch_losses, rtol=1e-4)
    # head deltas agree; backbone bitwise frozen on both sides
    d_jax = (np.asarray(state.params["seenmask_score"]["kernel"])
             - init_params["seenmask_score"]["kernel"])
    d_torch = (head.weight.detach().numpy().transpose(2, 3, 1, 0)
               - init_params["seenmask_score"]["kernel"])
    np.testing.assert_allclose(d_jax, d_torch, rtol=2e-3,
                               atol=2e-3 * np.max(np.abs(d_torch)))
    # the seenmask upscore MOVED, and moved identically (reference
    # train.py:304-307: it is in the stage-2 Adam group)
    up0 = init_params["seenmask_upscore"]["kernel"]
    d_up_jax = (np.asarray(state.params["seenmask_upscore"]["kernel"]) - up0)
    d_up_torch = (tmodel.up_seenmask_score.detach().numpy()
                  .transpose(2, 3, 0, 1) - up0)
    assert np.abs(d_up_jax).max() > 0, "stage 2 must train the upscore"
    np.testing.assert_allclose(d_up_jax, d_up_torch, rtol=2e-3,
                               atol=2e-3 * np.max(np.abs(d_up_torch)))
    for name in ("conv1_1", "fc7", "score_fr"):
        np.testing.assert_array_equal(
            np.asarray(state.params[name]["kernel"]),
            init_params[name]["kernel"])
        assert tmodel.convs[name].weight.grad is None


def test_szn_eval_path_lockstep_with_torch_oracle():
    """The test_all validation path (reference Trainer.validate with
    both_fcn_and_seenmask, trainer_fcn.py:123-147,222-244): forward_szn
    stitched inference + the overall/seen/unseen histogram breakdown must
    match the independent torch oracle from identical fp32 weights."""
    from zeroshotsemanticsegmentation_tpu.ops.metrics import (
        unseen_mask_vector)
    from zeroshotsemanticsegmentation_tpu.train.steps import (
        make_szn_eval_step)

    rng = np.random.RandomState(3)
    val_unseen = (6, 7, 10, 14)
    model, params = init_shared(seed=2)
    init_params = flax_to_numpy(params)
    e = rng.randn(N_CLASS, 20).astype(np.float32)
    embeddings = e / np.linalg.norm(e, axis=1, keepdims=True)
    uv = unseen_mask_vector(N_CLASS, list(val_unseen))

    step = make_szn_eval_step(
        model, loss_name="cos", num_classes=N_CLASS,
        embeddings=jnp.asarray(embeddings),
        all_unseen_vec=jnp.asarray(uv), val_unseen_vec=jnp.asarray(uv))
    tmodel = TorchFCN(init_params)
    temb = torch.from_numpy(embeddings)

    batches = make_batches(rng, 4)
    jax_hists = np.zeros((3, N_CLASS, N_CLASS), np.int64)
    jax_loss = 0.0
    trues, preds = [], []
    for img, lbl in batches:
        out = step(params, jax_batch(img, lbl))
        jax_hists += np.asarray(out["hists"])
        jax_loss += float(out["loss_sum"])

        x = torch.from_numpy(img.transpose(0, 3, 1, 2).copy())
        with torch.no_grad():
            fcn_score, seen_score = tmodel(x, mode="both")
            tvec = embeddings[np.clip(lbl, 0, None)]
            tloss = torch_cosine_loss(
                fcn_score, torch.from_numpy(lbl.astype(np.int64)),
                torch.from_numpy(tvec.transpose(0, 3, 1, 2).copy()))
        pred = torch_infer_lbl_szn(fcn_score, seen_score, embeddings, uv)
        trues.append(lbl)
        preds.append(pred)
        np.testing.assert_allclose(float(out["loss_sum"]), float(tloss),
                                   rtol=1e-4)
        flips = (np.asarray(out["pred"]) != pred).mean()
        assert flips < 0.005, f"{flips:.4f} stitched predictions diverged"

    torch_hists = np_label_accuracy_score(trues, preds, N_CLASS,
                                          unseen=list(val_unseen))
    # identical up to the fp argmax ties counted above
    assert np.abs(jax_hists - torch_hists).sum() <= \
        2 * 0.005 * len(batches) * H * W
    # and the derived metric quadruples agree (NaN patterns included)
    from zeroshotsemanticsegmentation_tpu.ops import hist_to_metrics
    from torch_oracle import np_hist_to_metrics
    for grp in range(3):
        ours = np.asarray(hist_to_metrics(jax_hists[grp]), np.float64)
        ref = np.asarray(np_hist_to_metrics(torch_hists[grp]), np.float64)
        np.testing.assert_allclose(ours, ref, rtol=5e-3, atol=5e-3,
                                   equal_nan=True)
