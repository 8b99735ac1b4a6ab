#!/usr/bin/env python
"""Air-gapped mIoU-parity evidence: full-width torch lockstep + bf16 drift.

The reference's end metrics (seen/unseen/overall mIoU on VOC val,
trainer_fcn.py:222-244) can't be reproduced here (zero egress), so this
runner pushes the strongest air-gapped proxies to their ceiling and records
the numbers in docs/PARITY_EVIDENCE.md:

  lockstep  — FULL-WIDTH fp32 lockstep vs the independent torch oracle
              (tests/torch_oracle.py) at reduced resolution: N steps of
              stage 1 (adam+cos, config-14 semantics), N steps of stage 2
              (seenmask head), and the test_all eval path with the
              overall/seen/unseen histogram breakdown. Asserts per-step
              losses/confusion matrices and end-state parameter deltas.
              CPU, fp32 — deterministic up to BLAS reduction order.

  bf16      — production-pipeline drift bound on the real TPU: the serving
              stack (bfloat16, support-pruned pad-100 geometry, fused
              projection/upsample/argmax Pallas kernel) vs the fp32 plain
              path from the SAME weights on synthetic val data. Reports the
              prediction flip rate and the metric deltas (overall + seen +
              unseen quadruples) — the number that bounds what bf16 can
              cost on real data.

Results land in docs/parity/<mode>.json; re-generate the markdown table in
docs/PARITY_EVIDENCE.md from them with `render`.
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import sys
import time

_REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path[:0] = [_REPO, osp.join(_REPO, "tests")]

OUT_DIR = osp.join(_REPO, "docs", "parity")


def _save(name: str, payload: dict) -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    with open(osp.join(OUT_DIR, f"{name}.json"), "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    print(f"wrote docs/parity/{name}.json")


# --------------------------------------------------------------------------
# lockstep (CPU, fp32, full width)
# --------------------------------------------------------------------------

def run_lockstep(scale: float, size: int, steps: int) -> dict:
    # single-threaded XLA:CPU execution (the 8-virtual-device flag splits
    # the thread pool): multithreaded conv reductions change fp32 summation
    # order enough that 5 adam steps amplify it to %-level param-delta noise
    # vs single-threaded torch; single-threaded both sides agree to ~1e-5
    # relL2 (measured). The host has 1 core anyway.
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import torch

    from torch_oracle import (
        TorchFCN, np_hist, np_label_accuracy_score, np_hist_to_metrics,
        torch_cosine_loss, torch_cross_entropy2d, torch_infer_lbl_szn,
        torch_stage1_optimizer)
    from zeroshotsemanticsegmentation_tpu.models import FCN32s
    from zeroshotsemanticsegmentation_tpu.ops import hist_to_metrics
    from zeroshotsemanticsegmentation_tpu.ops.metrics import (
        unseen_mask_vector)
    from zeroshotsemanticsegmentation_tpu.train import (
        make_fcn_optimizer, make_seenmask_optimizer)
    from zeroshotsemanticsegmentation_tpu.train.state import TrainState
    from zeroshotsemanticsegmentation_tpu.train.steps import (
        make_fcn_train_step, make_seenmask_train_step, make_szn_eval_step)

    n_class = 21
    train_unseen = (1, 13)
    val_unseen = (6, 7, 10, 14, 15, 16, 17, 18, 19, 20)  # config 14
    rng = np.random.RandomState(42)
    torch.set_num_threads(1)

    model = FCN32s(num_classes=20, channel_scale=scale, dropout_rate=0.0)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, size, size, 3)), mode="both")["params"]
    init_params = jax.tree_util.tree_map(np.asarray, params)
    e = rng.randn(n_class, 20).astype(np.float32)
    embeddings = e / np.linalg.norm(e, axis=1, keepdims=True)

    def batch(img, lbl):
        return {"image": jnp.asarray(img), "label": jnp.asarray(lbl),
                "sizes": jnp.asarray(np.full((1, 2), size, np.int32)),
                "num_real": jnp.asarray(1, jnp.int32)}

    def make_data(n, lo=0):
        out = []
        for _ in range(n):
            img = rng.randn(1, size, size, 3).astype(np.float32)
            lbl = rng.randint(lo, n_class, (1, size, size)).astype(np.int32)
            lbl[rng.rand(1, size, size) < 0.1] = -1
            out.append((img, lbl))
        return out

    report = {"scale": scale, "size": size, "steps": steps}

    # ---- stage 1: adam + cos at config-14's TRUE lr (1e-5). Larger lrs
    # (1e-3) put 25 full-width steps in the chaotic regime where last-ulp
    # conv reduction-order noise amplifies to %-level end-state deltas;
    # at the reference lr the trajectories stay glued.
    lr = 1e-5
    tx = make_fcn_optimizer(params, optim="adam", lr=lr)
    step = make_fcn_train_step(model, tx, loss_name="cos", num_classes=n_class,
                               embeddings=jnp.asarray(embeddings))
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    tmodel = TorchFCN(init_params)
    topt = torch_stage1_optimizer(tmodel, "adam", lr)

    data = make_data(steps)
    t0 = time.time()
    max_loss_rel = 0.0
    max_flip_frac = 0.0
    for i, (img, lbl) in enumerate(data):
        state, aux = step(state, batch(img, lbl), jax.random.PRNGKey(0))
        x = torch.from_numpy(img.transpose(0, 3, 1, 2).copy())
        t = torch.from_numpy(lbl.astype(np.int64))
        topt.zero_grad()
        score = tmodel(x, mode="fcn")
        tvec = torch.from_numpy(
            embeddings[np.clip(lbl, 0, None)].transpose(0, 3, 1, 2).copy())
        loss = torch_cosine_loss(score, t, tvec)
        loss.backward()
        from torch_oracle import torch_infer_lbl
        pred = torch_infer_lbl(score.detach(),
                               torch.from_numpy(embeddings))
        topt.step()

        jl, tl = float(aux["loss"]), float(loss.detach())
        rel = abs(jl - tl) / max(abs(tl), 1e-12)
        max_loss_rel = max(max_loss_rel, rel)
        l1 = np.abs(np.asarray(aux["hist"], np.int64)
                    - np_hist(lbl, pred, n_class)).sum()
        max_flip_frac = max(max_flip_frac, l1 / 2 / (size * size))
        assert rel < 1e-3, f"stage1 loss diverged at step {i}: {jl} vs {tl}"
        assert l1 <= 2 * 0.005 * size * size, f"stage1 preds diverged at {i}"
        print(f"stage1 step {i}: loss {jl:.6f}/{tl:.6f} "
              f"rel {rel:.2e} flips {l1 // 2}", flush=True)

    # end-state deltas. Under ADAM, element updates are sign(m)/sqrt(nu)-
    # normalized, so elements whose true gradient sits at the fp32
    # reduction-order noise floor take a full ±lr step in a noise-chosen
    # direction — early conv layers (smallest grads) accumulate a few % of
    # delta energy in such sign flips at ANY lr. That is a property of
    # adam on fp noise, not a semantic gap (losses/predictions above stay
    # identical), so the adam check is deliberately loose per leaf and the
    # TIGHT delta-parity claim comes from the SGD run below, whose linear
    # updates keep noise proportional (~1e-5 relL2 measured).
    per_leaf = {}
    worst_rel = {"rel_l2": 0.0, "name": ""}
    num = den = 0.0
    for name, leaves in state.params.items():
        for leaf in ("kernel", "bias"):
            a = np.asarray(leaves[leaf]) - init_params[name][leaf]
            conv = tmodel.convs[name]
            tw = (conv.weight if leaf == "kernel" else conv.bias)
            b = tw.detach().numpy()
            if leaf == "kernel":
                b = b.transpose(2, 3, 1, 0)
            b = b - init_params[name][leaf]
            num += float(np.sum((a - b) ** 2))
            den += float(np.sum(b ** 2))
            rel = float(np.linalg.norm(a - b)
                        / max(np.linalg.norm(b), 1e-12))
            per_leaf[f"{name}/{leaf}"] = round(rel, 7)
            if rel > worst_rel["rel_l2"] and name != "seenmask_score":
                worst_rel = {"rel_l2": rel, "name": f"{name}/{leaf}"}
    global_rel = (num / max(den, 1e-24)) ** 0.5
    assert global_rel <= 5e-2, f"adam GLOBAL delta rel-L2 {global_rel}"
    report["stage1"] = {
        "lr": lr, "max_loss_rel": max_loss_rel,
        "max_pred_flip_frac": max_flip_frac,
        "global_delta_rel_l2": global_rel,
        "worst_param_delta_rel_l2": worst_rel["rel_l2"],
        "worst_rel_l2_param": worst_rel["name"],
        "delta_rel_l2_per_leaf": per_leaf,
        "wall_s": round(time.time() - t0, 1)}
    print("stage1 OK:", report["stage1"], flush=True)

    # ---- stage 1b: SGD + summed CE (config-1 semantics) — the tight
    # delta-parity check: momentum/weight-decay accumulation is linear in
    # the gradients, so torch/XLA fp32 noise stays proportional instead of
    # being renormalized. Fresh params (baseline config trains from
    # scratch in embed_dim=n_class space).
    sgd_model = FCN32s(num_classes=n_class, channel_scale=scale,
                       dropout_rate=0.0)
    sgd_params = sgd_model.init(jax.random.PRNGKey(1),
                                jnp.zeros((1, size, size, 3)),
                                mode="both")["params"]
    sgd_init = jax.tree_util.tree_map(np.asarray, sgd_params)
    sgd_lr = 1e-6  # summed-CE grads are ~1e4 x cos grads (utils.py:45-47)
    tx_s = make_fcn_optimizer(sgd_params, optim="sgd", lr=sgd_lr)
    step_s = make_fcn_train_step(sgd_model, tx_s, loss_name="cross_entropy",
                                 num_classes=n_class)
    state_s = TrainState(params=sgd_params, opt_state=tx_s.init(sgd_params),
                         step=jnp.zeros((), jnp.int32))
    tmodel_s = TorchFCN(sgd_init)
    topt_s = torch_stage1_optimizer(tmodel_s, "sgd", sgd_lr)
    t0 = time.time()
    max_loss_rel_s = 0.0
    for i, (img, lbl) in enumerate(make_data(steps)):
        state_s, aux = step_s(state_s, batch(img, lbl), jax.random.PRNGKey(0))
        xx = torch.from_numpy(img.transpose(0, 3, 1, 2).copy())
        tt = torch.from_numpy(lbl.astype(np.int64))
        topt_s.zero_grad()
        score = tmodel_s(xx, mode="fcn")
        loss = torch_cross_entropy2d(score, tt)
        loss.backward()
        topt_s.step()
        jl, tl = float(aux["loss"]), float(loss.detach())
        rel = abs(jl - tl) / max(abs(tl), 1e-12)
        max_loss_rel_s = max(max_loss_rel_s, rel)
        assert rel < 1e-3, f"sgd loss diverged at step {i}"
        print(f"stage1-sgd step {i}: loss {jl:.4f}/{tl:.4f} rel {rel:.2e}",
              flush=True)
    # per-leaf numbers are RECORDED (the informative table: first-layer
    # leaves sit at ~1e-2 — smallest grads, deepest noise accumulation —
    # later layers orders of magnitude tighter); the ASSERT is on the
    # global delta vector, which weights leaves by their actual delta
    # energy and is the number an end-metric cares about
    worst_sgd = {"rel_l2": 0.0, "name": ""}
    sgd_leaves = {}
    num = den = 0.0
    for name, leaves in state_s.params.items():
        if name == "seenmask_score":
            continue
        for leaf in ("kernel", "bias"):
            a = np.asarray(leaves[leaf]) - sgd_init[name][leaf]
            conv = tmodel_s.convs[name]
            tw = (conv.weight if leaf == "kernel" else conv.bias)
            b = tw.detach().numpy()
            if leaf == "kernel":
                b = b.transpose(2, 3, 1, 0)
            b = b - sgd_init[name][leaf]
            num += float(np.sum((a - b) ** 2))
            den += float(np.sum(b ** 2))
            rel = float(np.linalg.norm(a - b)
                        / max(np.linalg.norm(b), 1e-12))
            sgd_leaves[f"{name}/{leaf}"] = round(rel, 7)
            if rel > worst_sgd["rel_l2"]:
                worst_sgd = {"rel_l2": rel, "name": f"{name}/{leaf}"}
    global_rel = (num / max(den, 1e-24)) ** 0.5
    assert global_rel <= 5e-3, f"sgd GLOBAL delta rel-L2 {global_rel}"
    report["stage1_sgd"] = {
        "lr": sgd_lr, "max_loss_rel": max_loss_rel_s,
        "global_delta_rel_l2": global_rel,
        "worst_param_delta_rel_l2": worst_sgd["rel_l2"],
        "worst_rel_l2_param": worst_sgd["name"],
        "delta_rel_l2_per_leaf": sgd_leaves,
        "wall_s": round(time.time() - t0, 1)}
    print("stage1-sgd OK:", report["stage1_sgd"], flush=True)

    # ---- stage 2: seenmask head on the stage-1 weights (both sides carry
    # their own trained state forward, mirroring the two-stage experiment)
    seen = np.array([c not in train_unseen for c in range(n_class)])
    tx2 = make_seenmask_optimizer(state.params, lr=1e-3)
    step2 = make_seenmask_train_step(model, tx2, seen_vec=jnp.asarray(seen))
    state2 = TrainState(params=state.params, opt_state=tx2.init(state.params),
                        step=jnp.zeros((), jnp.int32))
    # reference stage 2 trains the head AND the seenmask upscore
    # (train.py:168-171,304-307)
    from torch_oracle import torch_stage2_optimizer
    for p in tmodel.parameters():
        p.requires_grad = False
    head = tmodel.convs["seenmask_score"]
    head.weight.requires_grad = True
    head.bias.requires_grad = True
    tmodel.up_seenmask_score.requires_grad = True
    topt2 = torch_stage2_optimizer(tmodel, 1e-3)

    t0 = time.time()
    max_loss_rel2 = 0.0
    for i, (img, lbl) in enumerate(make_data(steps)):
        state2, aux = step2(state2, batch(img, lbl), jax.random.PRNGKey(0))
        x = torch.from_numpy(img.transpose(0, 3, 1, 2).copy())
        tgt = np.isin(lbl, np.where(seen)[0]).astype(np.int64)
        topt2.zero_grad()
        score = tmodel(x, mode="seenmask")
        loss = torch_cross_entropy2d(score, torch.from_numpy(tgt),
                                     size_average=True)
        loss.backward()
        topt2.step()
        jl, tl = float(aux["loss"]), float(loss.detach())
        rel = abs(jl - tl) / max(abs(tl), 1e-12)
        max_loss_rel2 = max(max_loss_rel2, rel)
        assert rel < 1e-3, f"stage2 loss diverged at step {i}"
        print(f"stage2 step {i}: loss {jl:.6f}/{tl:.6f} rel {rel:.2e}",
              flush=True)
    d_jax = (np.asarray(state2.params["seenmask_score"]["kernel"])
             - np.asarray(state.params["seenmask_score"]["kernel"]))
    d_torch = head.weight.detach().numpy().transpose(2, 3, 1, 0) - (
        np.asarray(state.params["seenmask_score"]["kernel"]))
    sc = max(np.max(np.abs(d_torch)), 1e-12)
    # informative: elementwise outlier fraction. The ASSERT is the global
    # delta rel-L2 (same rationale as stage 1: adam renormalizes noise-floor
    # gradient elements to full ±lr steps, so at full width a handful of the
    # 8192 head elements land outside any elementwise band while the delta
    # vector as a whole stays glued).
    bad2 = float((~np.isclose(d_jax, d_torch, rtol=2e-3,
                              atol=2e-3 * sc)).mean())
    rel2 = float(np.linalg.norm(d_jax - d_torch)
                 / max(np.linalg.norm(d_torch), 1e-12))
    assert rel2 <= 5e-2, f"stage2 head delta global rel-L2 {rel2}"
    report["stage2"] = {"max_loss_rel": max_loss_rel2,
                        "head_delta_global_rel_l2": rel2,
                        "head_delta_outlier_frac": bad2,
                        "wall_s": round(time.time() - t0, 1)}
    print("stage2 OK:", report["stage2"], flush=True)

    # ---- test_all eval path on the two-stage-trained weights
    uv = unseen_mask_vector(n_class, list(val_unseen))
    estep = make_szn_eval_step(
        model, loss_name="cos", num_classes=n_class,
        embeddings=jnp.asarray(embeddings), all_unseen_vec=jnp.asarray(uv),
        val_unseen_vec=jnp.asarray(uv))
    jax_hists = np.zeros((3, n_class, n_class), np.int64)
    trues, preds = [], []
    eval_loss_j = eval_loss_t = 0.0
    for img, lbl in make_data(max(6, steps // 4)):
        out = estep(state2.params, batch(img, lbl))
        jax_hists += np.asarray(out["hists"])
        eval_loss_j += float(out["loss_sum"])
        x = torch.from_numpy(img.transpose(0, 3, 1, 2).copy())
        with torch.no_grad():
            fcn_score, seen_score = tmodel(x, mode="both")
            tvec = torch.from_numpy(embeddings[np.clip(lbl, 0, None)]
                                    .transpose(0, 3, 1, 2).copy())
            eval_loss_t += float(torch_cosine_loss(
                fcn_score, torch.from_numpy(lbl.astype(np.int64)), tvec))
        preds.append(torch_infer_lbl_szn(fcn_score, seen_score,
                                         embeddings, uv))
        trues.append(lbl)
    torch_hists = np_label_accuracy_score(trues, preds, n_class,
                                          unseen=list(val_unseen))
    hist_l1 = int(np.abs(jax_hists - torch_hists).sum())
    groups = {}
    for gi, gname in enumerate(("overall", "seen", "unseen")):
        ours = np.asarray(hist_to_metrics(jax_hists[gi]), np.float64)
        ref = np.asarray(np_hist_to_metrics(torch_hists[gi]), np.float64)
        np.testing.assert_allclose(ours, ref, rtol=5e-3, atol=5e-3,
                                   equal_nan=True)
        groups[gname] = {
            "ours": [round(float(v), 6) for v in ours],
            "torch": [round(float(v), 6) for v in ref],
            "max_abs_delta": float(np.nanmax(np.abs(ours - ref)))}
    rel = abs(eval_loss_j - eval_loss_t) / max(abs(eval_loss_t), 1e-12)
    assert rel < 1e-3
    report["eval"] = {"val_loss_rel": rel, "hist_l1": hist_l1,
                      "metrics": groups}
    print("eval OK:", json.dumps(report["eval"], indent=1), flush=True)
    return report


# --------------------------------------------------------------------------
# bf16 production-pipeline drift (real TPU)
# --------------------------------------------------------------------------

def run_bf16(batches: int, batch_size: int, size: int,
             train_steps: int) -> dict:
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      osp.expanduser("~/.cache/zss_jax_cache"))
    import jax.numpy as jnp
    import numpy as np

    from zeroshotsemanticsegmentation_tpu.models import FCN32s
    from zeroshotsemanticsegmentation_tpu.ops import (
        hist_to_metrics, infer_labels_szn, zeroshot_hists)
    from zeroshotsemanticsegmentation_tpu.ops.metrics import (
        unseen_mask_vector)
    from zeroshotsemanticsegmentation_tpu.ops.szn_fused import (
        infer_labels_szn_fused)
    from zeroshotsemanticsegmentation_tpu.train import make_fcn_optimizer
    from zeroshotsemanticsegmentation_tpu.train.state import TrainState
    from zeroshotsemanticsegmentation_tpu.train.steps import (
        make_fcn_train_step)

    assert jax.default_backend() == "tpu", (
        "bf16 drift study must run on the real TPU (the production path)")
    n_class = 21
    val_unseen = (6, 7, 10, 14, 15, 16, 17, 18, 19, 20)
    rng = np.random.RandomState(0)
    e = rng.randn(n_class, 20).astype(np.float32)
    embeddings = jnp.asarray(e / np.linalg.norm(e, axis=1, keepdims=True))
    uv = jnp.asarray(unseen_mask_vector(n_class, list(val_unseen)))

    # weights: a briefly-trained model (random weights give degenerate
    # near-tie scores that overstate flip rates; a short synthetic training
    # run produces structured score maps like a real checkpoint's)
    model_bf16 = FCN32s(num_classes=20, dtype=jnp.bfloat16, prune_pad=True,
                        fused_block1=True)
    model_fp32 = FCN32s(num_classes=20, dtype=jnp.float32, prune_pad=False)
    params = jax.jit(lambda: model_bf16.init(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)),
        mode="both"))()["params"]
    tx = make_fcn_optimizer(params, optim="adam", lr=1e-4)
    step = make_fcn_train_step(model_bf16, tx, loss_name="cos",
                               num_classes=n_class, embeddings=embeddings)
    state = TrainState(params=params, opt_state=jax.jit(tx.init)(params),
                       step=jnp.zeros((), jnp.int32))
    for i in range(train_steps):
        img = rng.randn(batch_size, size, size, 3).astype(np.float32) * 40
        lbl = rng.randint(-1, n_class,
                          (batch_size, size, size)).astype(np.int32)
        b = {"image": jnp.asarray(img), "label": jnp.asarray(lbl),
             "sizes": jnp.asarray(np.full((batch_size, 2), size, np.int32)),
             "num_real": jnp.asarray(batch_size, jnp.int32)}
        state, aux = step(state, b, jax.random.PRNGKey(0))
    params = state.params
    jax.block_until_ready(jax.tree_util.tree_leaves(params)[0])
    print(f"pre-trained {train_steps} steps; final loss "
          f"{float(aux['loss']):.4f}", flush=True)

    @jax.jit
    def prod_pred(params, images):
        f, s = model_bf16.apply({"params": params}, images, mode="raw")
        return infer_labels_szn_fused(f, s, embeddings, uv, (size, size))

    @jax.jit
    def plain_pred(params, images):
        f, s = model_fp32.apply({"params": params}, images, mode="both")
        return infer_labels_szn(f, s, embeddings, uv)

    flips = 0
    total = 0
    hists = {"prod": np.zeros((3, n_class, n_class), np.int64),
             "plain": np.zeros((3, n_class, n_class), np.int64)}
    for bi in range(batches):
        img = rng.randn(batch_size, size, size, 3).astype(np.float32) * 40
        lbl = rng.randint(-1, n_class,
                          (batch_size, size, size)).astype(np.int32)
        images = jnp.asarray(img)
        labels = jnp.asarray(lbl)
        p_prod = prod_pred(params, images)
        p_plain = plain_pred(params, images)
        flips += int(jnp.sum(p_prod != p_plain))
        total += p_prod.size
        hists["prod"] += np.asarray(
            zeroshot_hists(labels, p_prod, n_class, uv))
        hists["plain"] += np.asarray(
            zeroshot_hists(labels, p_plain, n_class, uv))
        print(f"batch {bi}: cumulative flip rate {flips / total:.5f}",
              flush=True)

    groups = {}
    for gi, gname in enumerate(("overall", "seen", "unseen")):
        mp = np.asarray(hist_to_metrics(hists["prod"][gi]), np.float64)
        mf = np.asarray(hist_to_metrics(hists["plain"][gi]), np.float64)
        groups[gname] = {
            "prod_bf16_pruned_fused": [round(float(v), 6) for v in mp],
            "plain_fp32": [round(float(v), 6) for v in mf],
            "abs_delta": [round(float(abs(a - b)), 6)
                          for a, b in zip(mp, mf)]}
    out = {"flip_rate": flips / total, "pixels": total,
           "batches": batches, "batch_size": batch_size, "size": size,
           "train_steps": train_steps, "metric_order":
           ["pxl_acc", "class_acc", "mean_iu", "fwavacc"], "metrics": groups}
    print(json.dumps(out, indent=1), flush=True)
    return out


# --------------------------------------------------------------------------

def render() -> None:
    """Regenerate docs/PARITY_EVIDENCE.md from the saved JSON results."""
    parts = ["# Air-gapped mIoU-parity evidence",
             "",
             "Generated by `scripts/parity_evidence.py`; JSON artifacts in "
             "`docs/parity/`. Together these bound the end-metric risk of "
             "an egress-day VOC/SBD run to (a) dataset/weight acquisition "
             "and (b) fp32-vs-bf16 drift quantified below.",
             ""]
    lp = osp.join(OUT_DIR, "lockstep.json")
    if osp.exists(lp):
        r = json.load(open(lp))
        parts += [
            "## Full-width fp32 torch lockstep (CPU)",
            "",
            f"- geometry: channel_scale={r['scale']}, {r['size']}² inputs, "
            f"{r['steps']} steps per stage",
            f"- stage 1 (adam+cos, config-14 semantics, reference lr): max "
            f"per-step loss rel-err {r['stage1']['max_loss_rel']:.2e}, max "
            f"NNE prediction flip fraction "
            f"{r['stage1']['max_pred_flip_frac']:.2e}; end-state param-delta "
            f"global rel-L2 {r['stage1']['global_delta_rel_l2']:.2e}, worst "
            f"leaf {r['stage1']['worst_param_delta_rel_l2']:.2e} "
            f"({r['stage1']['worst_rel_l2_param']}) — adam renormalizes "
            "noise-floor gradient elements to full ±lr steps, so early-conv "
            "deltas carry a small fp tail; the tight delta claim is the SGD "
            "row",
            f"- stage 1 SGD (summed CE, config-1 semantics): max loss "
            f"rel-err {r['stage1_sgd']['max_loss_rel']:.2e}, global "
            f"param-delta rel-L2 "
            f"{r['stage1_sgd']['global_delta_rel_l2']:.2e} (worst leaf "
            f"{r['stage1_sgd']['worst_param_delta_rel_l2']:.2e}, "
            f"{r['stage1_sgd']['worst_rel_l2_param']})",
            f"- stage 2 (seenmask head): max loss rel-err "
            f"{r['stage2']['max_loss_rel']:.2e}, head-delta global rel-L2 "
            f"{r['stage2']['head_delta_global_rel_l2']:.2e} (elementwise "
            f"outlier fraction {r['stage2']['head_delta_outlier_frac']:.2e})",
            f"- test_all eval path: val-loss rel-err "
            f"{r['eval']['val_loss_rel']:.2e}, 3-histogram L1 "
            f"{r['eval']['hist_l1']} (argmax fp ties only); "
            "overall/seen/unseen metric quadruples agree to 5e-3:",
            ""]
        for g, d in r["eval"]["metrics"].items():
            parts.append(f"  - {g}: ours {d['ours']} vs torch {d['torch']} "
                         f"(max |Δ| {d['max_abs_delta']:.2e})")
        parts.append("")
    bp = osp.join(OUT_DIR, "bf16.json")
    if osp.exists(bp):
        r = json.load(open(bp))
        parts += [
            "## bf16 production-pipeline drift (real TPU v5e)",
            "",
            f"- pipelines: production serving stack (bfloat16 + "
            f"support-pruned pad-100 + fused SZN Pallas kernel) vs plain "
            f"fp32 path, SAME weights ({r['train_steps']} synthetic "
            f"training steps), {r['batches']}x{r['batch_size']} images at "
            f"{r['size']}²",
            f"- prediction flip rate: **{r['flip_rate']:.5f}** "
            f"({r['flip_rate']*100:.3f}% of {r['pixels']:,} pixels)",
            f"- metric deltas (order {r['metric_order']}):",
            ""]
        for g, d in r["metrics"].items():
            parts.append(f"  - {g}: prod {d['prod_bf16_pruned_fused']} vs "
                         f"fp32 {d['plain_fp32']} → |Δ| {d['abs_delta']}")
        parts.append("")
    with open(osp.join(_REPO, "docs", "PARITY_EVIDENCE.md"), "w") as f:
        f.write("\n".join(parts))
    print("wrote docs/PARITY_EVIDENCE.md")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("mode", choices=["lockstep", "bf16", "render"])
    p.add_argument("--scale", type=float, default=1.0)
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--steps", type=int, default=25)
    p.add_argument("--batches", type=int, default=4)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--train_steps", type=int, default=20)
    a = p.parse_args(argv)
    if a.mode == "lockstep":
        _save("lockstep", run_lockstep(a.scale, a.size, a.steps))
    elif a.mode == "bf16":
        _save("bf16", run_bf16(a.batches, a.batch_size,
                               512 if a.size == 128 else a.size,
                               a.train_steps))
    render()


if __name__ == "__main__":
    main()
