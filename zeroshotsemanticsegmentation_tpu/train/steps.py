"""Jitted train/eval step factories for both training stages.

Single XLA program per step: forward, loss, backward, optimizer update,
NNE inference and on-device confusion matrices all fuse under jit — the
reference syncs scores/labels to host every iteration instead
(trainer_fcn.py:111-118, utils.py:182-185), which is its throughput sink.

Per-sample losses (vmap over the batch) generalize the reference's
batch-size-1 losses exactly: a batch step averages the per-image losses, so
at batch_size=1 the numbers coincide with the reference and dummy padding
samples (all labels -1) contribute zero.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _host_const(x, dtype=None):
    """Normalize a factory-captured constant to host numpy.

    The step factories close over small constants (class embeddings,
    seen/unseen mask vectors); jit records them as jaxpr consts, and
    lowering a DEVICE-array const reads it back to the host to inline the
    literal — and on this platform ANY device->host readback permanently
    collapses host->device bandwidth to ~15-40 MB/s (scripts/probe_h2d.py
    d2h_only/closure_tiny vs closure_np, bisected 2026-08-18). Host np
    consts never round-trip. These arrays are tiny (<= num_classes x
    embed_dim), so literal inlining is free. Guarded by
    scripts/audit_consts.py.

    If handed a jax.Array this conversion IS itself a readback — warn, so
    callers keep their constants host-side from birth.
    """
    if x is None:
        return None
    if isinstance(x, jax.Array):
        import warnings
        warnings.warn(
            "_host_const received a device array; converting reads it back "
            "to the host, which collapses H2D bandwidth on the axon "
            "platform (CLAUDE.md). Pass host numpy constants instead.",
            stacklevel=3)
    return np.asarray(x, dtype)

from zeroshotsemanticsegmentation_tpu.ops import (
    confusion_matrix, cosine_loss, cross_entropy2d,
    infer_labels, infer_labels_forced_unseen, infer_labels_szn,
    mse_loss, zeroshot_hists)


def _embed_targets(label, embeddings):
    """Per-pixel embedding[label] via a one-hot multiply-reduce: a row gather
    over millions of pixels serializes on TPU (measured 7.6 ms/step at B=16
    512^2), and the previous one-hot *matmul* form put a `dot` in the train
    program, which collapses H2D bandwidth on this platform (CLAUDE.md).
    The 0/1 selection is exact in fp32 (ops/dotless.py)."""
    from zeroshotsemanticsegmentation_tpu.ops.dotless import select_rows
    return select_rows(jnp.clip(label, 0, None), embeddings)


def _per_sample_fcn_loss(loss_name: str, embeddings):
    """(H,W,C) score, (H,W) label -> scalar loss; exact reference semantics."""
    def loss_one(score, label):
        score, label = score[None], label[None]
        if loss_name == "cross_entropy":
            return cross_entropy2d(score, label, size_average=False)
        target_embed = _embed_targets(label, embeddings)
        if loss_name == "cos":
            return cosine_loss(score, label, target_embed)
        if loss_name == "mse":
            return mse_loss(score, label, target_embed)
        raise ValueError(loss_name)
    return loss_one


def _pad_mask(sizes: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """(B, H, W) bool: True where the pixel is bucket padding (outside the
    original image extent), derived from per-sample (h, w) sizes."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, h, w), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, h, w), 2)
    return ((rows >= sizes[:, 0, None, None]) |
            (cols >= sizes[:, 1, None, None]))


def _prepare_batch(batch):
    """(images fp32 BGR mean-sub zero-padded, labels int32) from either feed.

    Compact-feed batches arrive as uint8 RGB + int8 labels (4x fewer
    host->HBM bytes); normalization runs here on device. The bucket-pad
    region is re-zeroed afterwards — uint8 zeros would otherwise become
    -mean_bgr and break the padding == conv-zero-padding equivalence that
    keeps static-shape batching semantics-neutral.
    """
    from zeroshotsemanticsegmentation_tpu.data.transforms import (
        prepare_images)
    images = prepare_images(batch["image"])
    labels = batch["label"].astype(jnp.int32)
    if batch["image"].dtype == jnp.uint8:
        h, w = labels.shape[1], labels.shape[2]
        pad = _pad_mask(batch["sizes"], h, w)
        images = jnp.where(pad[..., None], 0.0, images)
    return images, labels


def _fcn_infer(score, label, embeddings, *, forced_unseen, all_unseen_vec):
    if embeddings is None:
        return jnp.argmax(score, axis=-1).astype(jnp.int32)
    if forced_unseen:
        return infer_labels_forced_unseen(score, label, embeddings,
                                          all_unseen_vec)
    return infer_labels(score, embeddings)


def make_fcn_train_step(model, tx, *, loss_name: str, num_classes: int,
                        embeddings=None, target_embeddings=None,
                        forced_unseen: bool = False, all_unseen_vec=None,
                        chunked_loss: bool = False, grad_accum: int = 1,
                        fused_tail: bool | None = None, mesh=None):
    """Stage-1 train step: returns (new_state, aux dict of scalars + hist).

    `embeddings` drives NNE inference; `target_embeddings` (defaults to the
    same matrix) drives the regression targets — they differ only under
    one_hot_embed, where the reference regresses onto one-hot vectors but
    still infers against the word2vec matrix (trainer_fcn.py:49 vs
    pascal_dataset.py:92-101).

    `chunked_loss`: compute the loss from the 1/32-res raw head, upsampling
    one sample at a time under lax.map — the dominant train-memory cost is
    the batch of full-resolution fp32 score/target volumes (~0.7 GB each at
    B=32 512²), not backbone activations. Numerically identical (the same
    fp32 interpolation matrices run per sample; per-sample losses were
    already independent under vmap).

    `grad_accum` (k>1): microbatch gradient accumulation inside the single
    jitted step — the batch splits into k microbatches whose backward passes
    run sequentially under lax.scan, bounding the pad-100 block-1 backward
    transients (the v5e OOM binder at B>16, ~8 GB of 710² activations +
    cotangents) at 1/k cost while the optimizer still sees the full-batch
    gradient. Exact: per-sample losses are sums normalized by the full
    batch's num_real, so Σ microbatch grads == whole-batch grads (dropout
    draws a distinct key per microbatch; paths coincide when dropout is off).
    """
    embeddings = _host_const(embeddings, np.float32)
    target_embeddings = _host_const(target_embeddings, np.float32)
    all_unseen_vec = _host_const(all_unseen_vec)
    if target_embeddings is None:
        target_embeddings = embeddings
    loss_one = _per_sample_fcn_loss(loss_name, target_embeddings)

    from zeroshotsemanticsegmentation_tpu.ops.bilinear import (
        upsample_bilinear_cropped)
    from zeroshotsemanticsegmentation_tpu.ops.costail_fused import (
        fused_cos_tail, fused_tail_enabled)

    # Fused loss+infer+hist tail (ops/costail_fused.py): one Pallas pass
    # over the full-res score replaces the target-select / normalize /
    # reduce / NNE-infer / confusion-hist chain and its backward. Exact up
    # to fp32 accumulation order (oracle-tested); only the plain cos + NNE
    # configuration qualifies — every other mode keeps the XLA definition.
    # `fused_tail`: None = SZN_FUSED_TAIL policy (auto: on TPU backend).
    # Under a GSPMD mesh pass `mesh` — the kernel shard_maps over the
    # batch axes per data shard (ops/costail_fused.fused_cos_tail), the
    # same composition the serving kernel uses (szn_fused._fused_call).
    if fused_tail is None:
        fused_tail = fused_tail_enabled()
    use_fused_tail = (
        fused_tail
        and loss_name == "cos" and embeddings is not None
        and not forced_unseen and not chunked_loss
        and embeddings.shape[0] == num_classes
        and target_embeddings.shape[0] == num_classes)

    @jax.jit
    def train_step(state, batch, dropout_key):
        key = jax.random.fold_in(dropout_key, state.step)
        images, labels = _prepare_batch(batch)
        out_h, out_w = labels.shape[1], labels.shape[2]
        denom = jnp.maximum(batch["num_real"], 1)

        def infer_hist(score, label):
            pred = _fcn_infer(score, label, embeddings,
                              forced_unseen=forced_unseen,
                              all_unseen_vec=all_unseen_vec)
            return confusion_matrix(label, pred, num_classes)

        def value_grad_one(image, label, key):
            """(loss, score_sum, hist, grads) for one (micro)batch; the loss
            is that microbatch's sum normalized by the FULL batch denom."""
            if chunked_loss:
                def loss_fn(params):
                    f_small = model.apply({"params": params}, image,
                                          train=True, mode="raw",
                                          rngs={"dropout": key})[0]

                    def one(args):
                        fs, lbl = args
                        score = upsample_bilinear_cropped(
                            fs[None].astype(jnp.float32), stride=32,
                            kernel_size=64, crop_offset=19,
                            out_h=out_h, out_w=out_w)
                        hist = infer_hist(score, lbl[None])
                        return (loss_one(score[0], lbl),
                                jnp.sum(score), hist)

                    losses, ssums, hists = jax.lax.map(one, (f_small, label))
                    loss = jnp.sum(losses) / denom
                    return loss, (jnp.sum(ssums), jnp.sum(hists, axis=0))

                (loss, (score_sum, hist)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.params)
            elif use_fused_tail:
                def loss_fn(params):
                    score = model.apply({"params": params}, image,
                                        train=True, mode="fcn",
                                        rngs={"dropout": key})
                    losses, hist, ssum = fused_cos_tail(
                        score, label, target_embeddings, embeddings,
                        num_classes, mesh=mesh)
                    return jnp.sum(losses) / denom, (ssum, hist)

                (loss, (score_sum, hist)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.params)
            else:
                def loss_fn(params):
                    score = model.apply({"params": params}, image,
                                        train=True, mode="fcn",
                                        rngs={"dropout": key})
                    losses = jax.vmap(loss_one)(score, label)
                    return jnp.sum(losses) / denom, score

                (loss, score), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.params)
                score_sum = jnp.sum(score.astype(jnp.float32))
                hist = infer_hist(score, label)
            return loss, score_sum, hist, grads

        if grad_accum == 1:
            loss, score_sum, hist, grads = value_grad_one(images, labels, key)
        else:
            b = images.shape[0]
            if b % grad_accum:
                raise ValueError(
                    f"batch {b} not divisible by grad_accum {grad_accum}")
            m = b // grad_accum
            imgs = images.reshape(grad_accum, m, *images.shape[1:])
            lbls = labels.reshape(grad_accum, m, out_h, out_w)

            def body(carry, xs):
                loss_a, ssum_a, hist_a, grads_a = carry
                img, lbl, i = xs
                loss, ssum, hist, grads = value_grad_one(
                    img, lbl, jax.random.fold_in(key, i))
                return (loss_a + loss, ssum_a + ssum, hist_a + hist,
                        jax.tree_util.tree_map(jnp.add, grads_a, grads)), None

            init = (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32),
                    jnp.zeros((num_classes, num_classes), jnp.int32),
                    jax.tree_util.tree_map(jnp.zeros_like, state.params))
            (loss, score_sum, hist, grads), _ = jax.lax.scan(
                body, init, (imgs, lbls, jnp.arange(grad_accum)))

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(lambda p, u: p + u,
                                        state.params, updates)
        # optax updates are already negated deltas; p + u applies them
        new_state = state.replace(params=params, opt_state=opt_state,
                                  step=state.step + 1)
        aux = {
            "loss": loss,
            "hist": hist,
            "score_sum": score_sum,
            # reference per-iter stdout prints these (trainer_fcn.py:160-162)
            "score_fr_grad_sum": jnp.sum(grads["score_fr"]["kernel"]),
        }
        return new_state, aux

    return train_step


def _chunked_loss_from_raw(loss_one, f_small, labels, out_h, out_w):
    """(loss_sum, score_sum): per-sample upsample+loss under lax.map — the
    same fp32 interpolation matrices as the whole-batch path, one sample at a
    time, so values are identical while full-res volumes never coexist."""
    from zeroshotsemanticsegmentation_tpu.ops.bilinear import (
        upsample_bilinear_cropped)

    def one(args):
        fs, lbl = args
        score = upsample_bilinear_cropped(
            fs[None].astype(jnp.float32), stride=32, kernel_size=64,
            crop_offset=19, out_h=out_h, out_w=out_w)
        return loss_one(score[0], lbl), jnp.sum(score)

    losses, ssums = jax.lax.map(one, (f_small, labels))
    return jnp.sum(losses), jnp.sum(ssums)


def make_fcn_eval_step(model, *, loss_name: str, num_classes: int,
                       embeddings=None, target_embeddings=None,
                       forced_unseen: bool = False,
                       all_unseen_vec=None, val_unseen_vec=None,
                       fused: bool = False, mesh=None):
    """Stage-1/test_fcn eval step (reference Trainer.forward path).

    `fused` (NNE modes only — argmax baseline and the forced-unseen oracle
    keep the reference path): predictions come from the raw 1/32-res head
    through ops.szn_fused's projection+upsample+argmax kernel and the loss
    from the per-sample chunked upsample — full-res score volumes never hit
    HBM (~28 MB vs ~700 MB of traffic per batch at B=16 512²).
    """
    embeddings = _host_const(embeddings, np.float32)
    target_embeddings = _host_const(target_embeddings, np.float32)
    all_unseen_vec = _host_const(all_unseen_vec)
    val_unseen_vec = _host_const(val_unseen_vec)
    if target_embeddings is None:
        target_embeddings = embeddings
    loss_one = _per_sample_fcn_loss(loss_name, target_embeddings)

    if fused and embeddings is not None and not forced_unseen:
        from zeroshotsemanticsegmentation_tpu.ops.szn_fused import (
            infer_labels_nne_fused)

        @jax.jit
        def eval_step(params, batch):
            images, labels = _prepare_batch(batch)
            out_h, out_w = labels.shape[1], labels.shape[2]
            f_small = model.apply({"params": params}, images, mode="raw")[0]
            loss_sum, score_sum = _chunked_loss_from_raw(
                loss_one, f_small, labels, out_h, out_w)
            pred = infer_labels_nne_fused(f_small, embeddings,
                                          (out_h, out_w), mesh=mesh)
            hists = zeroshot_hists(labels, pred, num_classes,
                                   val_unseen_vec)
            return {"loss_sum": loss_sum, "hists": hists, "pred": pred,
                    "score_sum": score_sum}

        return eval_step

    @jax.jit
    def eval_step(params, batch):
        images, labels = _prepare_batch(batch)
        score = model.apply({"params": params}, images, mode="fcn")
        losses = jax.vmap(loss_one)(score, labels)
        pred = _fcn_infer(score, labels, embeddings,
                          forced_unseen=forced_unseen,
                          all_unseen_vec=all_unseen_vec)
        hists = zeroshot_hists(labels, pred, num_classes,
                               val_unseen_vec)
        return {"loss_sum": jnp.sum(losses), "hists": hists, "pred": pred,
                "score_sum": jnp.sum(score.astype(jnp.float32))}

    return eval_step


def make_szn_eval_step(model, *, loss_name: str, num_classes: int,
                       embeddings, target_embeddings=None,
                       all_unseen_vec=None, val_unseen_vec=None,
                       fused: bool = False, mesh=None):
    """Full-SZN eval step (reference Trainer.forward_szn, trainer_fcn.py:123-147):
    both heads, seenmask-gated stitched NNE inference, fcn loss.

    `fused`: serving-path inference (ops.szn_fused from the raw heads) +
    chunked per-sample loss; equivalent up to fp argmax ties (tested)."""
    embeddings = _host_const(embeddings, np.float32)
    target_embeddings = _host_const(target_embeddings, np.float32)
    all_unseen_vec = _host_const(all_unseen_vec)
    val_unseen_vec = _host_const(val_unseen_vec)
    if target_embeddings is None:
        target_embeddings = embeddings
    loss_one = _per_sample_fcn_loss(loss_name, target_embeddings)

    if fused:
        from zeroshotsemanticsegmentation_tpu.ops.szn_fused import (
            infer_labels_szn_fused)

        @jax.jit
        def eval_step(params, batch):
            images, labels = _prepare_batch(batch)
            out_h, out_w = labels.shape[1], labels.shape[2]
            f_small, s_small = model.apply({"params": params},
                                           images, mode="raw")
            loss_sum, score_sum = _chunked_loss_from_raw(
                loss_one, f_small, labels, out_h, out_w)
            pred = infer_labels_szn_fused(f_small, s_small, embeddings,
                                          all_unseen_vec, (out_h, out_w),
                                          mesh=mesh)
            hists = zeroshot_hists(labels, pred, num_classes,
                                   val_unseen_vec)
            return {"loss_sum": loss_sum, "hists": hists, "pred": pred,
                    "score_sum": score_sum}

        return eval_step

    @jax.jit
    def eval_step(params, batch):
        images, labels = _prepare_batch(batch)
        fcn_score, seenmask_score = model.apply({"params": params},
                                                images, mode="both")
        losses = jax.vmap(loss_one)(fcn_score, labels)
        pred = infer_labels_szn(fcn_score, seenmask_score, embeddings,
                                all_unseen_vec)
        hists = zeroshot_hists(labels, pred, num_classes,
                               val_unseen_vec)
        return {"loss_sum": jnp.sum(losses), "hists": hists, "pred": pred,
                "score_sum": jnp.sum(fcn_score.astype(jnp.float32))}

    return eval_step


def _seenmask_target(label, sizes, seen_vec):
    """Binary target: 1 = pixel's class is seen, 0 = unseen-or-unlabeled,
    -1 = bucket padding (ignored).

    The reference trains the seenmask on *every* pixel of the original image,
    mapping unlabeled (-1) to 0 (trainer_seenmask.py:54-58 in1d semantics);
    only this framework's static-shape padding is excluded.
    """
    h, w = label.shape[1], label.shape[2]
    # one-hot multiply-reduce instead of a per-pixel gather (gathers
    # serialize on TPU) or a matvec einsum (any XLA dot collapses H2D
    # bandwidth — CLAUDE.md); 0/1 x 0/1 arithmetic is exact in any precision
    from zeroshotsemanticsegmentation_tpu.ops.dotless import matvec
    lifted = matvec(jax.nn.one_hot(jnp.clip(label, 0, None),
                                   seen_vec.shape[0], dtype=jnp.float32),
                    seen_vec)
    tgt = jnp.where((lifted > 0.5) & (label >= 0), 1, 0)
    return jnp.where(_pad_mask(sizes, h, w), -1, tgt)


def make_seenmask_train_step(model, tx, *, seen_vec):
    """Stage-2 train step: CE on the 2-channel head, backbone frozen by tx.

    The reference freezes everything but the seenmask head AND its upscore
    in stage 2 (train.py:166-171 sets requires_grad on both, 304-307 yields
    both to Adam; everything else 316-318), so its backward stops at the
    head. Mirror that structurally: differentiate only w.r.t.
    `seenmask_score` + `seenmask_upscore` — the backbone backward (2/3 of a
    full step) is never built. Frozen params get zero gradients, which the
    masked optimizer ignores anyway.
    """
    seen_vec = _host_const(seen_vec)
    _TRAINED = ("seenmask_score", "seenmask_upscore")

    @jax.jit
    def train_step(state, batch, dropout_key):
        key = jax.random.fold_in(dropout_key, state.step)
        images, labels = _prepare_batch(batch)
        target = _seenmask_target(labels, batch["sizes"], seen_vec)
        # FCN8s keeps a fixed seenmask upsample (fcn8s.py) so it has no
        # `seenmask_upscore` param — train whichever of the two exist
        trained = tuple(k for k in _TRAINED if k in state.params)
        frozen = {k: v for k, v in state.params.items()
                  if k not in trained}

        def loss_fn(trained_params):
            params = dict(frozen)
            params.update(trained_params)
            score = model.apply({"params": params}, images,
                                train=True, mode="seenmask",
                                rngs={"dropout": key})
            losses = jax.vmap(
                lambda s, t: cross_entropy2d(s[None], t[None],
                                             size_average=True))(score, target)
            loss = jnp.sum(losses) / jnp.maximum(batch["num_real"], 1)
            return loss, score

        (loss, score), trained_grads = jax.value_and_grad(
            loss_fn, has_aux=True)(
            {k: state.params[k] for k in trained})
        grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        grads.update(trained_grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(lambda p, u: p + u,
                                        state.params, updates)
        new_state = state.replace(params=params, opt_state=opt_state,
                                  step=state.step + 1)
        pred = jnp.argmax(score, axis=-1).astype(jnp.int32)
        aux = {
            "loss": loss,
            "hist": confusion_matrix(target, pred, 2),
            "score_sum": jnp.sum(score.astype(jnp.float32)),
            "seenmask_grad_sum": jnp.sum(grads["seenmask_score"]["kernel"]),
        }
        return new_state, aux

    return train_step


def make_seenmask_eval_step(model, *, seen_vec):
    seen_vec = _host_const(seen_vec)

    @jax.jit
    def eval_step(params, batch):
        images, labels = _prepare_batch(batch)
        target = _seenmask_target(labels, batch["sizes"], seen_vec)
        score = model.apply({"params": params}, images,
                            mode="seenmask")
        losses = jax.vmap(
            lambda s, t: cross_entropy2d(s[None], t[None],
                                         size_average=True))(score, target)
        pred = jnp.argmax(score, axis=-1).astype(jnp.int32)
        return {"loss_sum": jnp.sum(losses),
                "hists": confusion_matrix(target, pred, 2)[None],
                "pred": pred,
                "score_sum": jnp.sum(score.astype(jnp.float32))}

    return eval_step
