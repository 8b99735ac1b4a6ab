"""Independent torch/numpy implementation of the reference's semantics.

Shared by the lockstep parity tests (test_train_parity.py) and the
full-width evidence runner (scripts/parity_evidence.py). Everything here is
written from the reference's *behavior* (cited per function), not from this
framework's code — that independence is what makes agreement evidence.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F

from zeroshotsemanticsegmentation_tpu.ops import bilinear_upsampling_kernel

_BLOCKS = [["conv1_1", "conv1_2"], ["conv2_1", "conv2_2"],
           ["conv3_1", "conv3_2", "conv3_3"],
           ["conv4_1", "conv4_2", "conv4_3"],
           ["conv5_1", "conv5_2", "conv5_3"]]


class TorchFCN(torch.nn.Module):
    """Reference FCN32s semantics (models.py:27-193), parameterized from a
    Flax param tree."""

    def __init__(self, flax_params):
        super().__init__()
        self.convs = torch.nn.ModuleDict()
        for name, leaves in flax_params.items():
            if name == "seenmask_upscore":
                continue  # handled below (ConvTranspose weight, no bias)
            k = np.asarray(leaves["kernel"])  # HWIO
            kh, kw, cin, cout = k.shape
            pad = 100 if name == "conv1_1" else (
                1 if name.startswith("conv") else 0)
            conv = torch.nn.Conv2d(cin, cout, (kh, kw), padding=pad)
            conv.weight.data = torch.from_numpy(
                k.transpose(3, 2, 0, 1).copy())
            conv.bias.data = torch.from_numpy(
                np.asarray(leaves["bias"]).copy())
            self.convs[name] = conv
        # FCN upscore: fixed bilinear buffer (never optimized,
        # train.py:324-327). Seenmask upscore: a trainable PARAMETER — the
        # reference's stage-2 Adam updates it (train.py:168-171,304-307) —
        # initialized from the flax tree when present (torch-equivalent
        # layout: W_iohw = kernel_hwio.transpose(2, 3, 0, 1)).
        c = self.convs["score_fr"].out_channels
        up = bilinear_upsampling_kernel(c, 64, np.float32)  # HWIO
        self.register_buffer("up_score_fr", torch.from_numpy(
            up.transpose(2, 3, 0, 1).copy()))  # IOHW
        if "seenmask_upscore" in flax_params:
            k = np.asarray(flax_params["seenmask_upscore"]["kernel"],
                           np.float32)
        else:
            k = bilinear_upsampling_kernel(2, 64, np.float32)
        self.up_seenmask_score = torch.nn.Parameter(
            torch.from_numpy(k.transpose(2, 3, 0, 1).copy()))

    def forward(self, x, mode="fcn"):
        hh, ww = x.shape[2], x.shape[3]
        h = x
        for block in _BLOCKS:
            for name in block:
                h = F.relu(self.convs[name](h))
            h = F.max_pool2d(h, 2, stride=2, ceil_mode=True)
        h = F.relu(self.convs["fc6"](h))
        h = F.relu(self.convs["fc7"](h))
        if mode == "both":
            return (self._head(h, "score_fr", hh, ww),
                    self._head(h, "seenmask_score", hh, ww))
        head = "score_fr" if mode == "fcn" else "seenmask_score"
        return self._head(h, head, hh, ww)

    def _head(self, h, head, hh, ww):
        s = self.convs[head](h)
        f = F.conv_transpose2d(s, getattr(self, f"up_{head}"), stride=32)
        return f[:, :, 19:19 + hh, 19:19 + ww]


def torch_cosine_loss(score, target, target_embed):
    """utils.py:75-102 semantics (old-torch norms had keepdim=True)."""
    score = score / torch.norm(score, p=2, dim=1, keepdim=True)
    target_embed = target_embed / torch.norm(target_embed, p=2, dim=1,
                                             keepdim=True)
    mask = target >= 0
    mask_size = mask.sum()
    cos = (score * target_embed).sum(dim=1)
    return (mask_size - cos[mask].sum()) / mask_size


def torch_cross_entropy2d(score, target, size_average=False):
    """utils.py:19-48 semantics: masked NLL sum, optional /mask count."""
    logp = F.log_softmax(score, dim=1).permute(0, 2, 3, 1)
    mask = target >= 0
    loss = F.nll_loss(logp[mask], target[mask], reduction="sum")
    if size_average:
        loss = loss / mask.sum()
    return loss


def torch_infer_lbl(score, embed):
    """utils.py:159-185: NNE cosine argmax with the zero-norm guard."""
    with torch.no_grad():
        n, c, h, w = score.shape
        s = score.permute(0, 2, 3, 1).reshape(n * h * w, c)
        sims = s @ embed.t()
        s_norm = torch.norm(s, p=2, dim=1, keepdim=True)
        e_norm = torch.norm(embed, p=2, dim=1)[None, :].clone()
        e_norm[e_norm == 0] = 1
        return (sims / (s_norm * e_norm)).argmax(1).reshape(n, h, w).numpy()


def masked_embed(embeddings: np.ndarray, keep: np.ndarray) -> torch.Tensor:
    """Embedding matrix with excluded classes' rows zeroed — the reference
    builds seen/unseen matrices this way (pascal_dataset.py:92-101), which
    makes masked classes' cosine scores exactly 0.0 in infer_lbl."""
    e = embeddings.copy()
    e[~keep] = 0.0
    return torch.from_numpy(e)


def torch_infer_lbl_szn(fcn_score, seenmask_score, embeddings, unseen_vec):
    """utils.py:195-205 stitched SZN inference: NNE among seen classes,
    overwritten by NNE among unseen classes where the seenmask head votes
    unseen (argmax channel 0)."""
    unseen_vec = np.asarray(unseen_vec, bool)
    seen_embed = masked_embed(embeddings, ~unseen_vec)
    unseen_embed = masked_embed(embeddings, unseen_vec)
    pred = torch_infer_lbl(fcn_score, seen_embed)
    pred_unseen = torch_infer_lbl(fcn_score, unseen_embed)
    with torch.no_grad():
        gate = seenmask_score.argmax(1).numpy()  # 1 = seen
    unseen_mask = gate == 0
    pred[unseen_mask] = pred_unseen[unseen_mask]
    return pred


def torch_stage2_optimizer(model, lr):
    """train.py:174-175,302-307: Adam over the seenmask head's weight+bias
    AND the seenmask upscore ConvTranspose weight, in that yield order."""
    head = model.convs["seenmask_score"]
    return torch.optim.Adam(
        [head.weight, head.bias, model.up_seenmask_score], lr=lr)


def torch_stage1_optimizer(model, optim, lr):
    """train.py:125-133,302-331: conv weights base lr (+wd for sgd), biases
    lr x2 never decayed, seenmask head and (fixed) upscores excluded."""
    weights, biases = [], []
    for name, conv in model.convs.items():
        if name == "seenmask_score":
            continue
        weights.append(conv.weight)
        biases.append(conv.bias)
    groups = [{"params": weights},
              {"params": biases, "lr": lr * 2, "weight_decay": 0.0}]
    if optim == "sgd":
        return torch.optim.SGD(groups, lr=lr, momentum=0.99,
                               weight_decay=5e-4)
    return torch.optim.Adam(groups, lr=lr)


def np_hist(label, pred, n, *, target="all", unseen=None):
    """Reference _fast_hist (utils.py:104-119) incl. the seen/unseen
    true-label partitions used by the validation breakdown."""
    label, pred = np.asarray(label).ravel(), np.asarray(pred).ravel()
    valid = (label >= 0) & (label < n)
    if target == "unseen":
        valid &= np.isin(label, list(unseen))
    elif target == "seen":
        valid &= np.isin(label, [c for c in range(n) if c not in unseen])
    return np.bincount(n * label[valid].astype(np.int64) + pred[valid],
                       minlength=n * n).reshape(n, n)


def np_label_accuracy_score(label_trues, label_preds, n_class, unseen=None):
    """Reference label_accuracy_score (utils.py:131-154): accumulated
    overall (+ seen/unseen) hists over the val set."""
    hists = np.zeros((3, n_class, n_class), np.int64)
    for lt, lp in zip(label_trues, label_preds):
        hists[0] += np_hist(lt, lp, n_class)
        if unseen:
            hists[1] += np_hist(lt, lp, n_class, target="seen", unseen=unseen)
            hists[2] += np_hist(lt, lp, n_class, target="unseen",
                                unseen=unseen)
    return hists


def np_hist_to_metrics(hist):
    """Reference _hist_to_metrics (utils.py:121-129), NaN propagation and
    all."""
    import warnings
    hist = hist.astype(np.float64)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # 0/0 -> nan, nanmean of empty
        acc = np.diag(hist).sum() / hist.sum()
        acc_cls = np.nanmean(np.diag(hist) / hist.sum(axis=1))
        iu = np.diag(hist) / (hist.sum(axis=1) + hist.sum(axis=0)
                              - np.diag(hist))
        mean_iu = np.nanmean(iu)
        freq = hist.sum(axis=1) / hist.sum()
        fwavacc = (freq[freq > 0] * iu[freq > 0]).sum()
    return acc, acc_cls, mean_iu, fwavacc
