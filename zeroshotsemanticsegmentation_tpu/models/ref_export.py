"""Reference-SZN-checkpoint export: Flax param trees → ``torch.save`` files.

The inverse of ``models/ref_import.py``: serialize weights trained HERE in
the reference's checkpoint format — ``{epoch, iteration, arch,
optim_state_dict, model_state_dict, best_mean_iu}`` (trainer_fcn.py:281-288)
— so the reference codebase itself can resume from them
(``torch.load`` + ``model.load_state_dict(strict=False)`` +
``optim.load_state_dict``, train.py:110-136). Together with the importer
this closes BOTH egress-day cross-validation directions:

  importer: reference-trained weights → our eval path   (their-train/our-eval)
  exporter: our trained weights → reference eval path   (our-train/their-eval)

so any mIoU gap found on real VOC/SBD can be attributed to the training
dynamics or to the eval path, not smeared across both.

Layout surgery (exact inverse of ref_import's torch→flax mapping):

  HWIO kernel → Conv2d weight   (O, I, kh, kw): ``transpose(3, 2, 0, 1)``
  HWIO kernel → ConvTranspose2d (I, O, kh, kw): ``transpose(2, 3, 0, 1)``

``upscore.weight`` needs special care: the reference model REGISTERS the
FCN upscore as a real ConvTranspose2d parameter (models.py:94), so its
state dicts always carry the tensor, but its optimizer never updates it
(train.py:324-327) — it stays at the bilinear init forever. This framework
computes that upsample as a fixed function (models/fcn32s.py), so the
export emits the bilinear init, which is bit-what the reference's own
checkpoints hold. ``seenmask_upscore.weight`` IS trainable (stage 2,
train.py:304-307) and exports the tree's actual values.

The optimizer state is exported as a FRESH torch optimizer's state dict
built with the reference's exact construction (two param groups — 16
Conv2d weights then 16 biases at 2x lr, train.py:125-133; get_parameters
yields no ConvTranspose weights, train.py:316-327). The state map is empty
(torch initializes momentum/Adam moments lazily on first step), but the
group structure must match or the reference's unconditional
``optim.load_state_dict`` (train.py:136) raises before it ever evaluates.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

from zeroshotsemanticsegmentation_tpu.models.ref_import import CONV_MODULES
from zeroshotsemanticsegmentation_tpu.ops.bilinear import (
    bilinear_upsampling_kernel)

# reference FCN32s registration order (models.py:43-98) — torch state dicts
# are ordered; emitting the reference's own order keeps byte-level diffs
# of exported-vs-native checkpoints readable
_STATE_DICT_ORDER = CONV_MODULES[:-1] + ("upscore",) + CONV_MODULES[-1:] + (
    "seenmask_upscore",)
# the two trained param groups: every Conv2d, seenmask head EXCLUDED by name
# (train.py:317-318); 16 modules → 16 weights + 16 biases
_OPTIM_MODULES = tuple(m for m in CONV_MODULES if m != "seenmask_score")


def _host(x) -> np.ndarray:
    # device arrays reach here only from in-process trees; checkpoint
    # restores are host numpy already (train/checkpoint._to_host)
    return np.asarray(x, dtype=np.float32)


def reference_state_dict_from_params(params: Mapping[str, Mapping]) -> dict:
    """Flax param tree → reference FCN32s ``model_state_dict`` tensors.

    Refuses trees that the reference model class cannot represent: FCN8s
    trees carry skip-head params (``score_pool3``/``score_pool4``) and lack
    ``seenmask_upscore`` — the reference has no FCN8s class
    (models.py:27: FCN32s is its only architecture), so exporting one would
    silently change the network the checkpoint claims to be.
    """
    import torch

    known = set(CONV_MODULES) | {"seenmask_upscore"}
    extra = sorted(set(params) - known)
    if extra:
        raise ValueError(
            f"param tree has modules {extra} that the reference FCN32s "
            "cannot represent (models.py:43-98) — FCN8s trees are not "
            "exportable; train/export an FCN32s instead")
    missing = sorted((set(CONV_MODULES) | {"seenmask_upscore"}) - set(params))
    if missing:
        raise ValueError(
            f"param tree is missing reference FCN32s modules {missing} — "
            "not an FCN32s tree")

    sd = {}
    for name in _STATE_DICT_ORDER:
        if name == "upscore":
            n = int(np.shape(params["score_fr"]["kernel"])[3])
            hwio = bilinear_upsampling_kernel(n, 64)
            sd["upscore.weight"] = torch.from_numpy(
                hwio.transpose(2, 3, 0, 1).copy())
            continue
        if name == "seenmask_upscore":
            hwio = _host(params["seenmask_upscore"]["kernel"])
            sd["seenmask_upscore.weight"] = torch.from_numpy(
                hwio.transpose(2, 3, 0, 1).copy())
            continue
        leaves = params[name]
        sd[f"{name}.weight"] = torch.from_numpy(
            _host(leaves["kernel"]).transpose(3, 2, 0, 1).copy())
        sd[f"{name}.bias"] = torch.from_numpy(_host(leaves["bias"]).copy())
    return sd


def reference_optim_state_dict(fcn_optim: str, fcn_lr: float) -> dict:
    """A state dict the reference's freshly-constructed optimizer accepts.

    Mirrors train.py:125-133 exactly: SGD(lr, momentum=.99,
    weight_decay=.0005) with a bias group at 2x lr / no decay, or Adam(lr)
    with a bias group at 2x lr. Param VALUES are irrelevant (state is
    empty; load_state_dict validates only group count and per-group param
    counts), so placeholders stand in for the 16+16 reference tensors.
    """
    import torch

    weights = [torch.zeros(1, requires_grad=True)
               for _ in range(len(_OPTIM_MODULES))]
    biases = [torch.zeros(1, requires_grad=True)
              for _ in range(len(_OPTIM_MODULES))]
    if fcn_optim == "sgd":
        optim = torch.optim.SGD(
            [{"params": weights},
             {"params": biases, "lr": fcn_lr * 2, "weight_decay": 0}],
            lr=fcn_lr, momentum=.99, weight_decay=0.0005)
    elif fcn_optim == "adam":
        optim = torch.optim.Adam(
            [{"params": weights}, {"params": biases, "lr": fcn_lr * 2}],
            lr=fcn_lr)
    else:
        raise ValueError(f"fcn_optim must be 'sgd' or 'adam', got "
                         f"{fcn_optim!r}")
    return optim.state_dict()


def save_reference_checkpoint(path: str, params: Mapping[str, Mapping], *,
                              epoch: int = 0, iteration: int = 0,
                              best_mean_iu: float = 0.0,
                              fcn_optim: str = "sgd",
                              fcn_lr: float = 1e-10) -> dict:
    """Write a reference-format checkpoint FILE (trainer_fcn.py:281-288).

    ``fcn_optim``/``fcn_lr`` must match the config the reference will
    resume under (its optimizer is constructed from cfg, then
    load_state_dict REPLACES the group hyperparameters with the saved
    ones — a mismatched export would silently retrain at the wrong lr).
    Returns the saved dict (sans tensors' devices) for inspection.
    """
    import torch

    blob = {
        "epoch": int(epoch),
        "iteration": int(iteration),
        "arch": "FCN32s",
        "optim_state_dict": reference_optim_state_dict(fcn_optim, fcn_lr),
        "model_state_dict": reference_state_dict_from_params(params),
        "best_mean_iu": float(best_mean_iu),
    }
    torch.save(blob, path)
    return blob


def export_checkpoint(ckpt_path: str, out_path: str, *,
                      fcn_optim: str | None = None,
                      fcn_lr: float | None = None) -> dict:
    """Orbax checkpoint directory (or reference file) → reference file.

    Accepts this framework's ``<run_dir>/best`` / ``checkpoint``
    directories; epoch/iteration/best_mean_iu metadata carries through.
    ``fcn_optim``/``fcn_lr`` default from the run's dumped config
    (``config.yaml`` next to the checkpoint) when present.
    """
    import os.path as osp

    from zeroshotsemanticsegmentation_tpu.models.ref_import import (
        is_reference_checkpoint, load_reference_checkpoint)
    from zeroshotsemanticsegmentation_tpu.train.checkpoint import (
        restore_checkpoint)

    if is_reference_checkpoint(ckpt_path):
        raise ValueError(
            f"{ckpt_path} is already a reference torch checkpoint file — "
            "export consumes this framework's orbax checkpoint directories")
    ckpt = restore_checkpoint(ckpt_path)

    if fcn_optim is None or fcn_lr is None:
        cfg_path = osp.join(osp.dirname(osp.abspath(ckpt_path)),
                            "config.yaml")
        cfg = _read_run_config(cfg_path)
        fcn_optim = fcn_optim or cfg.get("fcn_optim", "sgd")
        fcn_lr = fcn_lr if fcn_lr is not None else float(
            cfg.get("fcn_lr", 1e-10))

    blob = save_reference_checkpoint(
        out_path, ckpt["params"], epoch=ckpt.get("epoch", 0),
        iteration=ckpt.get("iteration", 0),
        best_mean_iu=ckpt.get("best_mean_iu", 0.0),
        fcn_optim=fcn_optim, fcn_lr=fcn_lr)
    # verify the round trip before declaring success: the written file must
    # reimport to the exact tree (guards layout-surgery regressions at the
    # moment they matter — on the artifact being shipped)
    back = load_reference_checkpoint(out_path, dict(ckpt["params"]))
    for mod, leaves in ckpt["params"].items():
        for leaf in leaves:
            got, want = back["params"][mod][leaf], leaves[leaf]
            if not np.array_equal(np.asarray(got), np.asarray(want)):
                raise AssertionError(
                    f"export round-trip mismatch at {mod}.{leaf} — refusing "
                    "to ship a corrupt checkpoint")
    return blob


def _read_run_config(path: str) -> dict:
    """The run dir's ``config.yaml`` is a flat ``key: value`` dump
    (utils/logging dumps it without nesting); parse without a yaml dep."""
    import os.path as osp

    out = {}
    if not osp.isfile(path):
        return out
    with open(path) as f:
        for line in f:
            if ":" not in line or line.lstrip().startswith("#"):
                continue
            k, v = line.split(":", 1)
            out[k.strip()] = v.strip()
    return out
