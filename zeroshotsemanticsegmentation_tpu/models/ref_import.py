"""Reference-SZN-checkpoint import: torch ``torch.save`` dicts → Flax params.

The reference checkpoints ``{epoch, iteration, arch, optim_state_dict,
model_state_dict, best_mean_iu}`` via ``torch.save`` after every validation
(trainer_fcn.py:281-288) and resumes with
``model.load_state_dict(..., strict=False)`` (train.py:110-116). This module
lets this framework's ``-r`` / ``load_fcn_path`` consume those files directly,
so on egress day a reference-TRAINED checkpoint can be cross-evaluated through
our ``test_fcn`` / ``test_all`` paths — isolating eval-path parity from
training-dynamics parity.

Layout surgery (inverse of tests/torch_oracle.TorchFCN's flax→torch mapping):

  Conv2d weight   (O, I, kh, kw)  → HWIO kernel, ``transpose(2, 3, 1, 0)``
  ConvTranspose2d (I, O, kh, kw)  → HWIO kernel, ``transpose(2, 3, 0, 1)``
    (``seenmask_upscore`` — the one ConvTranspose that is a real parameter
    here; the reference trains it in stage 2, train.py:304-307)
  ``upscore.weight``: our FCN upscore is a *fixed bilinear function*
    (models/fcn32s.py) because the reference optimizer never sees ConvTranspose
    weights (train.py:324-327). The import therefore VERIFIES the stored
    kernel still equals its bilinear init and refuses the checkpoint
    otherwise — silently dropping a (hand-edited) trained upscore would
    corrupt outputs.

``strict=False`` semantics are preserved: modules absent from the state dict
keep their current (fresh-init / VGG) values; unknown extra keys are ignored
with a report. The torch optimizer state is NOT imported (torch Adam moments
are keyed by opaque parameter positions from the reference's
``get_parameters`` ordering — reconstructing that mapping is fragile and the
import's purpose is evaluation / fine-tune-from-weights); callers get
``opt_state=None`` and a fresh optimizer, which the CLI reports.
"""

from __future__ import annotations

import os.path as osp
from typing import Any, Mapping

import numpy as np

from zeroshotsemanticsegmentation_tpu.ops.bilinear import (
    bilinear_upsampling_kernel)

# reference FCN32s module names holding Conv2d (weight+bias) params
# (models.py:43-98); fc6/fc7 are ALREADY convs in the reference model
CONV_MODULES = (
    "conv1_1", "conv1_2",
    "conv2_1", "conv2_2",
    "conv3_1", "conv3_2", "conv3_3",
    "conv4_1", "conv4_2", "conv4_3",
    "conv5_1", "conv5_2", "conv5_3",
    "fc6", "fc7", "score_fr", "seenmask_score",
)


def _to_numpy(x) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor without importing torch here
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def is_reference_checkpoint(path: str) -> bool:
    """Reference checkpoints are single ``torch.save`` FILES named
    ``checkpoint`` / ``best`` (trainer_fcn.py:281-292); this framework's
    orbax checkpoints are directories. A plain file at the checkpoint path is
    therefore a reference checkpoint."""
    return osp.isfile(path)


def _check_shapes(name: str, cur: Mapping[str, Any], kernel: np.ndarray,
                  bias: np.ndarray | None) -> None:
    if tuple(np.shape(cur["kernel"])) != kernel.shape:
        raise ValueError(
            f"{name}.kernel: model shape {tuple(np.shape(cur['kernel']))} != "
            f"reference-import shape {kernel.shape} — architecture mismatch "
            "(check num_classes/embed_dim and channel_scale=1.0)")
    if bias is not None and tuple(np.shape(cur["bias"])) != bias.shape:
        raise ValueError(
            f"{name}.bias: model shape {tuple(np.shape(cur['bias']))} != "
            f"reference-import shape {bias.shape}")


def szn_params_from_reference_state_dict(
        state_dict: Mapping[str, Any], params: dict) -> tuple[dict, bool]:
    """Merge a reference ``model_state_dict`` into a Flax param tree.

    Returns ``(merged_params, upscore_trained)``. Mirrors
    ``load_state_dict(strict=False)`` (train.py:114): only modules present in
    the state dict are overwritten. ``upscore_trained`` reports whether the
    stored ``seenmask_upscore`` kernel has drifted from its bilinear init
    (i.e. the checkpoint went through stage 2) — this becomes the STRUCTURAL
    metadata our serving gate routing consumes (serving.make_szn_predictor).
    """
    out = dict(params)
    for name in CONV_MODULES:
        wk, bk = f"{name}.weight", f"{name}.bias"
        if wk not in state_dict:
            continue
        if name not in out:
            # e.g. a channel-scaled test model lacking nothing in practice;
            # strict=False still means "skip what the target lacks" loudly
            raise KeyError(f"model params missing module {name!r} present "
                           "in the reference checkpoint")
        w = _to_numpy(state_dict[wk]).transpose(2, 3, 1, 0)  # OIHW → HWIO
        b = _to_numpy(state_dict[bk]) if bk in state_dict else None
        _check_shapes(name, out[name], w, b)
        cur = out[name]
        # dtype/shape come from ATTRIBUTES only — `cur` leaves may be
        # device-resident (cli/train passes jit-initialized params), and any
        # np.asarray on them is a device->host readback, which permanently
        # collapses H2D bandwidth on the axon tunnel (CLAUDE.md trigger 1)
        new = {"kernel": w.astype(cur["kernel"].dtype)}
        new["bias"] = (b.astype(cur["bias"].dtype) if b is not None
                       else cur["bias"])  # absent in dict: keep, don't copy
        out[name] = new

    # FCN upscore: fixed function here; verify the checkpoint didn't train it
    if "upscore.weight" in state_dict:
        up = _to_numpy(state_dict["upscore.weight"])  # (n, n, 64, 64) IOHW
        want = bilinear_upsampling_kernel(
            up.shape[0], up.shape[2]).transpose(2, 3, 0, 1)  # HWIO → IOHW
        if not np.allclose(up, want, rtol=0, atol=1e-6):
            raise ValueError(
                "reference checkpoint's `upscore.weight` differs from its "
                "bilinear init — the reference optimizer never trains it "
                "(train.py:324-327) so this checkpoint was hand-modified; "
                "this framework computes the FCN upscore as a fixed bilinear "
                "function and cannot represent a trained kernel")

    upscore_trained = False
    if "seenmask_upscore.weight" in state_dict:
        k = _to_numpy(
            state_dict["seenmask_upscore.weight"])  # (2, 2, 64, 64) IOHW
        hwio = k.transpose(2, 3, 0, 1)
        if "seenmask_upscore" not in out and not np.array_equal(
                hwio, bilinear_upsampling_kernel(k.shape[0], k.shape[2])):
            # target arch upsamples the seenmask with a FIXED bilinear
            # function (FCN8s) — dropping a stage-2-TRAINED kernel would
            # silently change the checkpoint's gate outputs
            raise ValueError(
                "reference checkpoint carries a stage-2-trained "
                "`seenmask_upscore` but the target architecture has no such "
                "parameter (fixed bilinear upsample) — its gate outputs "
                "cannot be reproduced; import into FCN32s instead")
        if "seenmask_upscore" in out:  # FCN8s keeps a fixed seenmask upsample
            cur = out["seenmask_upscore"]
            if tuple(np.shape(cur["kernel"])) != hwio.shape:
                raise ValueError(
                    "seenmask_upscore.kernel: model shape "
                    f"{tuple(np.shape(cur['kernel']))} != import shape "
                    f"{hwio.shape}")
            out["seenmask_upscore"] = {
                "kernel": hwio.astype(cur["kernel"].dtype)}
            upscore_trained = not np.array_equal(
                hwio, bilinear_upsampling_kernel(k.shape[0], k.shape[2]))

    return out, upscore_trained


def load_reference_checkpoint(path: str, params: dict) -> dict:
    """Load a reference ``torch.save`` checkpoint file into the same dict
    shape ``train.checkpoint.restore_checkpoint`` returns:
    ``{arch, epoch, iteration, best_mean_iu, params, opt_state,
    upscore_trained, skipped_keys}`` (``opt_state`` is always None — see
    module docstring). Accepts both the full checkpoint dict
    (trainer_fcn.py:281-288) and a bare ``model_state_dict``.
    """
    import torch  # local: torch only needed when actually importing

    blob = torch.load(path, map_location="cpu", weights_only=True)
    if "model_state_dict" in blob:
        state_dict, meta = blob["model_state_dict"], blob
    else:  # bare state dict (keys like 'conv1_1.weight')
        state_dict, meta = blob, {}
    merged, upscore_trained = szn_params_from_reference_state_dict(
        state_dict, params)
    known = {f"{n}.{s}" for n in CONV_MODULES for s in ("weight", "bias")}
    known |= {"upscore.weight", "seenmask_upscore.weight"}
    skipped = sorted(set(state_dict) - known)
    return {
        "arch": str(meta.get("arch", "FCN32s")),
        "epoch": int(meta.get("epoch", 0)),
        "iteration": int(meta.get("iteration", 0)),
        "best_mean_iu": float(meta.get("best_mean_iu", 0.0)),
        "params": merged,
        "opt_state": None,
        "upscore_trained": upscore_trained,
        "skipped_keys": skipped,
    }
