"""VGG16 pretrained-weight import: torch/caffe state dict → Flax params.

The reference initializes its conv stack from a caffe-converted torchvision
VGG16 (`models.py:162-210`): conv weights are copied 1:1, and the fc6/fc7
*linear* layers (25088→4096, 4096→4096) are reshaped into 7×7/1×1 convs
(`models.py:189-193`). This module performs the same surgery into the NHWC
Flax parameter tree:

  torch OIHW conv kernels  → HWIO (transpose 2,3,1,0)
  fc6 (4096, 25088) linear → view (4096, 512, 7, 7) OIHW → HWIO
  fc7 (4096, 4096) linear  → view (4096, 4096, 1, 1) OIHW → HWIO

The caffe-lineage weights expect BGR input with mean subtraction — exactly
what the data pipeline produces (reference pascal_dataset.py:39,138-145).

No network access is assumed: the loader takes a local ``.pth`` path or an
already-materialized ``{key: array}`` mapping.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

# torchvision vgg16.features indices of the 13 convs, in FCN32s order
_FEATURE_CONV_INDICES = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
_CONV_NAMES = (
    "conv1_1", "conv1_2",
    "conv2_1", "conv2_2",
    "conv3_1", "conv3_2", "conv3_3",
    "conv4_1", "conv4_2", "conv4_3",
    "conv5_1", "conv5_2", "conv5_3",
)


def _to_numpy(x) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor, without importing torch here
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def vgg16_params_from_torch_state_dict(
        state_dict: Mapping[str, "np.ndarray"]) -> dict:
    """Map a torchvision-style VGG16 state dict to FCN32s backbone params.

    Returns a partial Flax params dict {module_name: {kernel, bias}} covering
    conv1_1..conv5_3, fc6, fc7 (heads are left untouched — the reference also
    initializes them freshly, models.py:93-98).
    """
    params: dict = {}
    for name, idx in zip(_CONV_NAMES, _FEATURE_CONV_INDICES):
        w = _to_numpy(state_dict[f"features.{idx}.weight"])  # (O, I, kh, kw)
        b = _to_numpy(state_dict[f"features.{idx}.bias"])
        params[name] = {"kernel": w.transpose(2, 3, 1, 0), "bias": b}

    fc6_w = _to_numpy(state_dict["classifier.0.weight"]).reshape(4096, 512, 7, 7)
    params["fc6"] = {"kernel": fc6_w.transpose(2, 3, 1, 0),
                     "bias": _to_numpy(state_dict["classifier.0.bias"])}
    fc7_w = _to_numpy(state_dict["classifier.3.weight"]).reshape(4096, 4096, 1, 1)
    params["fc7"] = {"kernel": fc7_w.transpose(2, 3, 1, 0),
                     "bias": _to_numpy(state_dict["classifier.3.bias"])}
    return params


def load_vgg16_into_params(params: dict, source) -> dict:
    """Return a copy of `params` with the VGG16 backbone overwritten.

    `source` is a path to a torch ``.pth`` state dict or a mapping of arrays.
    Shape-checks every tensor against the target tree.
    """
    if isinstance(source, (str, bytes)) or hasattr(source, "__fspath__"):
        import torch  # local import: torch is only needed for .pth files
        source = torch.load(source, map_location="cpu", weights_only=True)
    backbone = vgg16_params_from_torch_state_dict(source)

    out = dict(params)
    for name, new in backbone.items():
        if name not in out:
            raise KeyError(f"model params missing module {name!r}")
        cur = out[name]
        for k in ("kernel", "bias"):
            if tuple(cur[k].shape) != tuple(new[k].shape):
                raise ValueError(
                    f"{name}.{k}: model shape {tuple(cur[k].shape)} != "
                    f"import shape {tuple(new[k].shape)}")
        out[name] = {"kernel": new["kernel"].astype(np.asarray(cur["kernel"]).dtype),
                     "bias": new["bias"].astype(np.asarray(cur["bias"]).dtype)}
    return out
