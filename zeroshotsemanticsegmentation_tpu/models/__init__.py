"""Model zoo: FCN-32s (VGG16 layout) with embedding + seenmask heads."""

from zeroshotsemanticsegmentation_tpu.models.fcn32s import FCN32s
from zeroshotsemanticsegmentation_tpu.models.fcn8s import FCN8s
from zeroshotsemanticsegmentation_tpu.models.vgg_import import (
    vgg16_params_from_torch_state_dict,
    load_vgg16_into_params,
)

__all__ = [
    "FCN32s",
    "FCN8s",
    "vgg16_params_from_torch_state_dict",
    "load_vgg16_into_params",
]
