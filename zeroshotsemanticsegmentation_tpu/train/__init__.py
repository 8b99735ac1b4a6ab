"""Training stack: optimizers, jitted steps, checkpointing, trainers."""

from zeroshotsemanticsegmentation_tpu.train.optim import (
    make_fcn_optimizer, make_seenmask_optimizer)
from zeroshotsemanticsegmentation_tpu.train.state import TrainState
from zeroshotsemanticsegmentation_tpu.train.trainer_fcn import FCNTrainer
from zeroshotsemanticsegmentation_tpu.train.trainer_seenmask import SeenmaskTrainer

__all__ = ["make_fcn_optimizer", "make_seenmask_optimizer", "TrainState",
           "FCNTrainer", "SeenmaskTrainer"]
