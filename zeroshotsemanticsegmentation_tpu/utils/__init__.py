from zeroshotsemanticsegmentation_tpu.utils.logging import RunLogger
from zeroshotsemanticsegmentation_tpu.utils.profiling import (
    StepTimer, profile_trace)

__all__ = ["RunLogger", "StepTimer", "profile_trace"]
