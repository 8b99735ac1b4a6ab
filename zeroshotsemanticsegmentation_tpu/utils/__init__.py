from zeroshotsemanticsegmentation_tpu.utils.logging import RunLogger

__all__ = ["RunLogger"]
