from zeroshotsemanticsegmentation_tpu.configs.presets import (
    Config, PRESETS, get_config, validate_config, run_name)

__all__ = ["Config", "PRESETS", "get_config", "validate_config", "run_name"]
