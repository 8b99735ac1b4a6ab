from zeroshotsemanticsegmentation_tpu.cli.train import main, run_experiment

__all__ = ["main", "run_experiment"]
