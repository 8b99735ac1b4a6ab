"""StepTimer + jax.profiler trace integration."""

import glob
import os.path as osp
import time

import numpy as np

from zeroshotsemanticsegmentation_tpu.utils import StepTimer, profile_trace


def test_step_timer_summary():
    t = StepTimer(pixels_per_step=1_000_000, items_per_step=4)
    for _ in range(5):
        with t:
            time.sleep(0.01)
    s = t.summary()
    assert s["steps"] == 4  # warmup skipped
    assert 0.005 < s["mean_s"] < 0.1
    assert s["items_per_s"] > 0 and s["megapixels_per_s"] > 0
    t.reset()
    assert t.num_steps == 0


def test_profile_trace_writes_dump(tmp_path):
    import jax.numpy as jnp
    with profile_trace(str(tmp_path)):
        jnp.ones((8, 8)).sum().block_until_ready()
    assert glob.glob(osp.join(str(tmp_path), "**", "*.xplane.pb"),
                     recursive=True)


def test_trainer_profile_steps(tmp_path):
    from tests.test_training import tiny_cfg, run_tiny
    cfg = tiny_cfg(fcn_epochs=1, profile_steps=2)
    out = run_tiny(tmp_path, cfg, log_name="prof")
    assert glob.glob(osp.join(out["log_dir"], "profile", "**", "*.xplane.pb"),
                     recursive=True)
