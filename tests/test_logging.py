"""RunLogger: CSV headers/append, config dump, elapsed clock."""

import os.path as osp

import pandas as pd

from zeroshotsemanticsegmentation_tpu.utils import RunLogger


def test_csv_append_writes_header_once(tmp_path):
    log = RunLogger(str(tmp_path), tensorboard=False, verbose=False)
    headers = ["epoch", "iteration", "train/loss"]
    log.csv_append("train_log.csv", headers, [0, 0, 1.5])
    log.csv_append("train_log.csv", headers, [0, 1, 1.25])
    df = pd.read_csv(osp.join(str(tmp_path), "train_log.csv"))
    assert list(df.columns) == headers
    assert df["train/loss"].tolist() == [1.5, 1.25]


def test_dump_config_yaml(tmp_path):
    import yaml
    log = RunLogger(str(tmp_path), tensorboard=False, verbose=False)
    log.dump_config({"mode": "train", "fcn_lr": 1e-5, "bucket": [512, 512]})
    with open(osp.join(str(tmp_path), "config.yaml")) as f:
        cfg = yaml.safe_load(f)
    assert cfg["mode"] == "train" and cfg["fcn_lr"] == 1e-5


def test_elapsed_and_scalar_noop_without_tb(tmp_path):
    log = RunLogger(str(tmp_path), tensorboard=False, verbose=False)
    assert log.elapsed_seconds >= 0.0
    log.scalar("a/b", 1.0, 0)  # must not raise with TB disabled
    log.scalars("a", ["x", "y"], [1, 2], 0)
    log.image("img", None, 0)
    log.text("t", "v")
    log.close()
