"""CLI argument mapping and checkpoint module units."""

import os.path as osp

import numpy as np
import pytest

import zeroshotsemanticsegmentation_tpu.cli.train as cli
from zeroshotsemanticsegmentation_tpu.train import checkpoint as ckpt


def test_cli_overrides_map_to_config(monkeypatch):
    captured = {}

    def fake_run(cfg, **kw):
        captured["cfg"] = cfg
        captured.update(kw)
        return {"log_dir": "x"}

    monkeypatch.setattr(cli, "run_experiment", fake_run)
    cli.main(["-c", "14", "-ve", "3", "-lr", "0.01", "-loss", "mse",
              "-o", "sgd", "-se", "2", "-slr", "0.5", "-tu", "2,3",
              "-vu", "4", "-oh", "-fu", "--batch_size", "4",
              "--eval_batch_size", "4", "--dtype", "float32",
              "--arch", "fcn8s", "--synthetic", "-e", "21",
              "--bucket", "96", "--channel_scale", "0.5"])
    cfg = captured["cfg"]
    assert cfg.fcn_epochs == 3 and cfg.fcn_lr == 0.01
    assert cfg.fcn_loss == "mse" and cfg.fcn_optim == "sgd"
    assert cfg.seenmask_epochs == 2 and cfg.seenmask_lr == 0.5
    assert cfg.train_unseen == (2, 3) and cfg.val_unseen == (4,)
    assert cfg.one_hot_embed and cfg.forced_unseen
    assert cfg.batch_size == 4 and cfg.compute_dtype == "float32"
    assert cfg.arch == "fcn8s" and cfg.embed_dim == 21
    assert cfg.bucket == (96, 96) and cfg.channel_scale == 0.5
    assert captured["synthetic"] is True


def test_cli_resume_flag(monkeypatch):
    captured = {}
    monkeypatch.setattr(cli, "run_experiment",
                        lambda cfg, **kw: captured.update(cfg=cfg, **kw) or {})
    cli.main(["-c", "4", "-r", "/some/ckpt"])
    assert captured["resume"] == "/some/ckpt"
    assert captured["cfg"].load_fcn_path == "/some/ckpt"


def test_cli_rejects_bad_preset():
    with pytest.raises(SystemExit):
        cli.main(["-c", "99"])


def test_checkpoint_roundtrip_and_hardlink_best(tmp_path, rng):
    params = {"conv": {"kernel": rng.randn(3, 3).astype(np.float32)}}
    opt_state = {"mu": rng.randn(4).astype(np.float32)}
    ckpt.save_checkpoint(str(tmp_path), params=params, opt_state=opt_state,
                         epoch=2, iteration=17, best_mean_iu=0.5,
                         is_best=True)
    assert ckpt.checkpoint_exists(osp.join(str(tmp_path), "checkpoint"))
    assert ckpt.checkpoint_exists(osp.join(str(tmp_path), "best"))
    got = ckpt.restore_checkpoint(osp.join(str(tmp_path), "best"))
    assert got["arch"] == "FCN32s" and got["epoch"] == 2
    assert got["iteration"] == 17 and got["best_mean_iu"] == 0.5
    np.testing.assert_array_equal(got["params"]["conv"]["kernel"],
                                  params["conv"]["kernel"])

    # non-best save: 'best' unchanged, checkpoint updated (async path)
    params2 = {"conv": {"kernel": params["conv"]["kernel"] * 2}}
    ckpt.save_checkpoint(str(tmp_path), params=params2, opt_state=opt_state,
                         epoch=3, iteration=20, best_mean_iu=0.5,
                         is_best=False)
    ckpt._finish_pending()
    latest = ckpt.restore_checkpoint(osp.join(str(tmp_path), "checkpoint"))
    best = ckpt.restore_checkpoint(osp.join(str(tmp_path), "best"))
    assert latest["epoch"] == 3 and best["epoch"] == 2
    np.testing.assert_array_equal(best["params"]["conv"]["kernel"],
                                  params["conv"]["kernel"])


def test_cli_main_end_to_end_synthetic(tmp_path):
    """Full argv-level run: thin model, 1 epoch, both stages, CPU."""
    out = cli.main(["-c", "14", "-ve", "1", "-se", "1", "--synthetic",
                    "--batch_size", "2", "--eval_batch_size", "2",
                    "--bucket", "64", "--channel_scale", "0.03125",
                    "--dtype", "float32", "-dir", str(tmp_path)])
    assert osp.exists(osp.join(out["log_dir"], "train_log.csv"))
    assert osp.exists(osp.join(out["log_dir"], "seenmask_train_log.csv"))
    assert ckpt.checkpoint_exists(osp.join(out["log_dir"], "best"))
    assert np.isfinite(out["best_mean_iu"])


def test_batch_loader_propagates_producer_errors():
    """A decode failure raises in the consumer instead of deadlocking."""
    from zeroshotsemanticsegmentation_tpu.data import BatchLoader

    class Broken:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            raise ValueError("decode exploded")

    loader = BatchLoader(Broken(), 2, bucket_hw=(32, 32))
    with pytest.raises(ValueError, match="decode exploded"):
        list(loader)
