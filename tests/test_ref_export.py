"""Checkpoint exporter: Flax params → reference ``torch.save`` dicts.

The exporter (models/ref_export.py) is the inverse of the importer: the
reference must be able to ``torch.load`` the file, ``load_state_dict`` it
(train.py:114), and ``optim.load_state_dict`` the optimizer blob
(train.py:136). These tests pin: exact round-trip through the importer,
state-dict equality against the independent torch oracle's
reference-layout dump, optimizer-state loadability into the reference's
exact optimizer construction, arch guards, and the CLI/orbax end-to-end
route with config.yaml defaulting.
"""

import os.path as osp

import numpy as np
import pytest
import torch

from zeroshotsemanticsegmentation_tpu.models.ref_export import (
    export_checkpoint, reference_optim_state_dict,
    reference_state_dict_from_params, save_reference_checkpoint)
from zeroshotsemanticsegmentation_tpu.models.ref_import import (
    load_reference_checkpoint)
from test_ref_import import init_params, reference_state_dict
from torch_oracle import TorchFCN  # noqa: E402 — tests dir module


def test_roundtrip_through_importer(tmp_path):
    """export → import recovers every leaf EXACTLY, including a stage-2
    (drifted) seenmask_upscore, whose trained-ness flag carries through."""
    _, params = init_params(0, drift_upscore=True)
    path = str(tmp_path / "exported")
    save_reference_checkpoint(path, params, epoch=3, iteration=77,
                              best_mean_iu=0.3125)
    _, fresh = init_params(1)
    ckpt = load_reference_checkpoint(path, fresh)
    assert ckpt["epoch"] == 3 and ckpt["iteration"] == 77
    assert ckpt["best_mean_iu"] == pytest.approx(0.3125)
    assert ckpt["upscore_trained"] is True
    assert ckpt["skipped_keys"] == []
    for mod in params:
        for leaf in params[mod]:
            np.testing.assert_array_equal(
                ckpt["params"][mod][leaf], params[mod][leaf],
                err_msg=f"{mod}.{leaf}")


def test_state_dict_matches_oracle_layout():
    """The exported model_state_dict is tensor-for-tensor identical to the
    reference-layout dump of the independent torch oracle — two separately
    written flax→torch surgeries agreeing on every weight."""
    _, params = init_params(0, drift_upscore=True)
    got = reference_state_dict_from_params(params)
    want = reference_state_dict(TorchFCN(params))
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_array_equal(got[k].numpy(), want[k].numpy(),
                                      err_msg=k)


@pytest.mark.parametrize("fcn_optim,fcn_lr", [("sgd", 1e-10), ("adam", 1e-5)])
def test_optim_state_loads_into_reference_construction(fcn_optim, fcn_lr):
    """The reference resumes with ``optim.load_state_dict`` UNCONDITIONALLY
    (train.py:136) on an optimizer built from 16 Conv2d weights + 16 biases
    at 2x lr (train.py:125-133, get_parameters:316-327). The exported blob
    must load there and leave the optimizer steppable."""
    sd = reference_optim_state_dict(fcn_optim, fcn_lr)
    # reconstruct the reference's optimizer over really-shaped params
    weights = [torch.nn.Parameter(torch.randn(4, 3, 3, 3))
               for _ in range(16)]
    biases = [torch.nn.Parameter(torch.randn(4)) for _ in range(16)]
    if fcn_optim == "sgd":
        optim = torch.optim.SGD(
            [{"params": weights},
             {"params": biases, "lr": fcn_lr * 2, "weight_decay": 0}],
            lr=fcn_lr, momentum=.99, weight_decay=0.0005)
    else:
        optim = torch.optim.Adam(
            [{"params": weights}, {"params": biases, "lr": fcn_lr * 2}],
            lr=fcn_lr)
    optim.load_state_dict(sd)  # raises on any group-structure mismatch
    assert optim.param_groups[0]["lr"] == pytest.approx(fcn_lr)
    assert optim.param_groups[1]["lr"] == pytest.approx(fcn_lr * 2)
    for p in weights + biases:
        p.grad = torch.zeros_like(p)
    optim.step()  # lazy state init must still work after the load


def test_fcn8s_shaped_tree_refused():
    """The reference has no FCN8s class — a tree with skip-head params (or
    without seenmask_upscore) must be refused, not silently reshaped."""
    _, params = init_params(0)
    with_skip = dict(params)
    with_skip["score_pool3"] = {"kernel": np.zeros((1, 1, 4, 4), np.float32),
                                "bias": np.zeros((4,), np.float32)}
    with pytest.raises(ValueError, match="FCN8s"):
        reference_state_dict_from_params(with_skip)
    missing = {k: v for k, v in params.items() if k != "fc7"}
    with pytest.raises(ValueError, match="missing"):
        reference_state_dict_from_params(missing)


def test_fixed_upscore_exported_as_bilinear_init():
    """Our FCN upscore is a fixed function; the reference model registers it
    as a parameter, so the export must emit the bilinear init — which is
    exactly what a reference-native checkpoint holds (never optimized,
    train.py:324-327). The importer's tamper check doubles as the oracle."""
    from zeroshotsemanticsegmentation_tpu.ops import bilinear_upsampling_kernel

    _, params = init_params(0, n=5)
    sd = reference_state_dict_from_params(params)
    up = sd["upscore.weight"].numpy()  # IOHW (5, 5, 64, 64)
    assert up.shape == (5, 5, 64, 64)
    np.testing.assert_array_equal(
        up.transpose(2, 3, 0, 1), bilinear_upsampling_kernel(5, 64))


def test_export_checkpoint_orbax_end_to_end(tmp_path):
    """Orbax run dir → reference file: metadata carries through, config.yaml
    supplies the optimizer hyperparams, the written file reimports exactly,
    and a reference-format input is refused."""
    from zeroshotsemanticsegmentation_tpu.train.checkpoint import (
        finish_pending, save_checkpoint)

    _, params = init_params(0, drift_upscore=True)
    run_dir = str(tmp_path / "run")
    save_checkpoint(run_dir, params=params, opt_state=None, epoch=9,
                    iteration=402, best_mean_iu=0.51, is_best=True,
                    upscore_trained=True)
    finish_pending()
    with open(osp.join(run_dir, "config.yaml"), "w") as f:
        f.write("fcn_optim: adam\nfcn_lr: 1.0e-05\nconfig: 14\n")

    out = str(tmp_path / "for_reference")
    blob = export_checkpoint(osp.join(run_dir, "best"), out)
    assert blob["epoch"] == 9 and blob["iteration"] == 402
    assert blob["best_mean_iu"] == pytest.approx(0.51)
    # config.yaml's adam/1e-5 became the exported group hyperparams
    assert "momentum" not in blob["optim_state_dict"]["param_groups"][0]
    assert blob["optim_state_dict"]["param_groups"][1]["lr"] == (
        pytest.approx(2e-5))

    _, fresh = init_params(1)
    ckpt = load_reference_checkpoint(out, fresh)
    assert ckpt["upscore_trained"] is True
    for mod in params:
        for leaf in params[mod]:
            np.testing.assert_array_equal(
                ckpt["params"][mod][leaf], params[mod][leaf],
                err_msg=f"{mod}.{leaf}")

    with pytest.raises(ValueError, match="already a reference"):
        export_checkpoint(out, str(tmp_path / "x"))


def test_cli_export_main(tmp_path, capsys):
    """The CLI surface: args parse, file written, summary printed."""
    from zeroshotsemanticsegmentation_tpu.cli.export import main
    from zeroshotsemanticsegmentation_tpu.train.checkpoint import (
        finish_pending, save_checkpoint)

    _, params = init_params(0)
    run_dir = str(tmp_path / "run")
    save_checkpoint(run_dir, params=params, opt_state=None, epoch=1,
                    iteration=10, best_mean_iu=0.2, is_best=True)
    finish_pending()
    out = str(tmp_path / "exported")
    main([osp.join(run_dir, "best"), "-o", out,
          "--fcn_optim", "sgd", "--fcn_lr", "1e-10"])
    assert osp.isfile(out)
    assert "round-trip verified" in capsys.readouterr().out
