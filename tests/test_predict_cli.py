"""cli/predict.py: batch images -> label-PNG inference surface.

Covers both checkpoint formats (orbax run dir + reference torch file), size
cropping, tail-batch padding, and the viz overlay output.
"""

import os.path as osp

import numpy as np
import PIL.Image
import pytest

from zeroshotsemanticsegmentation_tpu.cli.predict import run_predict
from test_training import run_tiny, tiny_cfg


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("predict")
    cfg = tiny_cfg(fcn_epochs=1, seenmask_epochs=1)
    out = run_tiny(tmp, cfg, log_name="train")
    return tmp, cfg, out["log_dir"]


def _write_images(d, sizes):
    d.mkdir(exist_ok=True)
    rng = np.random.RandomState(0)
    for i, (h, w) in enumerate(sizes):
        PIL.Image.fromarray(
            rng.randint(0, 255, (h, w, 3)).astype(np.uint8)).save(
            d / f"img{i}.png")


def test_predict_from_orbax_checkpoint(trained_run):
    tmp, cfg, log_dir = trained_run
    imgs = tmp / "imgs"
    _write_images(imgs, [(40, 64), (64, 48), (64, 64)])  # odd sizes + tail
    out = tmp / "preds"
    written = run_predict(cfg, checkpoint=osp.join(log_dir, "best"),
                          images=str(imgs), out_dir=str(out),
                          batch_size=2, viz=True, verbose=False)
    assert len(written) == 6  # 3 preds + 3 viz
    p0 = np.asarray(PIL.Image.open(out / "img0_pred.png"))
    assert p0.shape == (40, 64)  # cropped to the input size
    assert p0.max() < cfg.num_classes
    assert np.asarray(PIL.Image.open(out / "img0_viz.png")).shape == (40, 64, 3)


def test_predict_from_reference_checkpoint(trained_run, tmp_path):
    """The reference's own torch.save checkpoint drives the same surface
    (models/ref_import.py route), with the stage-2 trained-upscore gate."""
    import torch
    from test_ref_import import init_params, save_reference_checkpoint

    tmp, cfg, _ = trained_run
    _, params = init_params(0, drift_upscore=True, scale=1 / 32, n=20)
    ref_ckpt = str(tmp_path / "ref_best")
    save_reference_checkpoint(ref_ckpt, params)

    imgs = tmp_path / "imgs"
    _write_images(imgs, [(64, 64)])
    out = tmp_path / "preds"
    written = run_predict(cfg, checkpoint=ref_ckpt, images=str(imgs),
                          out_dir=str(out), batch_size=1, verbose=False)
    assert written == [str(out / "img0_pred.png")]
    p = np.asarray(PIL.Image.open(written[0]))
    assert p.shape == (64, 64) and p.max() < cfg.num_classes


def test_predict_rejects_oversized_image(trained_run, tmp_path):
    tmp, cfg, log_dir = trained_run
    imgs = tmp_path / "imgs"
    _write_images(imgs, [(100, 100)])  # exceeds the (64, 64) bucket
    with pytest.raises(ValueError, match="bucket"):
        run_predict(cfg, checkpoint=osp.join(log_dir, "best"),
                    images=str(imgs), out_dir=str(tmp_path / "o"),
                    verbose=False)


def test_predict_fcn8s_end_to_end(tmp_path):
    """--arch fcn8s drives the predictor's unfused full-res route (FCN8s has
    no mode='raw' for the fused kernel) from a trained fcn8s checkpoint."""
    cfg = tiny_cfg(fcn_epochs=1, seenmask_epochs=1, arch="fcn8s")
    out = run_tiny(tmp_path, cfg, log_name="train8s")

    imgs = tmp_path / "imgs"
    _write_images(imgs, [(64, 64), (40, 48)])
    preds = tmp_path / "preds"
    written = run_predict(cfg, checkpoint=osp.join(out["log_dir"], "best"),
                          images=str(imgs), out_dir=str(preds),
                          batch_size=2, verbose=False)
    assert len(written) == 2
    p0 = np.asarray(PIL.Image.open(preds / "img0_pred.png"))
    p1 = np.asarray(PIL.Image.open(preds / "img1_pred.png"))
    assert p0.shape == (64, 64) and p1.shape == (40, 48)
    assert p0.max() < cfg.num_classes and p1.max() < cfg.num_classes
