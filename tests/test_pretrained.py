"""Pretrained-weight acquisition: md5 verification and cache semantics."""

import os.path as osp

import numpy as np

import pytest

from zeroshotsemanticsegmentation_tpu.models.pretrained import (
    cached_download, md5sum)


def test_md5sum(tmp_path):
    p = tmp_path / "f.bin"
    p.write_bytes(b"hello world")
    assert md5sum(str(p)) == "5eb63bbbe01eeed093cb22bb8f5acdc3"


def test_cached_download_uses_existing_file(tmp_path, monkeypatch):
    target = tmp_path / "weights.pth"
    target.write_bytes(b"cached")
    called = []
    monkeypatch.setattr("urllib.request.urlretrieve",
                        lambda url, path: called.append(url))
    out = cached_download("http://example.invalid/w.pth", str(target),
                          md5=md5sum(str(target)))
    assert out == str(target) and not called


def test_cached_download_md5_mismatch_raises(tmp_path):
    target = tmp_path / "weights.pth"
    target.write_bytes(b"corrupted")
    with pytest.raises(IOError, match="md5 mismatch"):
        cached_download("http://example.invalid/w.pth", str(target),
                        md5="0" * 32)


def test_cached_download_fetches_and_verifies(tmp_path, monkeypatch):
    payload = b"fresh weights"

    def fake_retrieve(url, path):
        with open(path, "wb") as f:
            f.write(payload)

    monkeypatch.setattr("urllib.request.urlretrieve", fake_retrieve)
    target = str(tmp_path / "sub" / "w.pth")
    import hashlib
    out = cached_download("http://example.invalid/w.pth", target,
                          md5=hashlib.md5(payload).hexdigest())
    assert osp.exists(out)
    with pytest.raises(IOError, match="failed md5"):
        cached_download("http://example.invalid/w2.pth",
                        str(tmp_path / "bad.pth"), md5="1" * 32)
    assert not osp.exists(str(tmp_path / "bad.pth"))


def test_dataset_download_idempotent(tmp_path, monkeypatch):
    """Existing markers skip fetches (no egress in this environment)."""
    from zeroshotsemanticsegmentation_tpu.data import download as dl
    (tmp_path / "pascal" / "benchmark_RELEASE").mkdir(parents=True)
    (tmp_path / "pascal" / "VOCdevkit" / "VOC2012").mkdir(parents=True)
    (tmp_path / "context" / "33_context_labels").mkdir(parents=True)
    called = []
    monkeypatch.setattr("urllib.request.urlretrieve",
                        lambda url, path: called.append(url))
    dl.download_pascal(str(tmp_path))
    dl.download_context(str(tmp_path))
    assert not called


def test_egress_runbook_vgg_check_logic(tmp_path, rng):
    """scripts/egress_runbook.py's verification path works end to end with a
    synthetic torchvision-shaped .pth, so egress day needs zero debugging —
    only the real download differs."""
    import importlib.util
    import os.path as osp
    import torch

    repo = osp.dirname(osp.dirname(osp.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "egress_runbook", osp.join(repo, "scripts", "egress_runbook.py"))
    rb = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rb)

    shapes = {
        "features.0": (64, 3), "features.2": (64, 64),
        "features.5": (128, 64), "features.7": (128, 128),
        "features.10": (256, 128), "features.12": (256, 256),
        "features.14": (256, 256),
        "features.17": (512, 256), "features.19": (512, 512),
        "features.21": (512, 512),
        "features.24": (512, 512), "features.26": (512, 512),
        "features.28": (512, 512),
    }
    sd = {}
    for key, (o, i) in shapes.items():
        sd[f"{key}.weight"] = torch.from_numpy(
            rng.randn(o, i, 3, 3).astype(np.float32) * 0.01)
        sd[f"{key}.bias"] = torch.from_numpy(
            rng.randn(o).astype(np.float32) * 0.01)
    sd["classifier.0.weight"] = torch.from_numpy(
        rng.randn(4096, 25088).astype(np.float32) * 0.001)
    sd["classifier.0.bias"] = torch.from_numpy(
        rng.randn(4096).astype(np.float32) * 0.01)
    sd["classifier.3.weight"] = torch.from_numpy(
        rng.randn(4096, 4096).astype(np.float32) * 0.001)
    sd["classifier.3.bias"] = torch.from_numpy(
        rng.randn(4096).astype(np.float32) * 0.01)
    pth = str(tmp_path / "vgg16_from_caffe.pth")
    torch.save(sd, pth)

    rel = rb.verify_vgg16_import(pth)
    assert rel < 1e-3
