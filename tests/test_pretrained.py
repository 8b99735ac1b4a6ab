"""Pretrained-weight acquisition: md5 verification and cache semantics."""

import os.path as osp

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
