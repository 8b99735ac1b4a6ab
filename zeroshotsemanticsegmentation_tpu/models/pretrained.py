"""Pretrained-weight acquisition (reference models.py:195-210 equivalent).

The reference fetches a caffe-converted torchvision VGG16 state dict through
``fcn.data.cached_download`` (URL + md5). This helper reproduces that
behavior without the ``fcn`` dependency: download once into
``data_dir/models/``, verify the md5, reuse the cached file afterwards. In
air-gapped environments, place the file at the returned path manually and the
download is skipped.

Usage:
    path = cached_download_vgg16(data_dir)           # needs egress once
    params = load_vgg16_into_params(params, path)    # models.vgg_import
"""

from __future__ import annotations

import hashlib
import os
import os.path as osp
import urllib.request

# reference models.py:205-210 (caffe-converted VGG16, torchvision layout)
VGG16_URL = "http://drive.google.com/uc?id=0B9P1L--7Wd2vLTJZMXpIRkVVRFk"
VGG16_MD5 = "aa75b158f4181e7f6230029eb96c1b13"


def md5sum(path: str, chunk: int = 1 << 20) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def cached_download(url: str, path: str, md5: str | None = None) -> str:
    """Download `url` to `path` unless a file with the right md5 exists."""
    if osp.exists(path):
        if md5 is None or md5sum(path) == md5:
            return path
        raise IOError(f"{path} exists but md5 mismatch (expected {md5})")
    os.makedirs(osp.dirname(path) or ".", exist_ok=True)
    tmp = path + ".part"
    urllib.request.urlretrieve(url, tmp)
    if md5 is not None and md5sum(tmp) != md5:
        os.remove(tmp)
        raise IOError(f"downloaded {url} failed md5 check")
    os.replace(tmp, path)
    return path


def cached_download_vgg16(data_dir: str) -> str:
    return cached_download(
        VGG16_URL, osp.join(data_dir, "models", "vgg16_from_caffe.pth"),
        VGG16_MD5)
