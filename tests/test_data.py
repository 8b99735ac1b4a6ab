"""Data layer: assets, transforms, dataset filtering rules, batch pipeline."""

import os.path as osp

import numpy as np
import PIL.Image
import pytest

from zeroshotsemanticsegmentation_tpu.data import (
    BatchLoader, PascalContext, PascalVOC, SyntheticDataset,
    load_class_embeddings, load_split_ids, pad_to_bucket,
    transform_image, untransform_image)
from zeroshotsemanticsegmentation_tpu.data.transforms import MEAN_BGR


# ---------------------------------------------------------------- assets

def test_embeddings_shapes_and_norms():
    for ds, n in [("pascal", 21), ("context", 33)]:
        for dim in (2, 20, 300):
            e = load_class_embeddings(ds, dim)
            assert e.shape == (n, dim) and e.dtype == np.float32
            norms = np.linalg.norm(e, axis=1)
            assert norms.max() <= 1.0 + 1e-5
    oh = load_class_embeddings("pascal", 21, one_hot=True)
    np.testing.assert_array_equal(oh, np.eye(21, dtype=np.float32))
    # the reference's missing context one-hot (context_dataset.py:104) exists here
    oh33 = load_class_embeddings("context", 33, one_hot=True)
    np.testing.assert_array_equal(oh33, np.eye(33, dtype=np.float32))
    with pytest.raises(ValueError):
        load_class_embeddings("pascal", 20, one_hot=True)


def test_split_id_counts():
    assert len(load_split_ids("pascal", "train")) == 8498
    assert len(load_split_ids("pascal", "val")) == 736
    assert len(load_split_ids("context", "train")) == 4998
    assert len(load_split_ids("context", "val")) == 5105
    # train_seen reads train.txt (reference pascal_dataset.py:59-60)
    assert load_split_ids("pascal", "train_seen") == load_split_ids("pascal", "train")


# ------------------------------------------------------------- transforms

def test_transform_untransform_roundtrip(rng):
    img = rng.randint(0, 256, size=(37, 53, 3)).astype(np.uint8)
    t = transform_image(img)
    assert t.dtype == np.float32
    # BGR order: channel 0 of transformed = blue channel - blue mean
    np.testing.assert_allclose(t[..., 0], img[..., 2] - MEAN_BGR[0], atol=1e-3)
    back = untransform_image(t)
    np.testing.assert_array_equal(back, img)


def test_pad_to_bucket(rng):
    img = rng.randn(40, 60, 3).astype(np.float32)
    lbl = rng.randint(0, 5, size=(40, 60)).astype(np.int32)
    pimg, plbl = pad_to_bucket(img, lbl, (64, 64))
    assert pimg.shape == (64, 64, 3) and plbl.shape == (64, 64)
    np.testing.assert_array_equal(pimg[:40, :60], img)
    np.testing.assert_array_equal(plbl[:40, :60], lbl)
    assert (plbl[40:, :] == -1).all() and (plbl[:, 60:] == -1).all()
    assert (pimg[40:, :, :] == 0).all()
    with pytest.raises(ValueError):
        pad_to_bucket(img, lbl, (32, 64))


# ------------------------------------------------- dataset fixture helpers

PASCAL_IDS = ["img_a", "img_b", "img_c", "img_d"]
# class content per image: a:{0,1} b:{0,13} c:{0,2,255} d:{0,17}
PASCAL_CONTENT = {"img_a": [0, 1], "img_b": [0, 13], "img_c": [0, 2, 255],
                  "img_d": [0, 17]}


def _write_label_png(path, lbl):
    PIL.Image.fromarray(lbl.astype(np.uint8), mode="L").save(path)


def _make_pascal_tree(tmp_path, assets_dir):
    import scipy.io
    root = tmp_path / "data"
    sbd = root / "pascal" / "benchmark_RELEASE" / "dataset"
    voc = root / "pascal" / "VOCdevkit" / "VOC2012"
    for sub in ["img", "cls"]:
        (sbd / sub).mkdir(parents=True, exist_ok=True)
    for sub in ["JPEGImages", "SegmentationClass"]:
        (voc / sub).mkdir(parents=True, exist_ok=True)

    rng = np.random.RandomState(0)
    for did in PASCAL_IDS:
        h, w = int(rng.randint(20, 40)), int(rng.randint(20, 40))
        img = rng.randint(0, 255, size=(h, w, 3)).astype(np.uint8)
        lbl = np.zeros((h, w), np.int32)
        for j, c in enumerate(PASCAL_CONTENT[did]):
            lbl[:, j::len(PASCAL_CONTENT[did])] = c
        PIL.Image.fromarray(img).save(sbd / "img" / f"{did}.jpg")
        PIL.Image.fromarray(img).save(voc / "JPEGImages" / f"{did}.jpg")
        scipy.io.savemat(sbd / "cls" / f"{did}.mat",
                         {"GTcls": {"Segmentation": lbl.astype(np.uint8)}})
        _write_label_png(voc / "SegmentationClass" / f"{did}.png", lbl)

    (assets_dir / "pascal").mkdir(parents=True, exist_ok=True)
    for split in ["train", "val"]:
        (assets_dir / "pascal" / f"{split}.txt").write_text(
            "\n".join(PASCAL_IDS) + "\n")
    return str(root), str(assets_dir)


@pytest.fixture
def pascal_tree(tmp_path):
    return _make_pascal_tree(tmp_path, tmp_path / "assets")


def test_pascal_filtering_and_getitem(pascal_tree):
    data_dir, assets_dir = pascal_tree
    kw = dict(data_dir=data_dir, assets_dir=assets_dir,
              train_unseen=[1], val_unseen=[13])
    # train: drop images containing val_unseen(13) -> img_b dropped
    train = PascalVOC("train", **kw)
    assert train.ids == ["img_a", "img_c", "img_d"]
    # train_seen: drop train_unseen(1) + val_unseen(13) -> img_a, img_b dropped
    train_seen = PascalVOC("train_seen", **kw)
    assert train_seen.ids == ["img_c", "img_d"]
    # val: no filtering for pascal
    val = PascalVOC("val", **kw)
    assert val.ids == PASCAL_IDS

    s = train[1]  # img_c contains 255 -> must remap to -1
    assert s["image"].dtype == np.float32 and s["label"].dtype == np.int32
    assert (s["label"] == -1).any() and s["label"].max() <= 20
    assert s["image"].shape[:2] == s["label"].shape

    # presence cache file created and reused
    assert osp.exists(osp.join(data_dir, "cache", "pascal_train_presence.npz"))
    train2 = PascalVOC("train", **kw)
    assert train2.ids == train.ids


def test_context_filtering_and_shift(tmp_path):
    root = tmp_path / "data"
    voc = root / "pascal" / "VOCdevkit" / "VOC2012" / "JPEGImages"
    ctx = root / "context" / "33_context_labels"
    voc.mkdir(parents=True); ctx.mkdir(parents=True)
    assets = tmp_path / "assets" / "context"
    assets.mkdir(parents=True)

    ids = ["c1", "c2", "c3"]
    # 1-indexed label PNGs; c2 contains a 0 pixel (-> -1 after shift: dropped)
    content = {"c1": [1, 5], "c2": [0, 3], "c3": [2, 17]}
    rng = np.random.RandomState(1)
    for did in ids:
        img = rng.randint(0, 255, size=(24, 30, 3)).astype(np.uint8)
        PIL.Image.fromarray(img).save(voc / f"{did}.jpg")
        lbl = np.zeros((24, 30), np.int32)
        for j, c in enumerate(content[did]):
            lbl[:, j::len(content[did])] = c
        _write_label_png(ctx / f"{did}.png", lbl)
    for split in ["train", "val"]:
        (assets / f"{split}.txt").write_text("\n".join(ids) + "\n")

    kw = dict(data_dir=str(root), assets_dir=str(tmp_path / "assets"))
    # all splits drop c2 (contains invalid); train also drops val_unseen(16)
    assert PascalContext("val", **kw).ids == ["c1", "c3"]
    tr = PascalContext("train", val_unseen=[16], **kw)
    assert tr.ids == ["c1"]  # c3 contains png 17 -> class 16 (val_unseen)
    s = PascalContext("val", **kw)[0]
    assert s["label"].min() >= 0 and s["label"].max() <= 32


def test_context_unseen_filter_after_shift(tmp_path):
    """val_unseen ids are 0-indexed; PNG value c maps to class c-1."""
    root = tmp_path / "data"
    voc = root / "pascal" / "VOCdevkit" / "VOC2012" / "JPEGImages"
    ctx = root / "context" / "33_context_labels"
    voc.mkdir(parents=True); ctx.mkdir(parents=True)
    assets = tmp_path / "assets" / "context"
    assets.mkdir(parents=True)
    rng = np.random.RandomState(2)
    for did, png_vals in [("u1", [1, 17]), ("u2", [2, 4])]:
        img = rng.randint(0, 255, size=(16, 16, 3)).astype(np.uint8)
        PIL.Image.fromarray(img).save(voc / f"{did}.jpg")
        lbl = np.full((16, 16), png_vals[0], np.int32)
        lbl[:8] = png_vals[1]
        _write_label_png(ctx / f"{did}.png", lbl)
    for split in ["train", "val"]:
        (assets / f"{split}.txt").write_text("u1\nu2\n")
    kw = dict(data_dir=str(root), assets_dir=str(tmp_path / "assets"))
    tr = PascalContext("train", val_unseen=[16], **kw)
    assert tr.ids == ["u2"]  # u1 contains class 17-1=16


def test_context59_dataset_and_assets(tmp_path):
    """59-class extension (NOT in the reference): labels live under
    59_context_labels, unmapped pixels (PNG 0) become ignore (-1) WITHOUT
    dropping the image (the 33-class drop-invalid rule would empty the
    splits under the 59 vocabulary), and the presence cache is variant-keyed."""
    from zeroshotsemanticsegmentation_tpu.data.assets import class_names
    assert len(class_names("context", 59)) == 59
    assert class_names("context", 33) == class_names("context")
    oh59 = load_class_embeddings("context", 59, one_hot=True, n_classes=59)
    assert oh59.shape == (59, 59) and (oh59 == np.eye(59)).all()
    # the 59-class word2vec matrix cannot be bundled air-gapped: clear error
    with pytest.raises(FileNotFoundError, match="egress"):
        load_class_embeddings("context", 20, n_classes=59)

    root = tmp_path / "data"
    voc = root / "pascal" / "VOCdevkit" / "VOC2012" / "JPEGImages"
    ctx = root / "context" / "59_context_labels"
    voc.mkdir(parents=True); ctx.mkdir(parents=True)
    assets = tmp_path / "assets" / "context"
    assets.mkdir(parents=True)
    rng = np.random.RandomState(3)
    # d1 has unmapped pixels (0) — must be KEPT, with -1 ignore labels
    for did, vals in [("d1", [0, 7]), ("d2", [59, 3])]:
        img = rng.randint(0, 255, size=(16, 16, 3)).astype(np.uint8)
        PIL.Image.fromarray(img).save(voc / f"{did}.jpg")
        lbl = np.full((16, 16), vals[0], np.int32)
        lbl[:8] = vals[1]
        _write_label_png(ctx / f"{did}.png", lbl)
    for split in ["train", "val"]:
        (assets / f"{split}.txt").write_text("d1\nd2\n")
    kw = dict(data_dir=str(root), assets_dir=str(tmp_path / "assets"),
              n_classes=59)
    ds = PascalContext("val", **kw)
    assert ds.ids == ["d1", "d2"]  # no invalid-image drop at 59
    s0 = ds[0]
    assert s0["label"].min() == -1 and s0["label"].max() == 6
    assert ds[1]["label"].max() == 58
    # unseen filtering still works on the 59-class ids
    tr = PascalContext("train", val_unseen=[58], **kw)
    assert tr.ids == ["d1"]
    assert osp.exists(osp.join(str(root), "cache",
                               "context59_train_presence.npz"))


def test_make_context59_labels_converter(tmp_path):
    """Official-annotation remap: ids come from labels.txt BY NAME; missing
    names fail loudly; unmapped raw ids become PNG 0 (ignore)."""
    import scipy.io

    from scripts.make_context59_labels import build_lut, convert
    from zeroshotsemanticsegmentation_tpu.data.assets import (
        CONTEXT59_CLASS_NAMES)

    # fabricate a labels.txt: the 59 names at scattered raw ids + extras
    rng = np.random.RandomState(0)
    raw_ids = rng.permutation(np.arange(2, 500))[:59]
    lines = [f"{rid}: {name}" for rid, name
             in zip(raw_ids, CONTEXT59_CLASS_NAMES)]
    lines += ["1: somethingrare", "500: anotherextra"]
    labels_txt = tmp_path / "labels.txt"
    labels_txt.write_text("\n".join(lines) + "\n")

    mat_dir = tmp_path / "trainval"
    mat_dir.mkdir()
    # raw LabelMap containing: the raw id of class index 10, an extra (1),
    # and the raw id of class index 58
    raw = np.full((10, 12), raw_ids[10], np.uint16)
    raw[:5] = 1
    raw[:, :3] = raw_ids[58]
    scipy.io.savemat(mat_dir / "2008_000001.mat", {"LabelMap": raw})
    out = tmp_path / "out"
    n = convert(str(labels_txt), str(mat_dir), str(out))
    assert n == 1
    png = np.asarray(PIL.Image.open(out / "2008_000001.png"))
    assert png[6, 5] == 11      # class index 10 -> 1-indexed 11
    assert png[0, 5] == 0       # extra class -> unmapped
    assert png[6, 1] == 59      # class index 58 -> 59
    # and the loader shifts it to the 0-indexed/-1 convention
    assert png.dtype == np.uint8

    # missing a 59-class name in labels.txt must refuse to build a lut
    with pytest.raises(ValueError, match="missing"):
        build_lut({"aeroplane": 3}, max_raw_id=10)


def test_context_classes_config_validation():
    from zeroshotsemanticsegmentation_tpu.configs import (
        PRESETS, validate_config)
    cfg = PRESETS[18].replace(context_classes=59)
    validate_config(cfg)  # fine
    assert cfg.num_classes == 59
    with pytest.raises(ValueError, match="33"):
        validate_config(PRESETS[18].replace(context_classes=21))
    with pytest.raises(ValueError, match="context"):
        validate_config(PRESETS[14].replace(context_classes=59))


# --------------------------------------------------------------- pipeline

def test_batch_loader_shapes_and_padding():
    ds = SyntheticDataset(num_images=5, num_classes=7, size_range=(20, 40))
    loader = BatchLoader(ds, batch_size=2, bucket_hw=(48, 48))
    batches = list(loader)
    assert len(batches) == 3
    for b in batches[:-1]:
        assert b["image"].shape == (2, 48, 48, 3)
        assert b["label"].shape == (2, 48, 48)
        assert b["num_real"] == 2
    last = batches[-1]
    assert last["num_real"] == 1
    # dummy slot fully ignored
    assert (last["label"][1] == -1).all()
    assert (last["image"][1] == 0).all()


def test_batch_loader_shuffle_determinism():
    ds = SyntheticDataset(num_images=12, size_range=(20, 24))
    l1 = BatchLoader(ds, batch_size=3, bucket_hw=(24, 24), shuffle=True, seed=7)
    l2 = BatchLoader(ds, batch_size=3, bucket_hw=(24, 24), shuffle=True, seed=7)
    ids1 = [b["ids"] for b in l1]
    ids2 = [b["ids"] for b in l2]
    assert ids1 == ids2
    l1.set_epoch(1)
    ids3 = [b["ids"] for b in l1]
    assert ids3 != ids1  # different epoch -> different order


def test_batch_loader_drop_remainder():
    ds = SyntheticDataset(num_images=5, size_range=(20, 24))
    loader = BatchLoader(ds, batch_size=2, bucket_hw=(24, 24),
                         drop_remainder=True)
    assert len(loader) == 2
    assert len(list(loader)) == 2


def test_compact_feed_matches_host_transform(rng):
    """BatchLoader(compact=True): uint8/int8 batches whose device-side
    prepared images equal the host float path inside the image extent and
    are exactly zero in the pad region."""
    import jax.numpy as jnp
    from zeroshotsemanticsegmentation_tpu.data import (
        BatchLoader, SyntheticDataset)
    from zeroshotsemanticsegmentation_tpu.data.transforms import (
        transform_image)
    from zeroshotsemanticsegmentation_tpu.train.steps import _prepare_batch

    ds = SyntheticDataset(num_images=3, num_classes=21,
                          size_range=(40, 64), seed=3)
    loader = BatchLoader(ds, 2, bucket_hw=(64, 64), compact=True)
    batch = next(iter(loader))
    assert batch["image"].dtype == np.uint8
    assert batch["label"].dtype == np.int8

    jbatch = {k: jnp.asarray(v) for k, v in batch.items() if k != "ids"}
    images, labels = _prepare_batch(jbatch)
    assert images.dtype == jnp.float32 and labels.dtype == jnp.int32
    img_np = np.asarray(images)
    for i in range(batch["num_real"]):
        h, w = batch["sizes"][i]
        want = transform_image(batch["image"][i, :h, :w])
        np.testing.assert_allclose(img_np[i, :h, :w], want, atol=1e-4)
        # pad region exactly zero (conv-zero-padding equivalence)
        if h < 64:
            assert np.all(img_np[i, h:, :] == 0.0)
        if w < 64:
            assert np.all(img_np[i, :, w:] == 0.0)
    # dummy sample (num_real < B) fully zero, labels all -1
    if batch["num_real"] < 2:
        assert np.all(img_np[-1] == 0.0)
        assert np.all(batch["label"][-1] == -1)


def test_batch_loader_compact_python_int8_guard():
    """Python compact path must refuse labels that don't survive int8
    narrowing (wrapped ids would silently become ignore/-wrong-class) —
    mirrors the native path's rc -5."""
    from zeroshotsemanticsegmentation_tpu.data import BatchLoader
    from zeroshotsemanticsegmentation_tpu.data.pipeline import SyntheticDataset
    ds = SyntheticDataset(4, num_classes=200, size_range=(24, 32))
    loader = BatchLoader(ds, 2, bucket_hw=(32, 32), compact=True)
    with pytest.raises(ValueError, match="int8"):
        next(iter(loader))


def test_batch_loader_mixed_compact_same_dataset_refused():
    """Two Python-path loaders with different compact settings over ONE
    dataset instance would corrupt each other's sample format (raw uint8
    cast into float32 batches skips normalization) — must refuse."""
    from zeroshotsemanticsegmentation_tpu.data import BatchLoader
    from zeroshotsemanticsegmentation_tpu.data.pipeline import SyntheticDataset
    ds = SyntheticDataset(4, size_range=(24, 32))
    BatchLoader(ds, 2, bucket_hw=(32, 32), compact=True)
    with pytest.raises(ValueError, match="compact"):
        BatchLoader(ds, 2, bucket_hw=(32, 32), compact=False)
    BatchLoader(ds, 2, bucket_hw=(32, 32), compact=True)  # same mode: fine


def test_batch_loader_use_native_unsupported_dataset_raises():
    """Explicit use_native=True on a dataset with no native decode support
    must raise, not silently run the Python path."""
    from zeroshotsemanticsegmentation_tpu.data import BatchLoader
    from zeroshotsemanticsegmentation_tpu.data.pipeline import SyntheticDataset
    with pytest.raises(RuntimeError, match="native"):
        BatchLoader(SyntheticDataset(4), 2, use_native=True)


def test_batch_loader_abandoned_iterator_stops_producer():
    """Abandoning iteration mid-epoch (step raised / KeyboardInterrupt) must
    release the producer thread: it parks in a bounded put() that observes
    the stop event, instead of blocking forever on the full queue."""
    import threading
    import time
    from zeroshotsemanticsegmentation_tpu.data import BatchLoader
    from zeroshotsemanticsegmentation_tpu.data.pipeline import SyntheticDataset
    ds = SyntheticDataset(64, size_range=(24, 32))
    loader = BatchLoader(ds, 2, bucket_hw=(32, 32), prefetch=1)
    before = {t.ident for t in threading.enumerate()}
    it = iter(loader)
    next(it)
    it.close()  # generator finally -> stop.set()
    deadline = time.time() + 5.0
    while time.time() < deadline:
        extra = [t for t in threading.enumerate()
                 if t.ident not in before and t.is_alive()]
        if not extra:
            break
        time.sleep(0.05)
    assert not extra, f"producer thread(s) leaked: {extra}"


def test_presence_cache_corrupt_file_recovers(pascal_tree):
    """A truncated/corrupt presence cache (killed writer) must be recomputed,
    not crash every later dataset construction."""
    import os.path as osp
    data_dir, assets_dir = pascal_tree
    ds = PascalVOC("train", data_dir=data_dir, assets_dir=assets_dir,
                   val_unseen=[13])
    cache = osp.join(data_dir, "cache", "pascal_train_presence.npz")
    assert osp.exists(cache)
    with open(cache, "wb") as f:
        f.write(b"garbage, not a zip")
    ds2 = PascalVOC("train", data_dir=data_dir, assets_dir=assets_dir,
                    val_unseen=[13])
    assert ds2.ids == ds.ids
    # and the recompute republished a valid cache
    ds3 = PascalVOC("train", data_dir=data_dir, assets_dir=assets_dir,
                    val_unseen=[13])
    assert ds3.ids == ds.ids


def test_presence_scan_skipped_when_nothing_to_filter(pascal_tree, monkeypatch):
    """pascal val (no drop rules) must not decode every label at construction
    — the reference's cold-start hot spot (pascal_dataset.py:62-84)."""
    data_dir, assets_dir = pascal_tree
    calls = []
    orig = PascalVOC._load_label
    monkeypatch.setattr(PascalVOC, "_load_label",
                        lambda self, did: calls.append(did) or orig(self, did))
    ds = PascalVOC("val", data_dir=data_dir, assets_dir=assets_dir,
                   use_presence_cache=False)
    assert calls == []  # construction touched no labels
    assert len(ds) > 0
    # splits WITH drop rules still scan (fresh tree, no cache)
    PascalVOC("train_seen", data_dir=data_dir, assets_dir=assets_dir,
              train_unseen=[1], val_unseen=[13], use_presence_cache=False)
    assert len(calls) > 0
