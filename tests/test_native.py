"""Native C++ loader vs the Python decode path."""

import numpy as np
import PIL.Image
import pytest

from zeroshotsemanticsegmentation_tpu.data.native import NativeLoader
from zeroshotsemanticsegmentation_tpu.data.transforms import transform_image

pytestmark = pytest.mark.skipif(not NativeLoader.available(),
                                reason="libzss_loader.so not built")


@pytest.fixture
def fixtures(tmp_path, rng):
    img = rng.randint(0, 255, size=(37, 53, 3)).astype(np.uint8)
    img_path = str(tmp_path / "img.jpg")
    PIL.Image.fromarray(img).save(img_path, quality=95)
    lbl = rng.randint(0, 21, size=(37, 53)).astype(np.uint8)
    lbl[::7, ::5] = 255
    lbl_path = str(tmp_path / "lbl.png")
    PIL.Image.fromarray(lbl, mode="L").save(lbl_path)
    return img_path, lbl_path, lbl


def test_decode_image_matches_python(fixtures):
    img_path, _, _ = fixtures
    nl = NativeLoader.get()
    native, size = nl.decode_image(img_path, (64, 64))
    assert size == (37, 53)
    decoded = np.asarray(PIL.Image.open(img_path).convert("RGB"), np.uint8)
    want = transform_image(decoded)
    # same libjpeg decode + same transform => exact within float32 rounding
    np.testing.assert_allclose(native[:37, :53], want, atol=2.0)
    assert (native[37:] == 0).all() and (native[:, 53:] == 0).all()


def test_decode_label_matches_python(fixtures):
    _, lbl_path, lbl = fixtures
    nl = NativeLoader.get()
    native, size = nl.decode_label(lbl_path, (64, 64), map255_to_ignore=True)
    assert size == (37, 53)
    want = lbl.astype(np.int32)
    want[want == 255] = -1
    np.testing.assert_array_equal(native[:37, :53], want)
    assert (native[37:] == -1).all() and (native[:, 53:] == -1).all()
    # context-style 1-indexed shift
    native2, _ = nl.decode_label(lbl_path, (64, 64), value_offset=-1,
                                 map255_to_ignore=False)
    np.testing.assert_array_equal(native2[:37, :53], lbl.astype(np.int32) - 1)


def test_palette_png_reads_indices(tmp_path, rng):
    lbl = rng.randint(0, 21, size=(20, 20)).astype(np.uint8)
    im = PIL.Image.fromarray(lbl, mode="P")
    im.putpalette([c for i in range(256) for c in (i, 0, 255 - i)])
    path = str(tmp_path / "pal.png")
    im.save(path)
    nl = NativeLoader.get()
    native, _ = nl.decode_label(path, (20, 20))
    np.testing.assert_array_equal(native, lbl.astype(np.int32))


def test_load_batch_parallel(fixtures, tmp_path, rng):
    img_path, lbl_path, lbl = fixtures
    nl = NativeLoader.get()
    images, labels, sizes = nl.load_batch(
        [img_path] * 5, [lbl_path] * 5, (64, 64), num_threads=3)
    assert images.shape == (5, 64, 64, 3)
    assert labels.shape == (5, 64, 64)
    np.testing.assert_array_equal(sizes, np.tile([37, 53], (5, 1)))
    for i in range(1, 5):
        np.testing.assert_array_equal(images[0], images[i])
        np.testing.assert_array_equal(labels[0], labels[i])


def test_missing_file_raises():
    nl = NativeLoader.get()
    with pytest.raises(IOError):
        nl.decode_image("/nonexistent.jpg", (32, 32))


def test_batch_loader_native_matches_python(tmp_path, rng):
    """BatchLoader native fast path == pure-Python path on a pascal val tree."""
    from tests.test_data import _make_pascal_tree
    from zeroshotsemanticsegmentation_tpu.data import BatchLoader, PascalVOC
    data_dir, assets_dir = _make_pascal_tree(tmp_path, tmp_path / "assets")
    ds = PascalVOC("val", data_dir=data_dir, assets_dir=assets_dir)
    assert ds.native_label_kwargs() is not None
    nat = list(BatchLoader(ds, 2, bucket_hw=(48, 48), use_native=True))
    py = list(BatchLoader(ds, 2, bucket_hw=(48, 48), use_native=False))
    assert len(nat) == len(py)
    for a, b in zip(nat, py):
        assert a["ids"] == b["ids"]
        assert a["num_real"] == b["num_real"]
        np.testing.assert_array_equal(a["label"], b["label"])
        np.testing.assert_array_equal(a["sizes"], b["sizes"])
        np.testing.assert_allclose(a["image"], b["image"], atol=2.0)


def test_batch_loader_native_train_split_mat_labels(tmp_path, rng):
    """SBD .mat train labels decode natively (MAT5 parser) == Python path."""
    from tests.test_data import _make_pascal_tree
    from zeroshotsemanticsegmentation_tpu.data import BatchLoader, PascalVOC
    data_dir, assets_dir = _make_pascal_tree(tmp_path, tmp_path / "assets")
    ds = PascalVOC("train", data_dir=data_dir, assets_dir=assets_dir)
    nat = list(BatchLoader(ds, 2, bucket_hw=(48, 48), use_native=True))
    py = list(BatchLoader(ds, 2, bucket_hw=(48, 48), use_native=False))
    for a, b in zip(nat, py):
        assert a["ids"] == b["ids"]
        np.testing.assert_array_equal(a["label"], b["label"])
        np.testing.assert_array_equal(a["sizes"], b["sizes"])
        np.testing.assert_allclose(a["image"], b["image"], atol=2.0)


def test_decode_mat_label_matches_scipy(tmp_path, rng):
    """MAT5 GTcls decode vs scipy, compressed and uncompressed."""
    import scipy.io
    for comp in (False, True):
        lbl = rng.randint(0, 21, size=(37, 53)).astype(np.uint8)
        lbl[::9, ::9] = 255
        path = str(tmp_path / f"l{int(comp)}.mat")
        scipy.io.savemat(path, {"GTcls": {
            "Segmentation": lbl, "CategoriesPresent": np.unique(lbl)}},
            do_compression=comp)
        nl = NativeLoader.get()
        out, size = nl.decode_label(path, (64, 64), map255_to_ignore=True)
        want = lbl.astype(np.int32)
        want[want == 255] = -1
        np.testing.assert_array_equal(out[:37, :53], want)
        assert size == (37, 53)
        assert (out[37:] == -1).all()


def test_load_batch_compact_matches_float(fixtures):
    """zss_load_batch_compact: raw uint8 + int8 labels; transforming the
    uint8 batch on host reproduces the float batch exactly (same libjpeg
    decode), labels narrow losslessly, pads are zero / -1."""
    img_path, lbl_path, _ = fixtures
    nl = NativeLoader.get()
    imgs_f, lbls_f, sizes_f = nl.load_batch(
        [img_path] * 2, [lbl_path] * 2, (64, 64), num_threads=2)
    imgs_u8, lbls_i8, sizes_u8 = nl.load_batch(
        [img_path] * 2, [lbl_path] * 2, (64, 64), num_threads=2,
        compact=True)
    assert imgs_u8.dtype == np.uint8 and lbls_i8.dtype == np.int8
    np.testing.assert_array_equal(sizes_f, sizes_u8)
    np.testing.assert_array_equal(lbls_f, lbls_i8.astype(np.int32))
    for i in range(2):
        h, w = sizes_u8[i]
        want = transform_image(imgs_u8[i, :h, :w])
        np.testing.assert_allclose(imgs_f[i, :h, :w], want, atol=1e-4)
        assert (imgs_u8[i, h:] == 0).all() and (imgs_u8[i, :, w:] == 0).all()


def test_batch_loader_native_compact_roundtrip(tmp_path, rng):
    """BatchLoader(compact=True) keeps the native fast path and produces
    batches the jitted steps normalize back to the float-path values."""
    import jax.numpy as jnp
    from tests.test_data import _make_pascal_tree
    from zeroshotsemanticsegmentation_tpu.data import BatchLoader, PascalVOC
    from zeroshotsemanticsegmentation_tpu.train.steps import _prepare_batch
    data_dir, assets_dir = _make_pascal_tree(tmp_path, tmp_path / "assets")
    ds = PascalVOC("val", data_dir=data_dir, assets_dir=assets_dir)
    cb = list(BatchLoader(ds, 2, bucket_hw=(48, 48), use_native=True,
                          compact=True))
    fb = list(BatchLoader(ds, 2, bucket_hw=(48, 48), use_native=True))
    for a, b in zip(cb, fb):
        assert a["image"].dtype == np.uint8
        imgs, lbls = _prepare_batch(
            {k: jnp.asarray(v) for k, v in a.items() if k != "ids"})
        np.testing.assert_allclose(np.asarray(imgs), b["image"], atol=1e-4)
        np.testing.assert_array_equal(np.asarray(lbls), b["label"])


def test_corrupt_inputs_return_error_codes(tmp_path, fixtures):
    """Hostile/corrupt files must surface as IOError (negative rc), never as
    a C++ exception crossing the ctypes boundary (std::terminate) or a
    libpng longjmp leak — regression for the guarded entry points."""
    nl = NativeLoader.get()
    # truncated PNG (valid magic, garbage body)
    bad_png = tmp_path / "bad.png"
    bad_png.write_bytes(b"\x89PNG\r\n\x1a\n" + b"\x00" * 40)
    with pytest.raises(IOError):
        nl.decode_label(str(bad_png), (64, 64))
    # MAT5 header claiming exabyte dims: the bounded parser rejects it
    bad_mat = tmp_path / "bad.mat"
    header = b"MATLAB 5.0 MAT-file" + b" " * (124 - 19) + b"\x00\x01" + b"IM"
    body = b"\xff" * 64  # garbage elements
    bad_mat.write_bytes(header + body)
    with pytest.raises(IOError):
        nl.decode_label(str(bad_mat), (64, 64))
    # truncated JPEG
    img_path, _, _ = fixtures
    data = open(img_path, "rb").read()
    bad_jpg = tmp_path / "bad.jpg"
    bad_jpg.write_bytes(data[: len(data) // 4])
    # libjpeg may recover a partial image or fail — either way, no crash
    try:
        nl.decode_image(str(bad_jpg), (64, 64))
    except IOError:
        pass
    # batch with one bad file: error code propagates, process survives
    with pytest.raises(IOError):
        nl.load_batch([img_path], [str(bad_png)], (64, 64))


def test_load_batch_label_length_mismatch(fixtures):
    """A short label_paths list must raise, not silently NULL-pad (which the
    C worker treats as 'no label' -> all-ignore samples)."""
    img_path, lbl_path, _ = fixtures
    nl = NativeLoader.get()
    with pytest.raises(ValueError, match="label_paths"):
        nl.load_batch([img_path, img_path], [lbl_path], (64, 64))
