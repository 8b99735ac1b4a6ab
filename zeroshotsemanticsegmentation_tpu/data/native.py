"""ctypes binding for the native data-path runtime (native/zss_loader.cc).

The C++ library fuses JPEG/PNG decode, the BGR mean-subtraction transform,
label remapping, and pad-to-bucket assembly, writing batches directly into
the final float32/int32 buffers on a pthread pool (no GIL). This binding
exposes it with a graceful fallback: `NativeLoader.available()` is False when
the shared library hasn't been built (``make -C native``), and callers keep
the pure-Python path.

All three label formats are handled natively: PNG (VOC val,
PASCAL-Context) and SBD ``.mat`` training labels via the built-in MAT5
parser (native/zss_loader.cc:129-333); the Python scipy path remains as the
fallback when the library isn't built.
"""

from __future__ import annotations

import ctypes
import os.path as osp

import numpy as np

_LIB_PATH = osp.join(osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))),
                     "native", "libzss_loader.so")


class NativeLoader:
    _instance = None

    def __init__(self, lib_path: str | None = None):
        path = lib_path or _LIB_PATH
        self._lib = ctypes.CDLL(path)
        self._lib.zss_decode_image.restype = ctypes.c_int
        self._lib.zss_decode_image.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
        self._lib.zss_decode_label.restype = ctypes.c_int
        self._lib.zss_decode_label.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int)]
        self._lib.zss_load_batch.restype = ctypes.c_int
        self._lib.zss_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int]
        # compact feed: older .so builds lack it — probe and degrade
        try:
            self._lib.zss_load_batch_compact.restype = ctypes.c_int
            self._lib.zss_load_batch_compact.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int8), ctypes.POINTER(ctypes.c_int),
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int]
            self._has_compact = True
        except AttributeError:
            self._has_compact = False

    @classmethod
    def get(cls) -> "NativeLoader | None":
        if cls._instance is None:
            try:
                cls._instance = cls()
            except OSError:
                cls._instance = False
        return cls._instance or None

    @classmethod
    def available(cls) -> bool:
        return cls.get() is not None

    # ------------------------------------------------------------------

    def decode_image(self, path: str, bucket_hw: tuple[int, int]
                     ) -> tuple[np.ndarray, tuple[int, int]]:
        bh, bw = bucket_hw
        out = np.empty((bh, bw, 3), np.float32)
        size = (ctypes.c_int * 2)()
        rc = self._lib.zss_decode_image(
            path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            bh, bw, size)
        if rc != 0:
            raise IOError(f"zss_decode_image({path!r}) failed rc={rc}")
        return out, (size[0], size[1])

    def decode_label(self, path: str, bucket_hw: tuple[int, int], *,
                     value_offset: int = 0, map255_to_ignore: bool = True
                     ) -> tuple[np.ndarray, tuple[int, int]]:
        bh, bw = bucket_hw
        out = np.empty((bh, bw), np.int32)
        size = (ctypes.c_int * 2)()
        rc = self._lib.zss_decode_label(
            path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            bh, bw, value_offset, int(map255_to_ignore), size)
        if rc != 0:
            raise IOError(f"zss_decode_label({path!r}) failed rc={rc}")
        return out, (size[0], size[1])

    def load_batch(self, image_paths: list[str], label_paths: list[str],
                   bucket_hw: tuple[int, int], *, value_offset: int = 0,
                   map255_to_ignore: bool = True, num_threads: int = 4,
                   compact: bool = False
                   ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """compact=True: uint8 RGB images + int8 labels (device-side
        normalization, 4x fewer feed bytes)."""
        n = len(image_paths)
        if len(label_paths) != n:
            # a shorter list would silently pad the ctypes array with NULLs,
            # which the C worker treats as "no label" → all-ignore samples
            raise ValueError(f"label_paths has {len(label_paths)} entries "
                             f"for {n} images")
        bh, bw = bucket_hw
        sizes = np.zeros((n, 2), np.int32)
        img_arr = (ctypes.c_char_p * n)(*[p.encode() for p in image_paths])
        lbl_arr = (ctypes.c_char_p * n)(
            *[p.encode() if p else None for p in label_paths])
        if compact:
            if not self._has_compact:
                raise RuntimeError("libzss_loader.so predates compact "
                                   "batches; rebuild with `make -C native`")
            images = np.zeros((n, bh, bw, 3), np.uint8)
            labels = np.full((n, bh, bw), -1, np.int8)
            rc = self._lib.zss_load_batch_compact(
                img_arr, lbl_arr, n,
                images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
                sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
                bh, bw, value_offset, int(map255_to_ignore), num_threads)
        else:
            images = np.zeros((n, bh, bw, 3), np.float32)
            labels = np.full((n, bh, bw), -1, np.int32)
            rc = self._lib.zss_load_batch(
                img_arr, lbl_arr, n,
                images.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
                bh, bw, value_offset, int(map255_to_ignore), num_threads)
        if rc != 0:
            raise IOError(f"zss_load_batch failed rc={rc}")
        return images, labels, sizes
