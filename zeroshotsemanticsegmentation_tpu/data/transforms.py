"""Image/label transforms and static-shape bucketing.

Reference transform (pascal_dataset.py:39,138-154): RGB→BGR, subtract the
caffe BGR mean, CHW float. This framework keeps HWC (TPU convs are NHWC) and
adds `pad_to_bucket`: XLA requires static shapes, so variable-size images are
zero-padded (post-mean-subtraction, i.e. value 0 ≡ conv zero-padding) to a
fixed bucket, with labels padded by -1 (ignore). Because every loss/metric is
masked on label >= 0, padding is semantics-neutral (see ops.losses docstring)
— this is the TPU-native replacement for the reference's batch_size=1
variable-shape training.
"""

from __future__ import annotations

import numpy as np

# reference pascal_dataset.py:39 / context_dataset.py:51
MEAN_BGR = np.array([104.00698793, 116.66876762, 122.67891434])

PAD_LABEL = -1

# VOC/SBD/Context images are at most 500px on a side; one 512 bucket covers
# everything while keeping h5 = 23 -> fc6 output 17 (multiple-of-32 friendly).
DEFAULT_BUCKET = (512, 512)


def transform_image(img_rgb: np.ndarray) -> np.ndarray:
    """uint8 RGB HWC -> float32 BGR mean-subtracted HWC."""
    img = img_rgb[:, :, ::-1].astype(np.float64)
    img -= MEAN_BGR
    return img.astype(np.float32)


def prepare_images(images):
    """Device-side image normalization for the compact feed.

    uint8 RGB (B,H,W,3) -> float32 BGR mean-subtracted, inside the jitted
    step. Shipping uint8 + normalizing on device cuts host->HBM bytes 4x vs
    the host-side float32 transform (the reference transforms on host,
    pascal_dataset.py:138-145); float32 input passes through unchanged so
    both feeds share every step. Matches `transform_image` to float32
    precision (uint8 - mean is exact in float32).
    """
    import jax.numpy as jnp
    if images.dtype == jnp.uint8:
        mean = jnp.asarray(MEAN_BGR, jnp.float32)
        return images[..., ::-1].astype(jnp.float32) - mean
    return images


def batch_image_rgb(image_hwc: np.ndarray) -> np.ndarray:
    """Host-side: one batch image (either feed dtype) -> uint8 RGB for viz."""
    img = np.asarray(image_hwc)
    if img.dtype == np.uint8:
        return img
    return untransform_image(img)


def untransform_image(img_bgr: np.ndarray) -> np.ndarray:
    """float32 BGR mean-subtracted HWC -> uint8 RGB HWC (for visualization)."""
    img = img_bgr.astype(np.float64) + MEAN_BGR
    # rint: the float32 image representation is ~1e-5 off integer values
    img = np.clip(np.rint(img), 0, 255).astype(np.uint8)
    return img[:, :, ::-1]


def pad_to_bucket(img: np.ndarray, lbl: np.ndarray,
                  bucket_hw: tuple[int, int] = DEFAULT_BUCKET
                  ) -> tuple[np.ndarray, np.ndarray]:
    """Zero-pad image / (-1)-pad label to (bucket_h, bucket_w), top-left anchored."""
    bh, bw = bucket_hw
    h, w = lbl.shape
    if h > bh or w > bw:
        raise ValueError(f"image ({h},{w}) exceeds bucket ({bh},{bw})")
    pimg = np.zeros((bh, bw, img.shape[2]), dtype=img.dtype)
    pimg[:h, :w] = img
    plbl = np.full((bh, bw), PAD_LABEL, dtype=lbl.dtype)
    plbl[:h, :w] = lbl
    return pimg, plbl
