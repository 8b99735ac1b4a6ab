"""Streaming confusion-matrix metrics with seen/unseen breakdown.

Reference semantics (utils.py:104-154): a per-image histogram over pixels with
0 <= label_true < n_class, optionally restricted to pixels whose *true* label
is in the seen / unseen class set, accumulated across the epoch, then reduced
to (pixel acc, mean class acc, mean IoU, freq-weighted IoU) with NaN-ignoring
means.

TPU-first design: the histogram is a jnp scatter-add that runs on device
inside the jitted eval step (the reference round-trips every image to host
numpy, utils.py:116-118); device hists are summed with psum across the mesh
and only the final (n_class, n_class) arrays reach the host, where
`hist_to_metrics` derives the four metrics.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def confusion_matrix(label_true: jnp.ndarray, label_pred: jnp.ndarray,
                     num_classes: int,
                     sample_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """(num_classes, num_classes) int32 hist; rows = true, cols = pred.

    Pixels with label_true outside [0, num_classes) are ignored, matching
    reference _fast_hist (utils.py:104-119). `sample_mask` optionally
    restricts further (e.g., to seen-class pixels).
    """
    valid = (label_true >= 0) & (label_true < num_classes)
    if sample_mask is not None:
        valid = valid & sample_mask
    lt = jnp.where(valid, label_true, 0)
    lp = jnp.where(valid, label_pred, 0)
    idx = (lt * num_classes + lp).ravel()
    hist = jnp.zeros((num_classes * num_classes,), jnp.int32)
    hist = hist.at[idx].add(valid.ravel().astype(jnp.int32))
    return hist.reshape(num_classes, num_classes)


def zeroshot_hists(label_true: jnp.ndarray, label_pred: jnp.ndarray,
                   num_classes: int,
                   unseen_class_mask: jnp.ndarray) -> jnp.ndarray:
    """(3, n, n) hists: [all, seen-only, unseen-only] by *true* label membership.

    unseen_class_mask: (num_classes,) bool, True for unseen classes
    (reference _fast_hist target='seen'/'unseen', utils.py:107-114).
    """
    lt_safe = jnp.clip(label_true, 0, num_classes - 1)
    pix_unseen = unseen_class_mask[lt_safe]
    h_all = confusion_matrix(label_true, label_pred, num_classes)
    h_seen = confusion_matrix(label_true, label_pred, num_classes,
                              sample_mask=~pix_unseen)
    h_unseen = confusion_matrix(label_true, label_pred, num_classes,
                                sample_mask=pix_unseen)
    return jnp.stack([h_all, h_seen, h_unseen])


def hist_to_metrics(hist) -> tuple[float, float, float, float]:
    """(pixel acc, mean class acc, mean IoU, fwavacc) — host-side numpy.

    NaN-propagation matches reference _hist_to_metrics (utils.py:121-129):
    empty classes contribute NaN and are dropped by nanmean; an all-empty
    hist yields NaNs.
    """
    hist = np.asarray(hist, dtype=np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        acc = np.diag(hist).sum() / hist.sum()
        acc_cls = np.nanmean(np.diag(hist) / hist.sum(axis=1))
        iu = np.diag(hist) / (hist.sum(axis=1) + hist.sum(axis=0) - np.diag(hist))
        mean_iu = np.nanmean(iu)
        freq = hist.sum(axis=1) / hist.sum()
        fwavacc = (freq[freq > 0] * iu[freq > 0]).sum()
    return float(acc), float(acc_cls), float(mean_iu), float(fwavacc)


def unseen_mask_vector(num_classes: int, unseen: list[int] | tuple[int, ...]) -> np.ndarray:
    """(num_classes,) bool vector with True at unseen class ids."""
    v = np.zeros((num_classes,), dtype=bool)
    if unseen:
        v[np.asarray(list(unseen), dtype=np.int64)] = True
    return v
