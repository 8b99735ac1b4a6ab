"""Confusion-matrix metrics vs an independent numpy oracle."""

import numpy as np
import jax.numpy as jnp

from zeroshotsemanticsegmentation_tpu.ops import (
    confusion_matrix, zeroshot_hists, hist_to_metrics)
from zeroshotsemanticsegmentation_tpu.ops.metrics import unseen_mask_vector


def oracle_hist(lt, lp, n, restrict=None):
    mask = (lt >= 0) & (lt < n)
    if restrict is not None:
        mask &= np.isin(lt, restrict)
    h = np.zeros((n, n), np.int64)
    for t, p in zip(lt[mask], lp[mask]):
        h[t, p] += 1
    return h


def test_confusion_matrix_matches_oracle(rng):
    n = 7
    lt = rng.randint(-1, n + 2, size=(3, 8, 9)).astype(np.int32)
    lp = rng.randint(0, n, size=(3, 8, 9)).astype(np.int32)
    got = np.asarray(confusion_matrix(jnp.asarray(lt), jnp.asarray(lp), n))
    want = oracle_hist(lt.ravel(), lp.ravel(), n)
    np.testing.assert_array_equal(got, want)


def test_zeroshot_hists_split(rng):
    n, unseen = 6, [1, 4]
    lt = rng.randint(-1, n, size=(2, 10, 10)).astype(np.int32)
    lp = rng.randint(0, n, size=(2, 10, 10)).astype(np.int32)
    mask = jnp.asarray(unseen_mask_vector(n, unseen))
    hs = np.asarray(zeroshot_hists(jnp.asarray(lt), jnp.asarray(lp), n, mask))
    seen = [x for x in range(n) if x not in unseen]
    np.testing.assert_array_equal(hs[0], oracle_hist(lt.ravel(), lp.ravel(), n))
    np.testing.assert_array_equal(hs[1], oracle_hist(lt.ravel(), lp.ravel(), n, seen))
    np.testing.assert_array_equal(hs[2], oracle_hist(lt.ravel(), lp.ravel(), n, unseen))
    # seen + unseen partitions the valid pixels
    np.testing.assert_array_equal(hs[1] + hs[2], hs[0])


def test_hist_to_metrics_perfect_prediction():
    h = np.diag([5, 3, 2])
    acc, acc_cls, miou, fw = hist_to_metrics(h)
    assert acc == 1.0 and acc_cls == 1.0 and miou == 1.0 and fw == 1.0


def test_hist_to_metrics_known_values():
    # 2 classes: true 0 predicted as [3 correct, 1 as cls1]; true 1: [2, 2]
    h = np.array([[3, 1], [2, 2]])
    acc, acc_cls, miou, fw = hist_to_metrics(h)
    np.testing.assert_allclose(acc, 5 / 8)
    np.testing.assert_allclose(acc_cls, (3 / 4 + 2 / 4) / 2)
    iou0, iou1 = 3 / (4 + 5 - 3), 2 / (4 + 3 - 2)
    np.testing.assert_allclose(miou, (iou0 + iou1) / 2)
    np.testing.assert_allclose(fw, 0.5 * iou0 + 0.5 * iou1)


def test_hist_to_metrics_empty_class_nanmean():
    # class 2 never appears as true nor predicted: dropped by nanmean
    h = np.array([[3, 1, 0], [2, 2, 0], [0, 0, 0]])
    _, acc_cls, miou, _ = hist_to_metrics(h)
    np.testing.assert_allclose(acc_cls, (3 / 4 + 2 / 4) / 2)
    iou0, iou1 = 3 / 6, 2 / 5
    np.testing.assert_allclose(miou, (iou0 + iou1) / 2)
