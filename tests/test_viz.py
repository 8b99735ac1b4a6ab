"""Visualization: colormap, tiles, segmentation/seenmask layouts."""

import numpy as np

from zeroshotsemanticsegmentation_tpu.viz import (
    get_tile_image, label2rgb, make_seen_mask, visualize_seenmask,
    visualize_segmentation)
from zeroshotsemanticsegmentation_tpu.viz.segmentation import (
    UNLABELED_RGB, voc_colormap)


def test_voc_colormap_known_values():
    cmap = voc_colormap(21)
    np.testing.assert_array_equal(cmap[0], [0, 0, 0])          # background
    np.testing.assert_array_equal(cmap[1], [128, 0, 0])        # aeroplane
    np.testing.assert_array_equal(cmap[15], [192, 128, 128])   # person
    assert len(np.unique(cmap.view([("", cmap.dtype)] * 3))) == 21


def test_label2rgb_and_unlabeled(rng):
    lbl = rng.randint(-1, 5, size=(10, 12)).astype(np.int32)
    rgb = label2rgb(lbl, n_labels=5)
    assert rgb.shape == (10, 12, 3) and rgb.dtype == np.uint8
    assert (rgb[lbl == -1] == UNLABELED_RGB).all()
    img = rng.randint(0, 255, (10, 12, 3)).astype(np.uint8)
    overlay = label2rgb(lbl, img, n_labels=5)
    assert overlay.shape == (10, 12, 3)


def test_make_seen_mask():
    lbl = np.array([[0, 1], [2, 3]], np.int32)
    m = make_seen_mask(lbl, unseen=[1, 3], n_class=4)
    assert m.shape == (2, 2, 3)
    np.testing.assert_array_equal(m[:, :, 0], [[255, 0], [255, 0]])


def test_tile_grid(rng):
    imgs = [rng.randint(0, 255, (8, 10, 3)).astype(np.uint8) for _ in range(5)]
    tile = get_tile_image(imgs)
    assert tile.ndim == 3 and tile.shape[2] == 3
    tile2 = get_tile_image(imgs, (1, 5))
    assert tile2.shape[0] == 8


def test_visualize_layouts(rng):
    img = rng.randint(0, 255, (16, 20, 3)).astype(np.uint8)
    lt = rng.randint(-1, 21, (16, 20)).astype(np.int32)
    lp = rng.randint(0, 21, (16, 20)).astype(np.int32)
    # zero-shot: 2 rows x 4 cols (img, labels, overlay, seenmask)
    viz = visualize_segmentation(lbl_pred=lp, lbl_true=lt, img=img,
                                 n_class=21, unseen=[1, 13])
    assert viz.shape[0] > 2 * 16 and viz.shape[1] > 4 * 20
    # plain: 2 x 3
    viz2 = visualize_segmentation(lbl_pred=lp, lbl_true=lt, img=img,
                                  n_class=21, unseen=None)
    assert viz2.shape[1] < viz.shape[1]
    sm = visualize_seenmask(lbl_pred=(lp > 10).astype(np.int32),
                            lbl_true=(lt > 10).astype(np.int32),
                            img=img, n_class=2)
    assert sm.shape[0] >= 16 and sm.shape[1] > 3 * 20
