from zeroshotsemanticsegmentation_tpu.viz.segmentation import (
    label2rgb, get_tile_image, visualize_segmentation, visualize_seenmask,
    make_seen_mask, save_image)

__all__ = ["label2rgb", "get_tile_image", "visualize_segmentation",
           "visualize_seenmask", "make_seen_mask", "save_image"]
