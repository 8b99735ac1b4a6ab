"""Batch SZN inference CLI: images in, per-pixel label maps out.

A deployment-facing surface the reference lacks (its only inference route is
`train.py -m test_all` over a named dataset split — train.py:159-200): point
this at a trained checkpoint (this framework's orbax run dir OR the
reference's own torch.save file, via models/ref_import.py) and a directory of
images, get label PNGs (pixel value = class id; 255 where padding would be —
never present in practice since outputs are cropped to each input's size) and
optional color overlays.

    python -m zeroshotsemanticsegmentation_tpu.cli.predict \
        --checkpoint <run dir>/best --images <dir> --out <dir> \
        -c 15 [--viz] [--batch_size 8]

The preset (-c) supplies the dataset/embedding/unseen-split configuration,
exactly as in training; the checkpoint's `upscore_trained` metadata routes
the fused-gate shortcut correctly for stage-2-trained models.
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys

import numpy as np


_IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp")


class _StdoutLogger:
    """Minimal logger protocol for _merge_params' partial-load report."""

    def stdout(self, msg: str) -> None:
        print(msg)


def _list_images(path: str) -> list[str]:
    if osp.isfile(path):
        return [path]
    files = [osp.join(path, f) for f in sorted(os.listdir(path))
             if f.lower().endswith(_IMG_EXTS)]
    if not files:
        raise FileNotFoundError(f"no images under {path}")
    return files


def _pad_to(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """Bottom/right zero-pad to the static bucket (conv zero-padding keeps
    interior activations identical; the prediction is cropped back)."""
    out = np.zeros((h, w, 3), img.dtype)
    out[:img.shape[0], :img.shape[1]] = img
    return out


def build_predictor(cfg, checkpoint_path: str, *, int8: bool = False):
    """(predict_fn, class_names, upscore_trained) from a config + checkpoint
    (orbax dir or reference torch file)."""
    import jax
    import jax.numpy as jnp

    from zeroshotsemanticsegmentation_tpu.data.assets import (
        class_names as get_class_names, load_class_embeddings)
    from zeroshotsemanticsegmentation_tpu.models import FCN32s, FCN8s
    from zeroshotsemanticsegmentation_tpu.models.ref_import import (
        is_reference_checkpoint, load_reference_checkpoint)
    from zeroshotsemanticsegmentation_tpu.serving import make_szn_predictor
    from zeroshotsemanticsegmentation_tpu.train import checkpoint as ckpt

    model_cls = FCN8s if cfg.arch == "fcn8s" else FCN32s
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    model = model_cls(num_classes=cfg.head_channels, dtype=dtype,
                      channel_scale=cfg.channel_scale,
                      prune_pad=cfg.prune_pad,
                      fused_block1=cfg.fused_block1 == "on" or (
                          cfg.fused_block1 == "auto"
                          and jax.default_backend() == "tpu"))
    params = jax.jit(lambda: model.init(
        jax.random.PRNGKey(cfg.seed),
        jnp.zeros((1, cfg.bucket[0], cfg.bucket[1], 3), jnp.float32),
        mode="both"))()["params"]
    params = jax.tree.map(np.asarray, params)  # host: mergeable + sniffable

    if is_reference_checkpoint(checkpoint_path):
        restored = load_reference_checkpoint(checkpoint_path, params)
    else:
        restored = ckpt.restore_checkpoint(checkpoint_path)
    # strict=False merge with shape checks + skip report (a checkpoint from
    # a different embed_dim/arch must fail loudly here, not as an XLA shape
    # error mid-trace); host leaves so trained-ness stays inspectable
    from zeroshotsemanticsegmentation_tpu.cli.train import _merge_params
    merged = _merge_params(params, restored["params"],
                           logger=_StdoutLogger(), to_device=False)
    upscore_trained = restored.get("upscore_trained")
    if upscore_trained is None:  # legacy checkpoint without the metadata:
        # resolve from host values so the printed flag matches the route
        # the predictor actually takes
        from zeroshotsemanticsegmentation_tpu.serving import (
            upscore_trained_numeric)
        upscore_trained = upscore_trained_numeric(merged)

    embeddings = load_class_embeddings(cfg.dataset, cfg.embed_dim,
                                       n_classes=cfg.num_classes)
    predict = make_szn_predictor(
        model, merged, embeddings, list(cfg.val_unseen), int8=int8,
        upscore_trained=upscore_trained)
    return predict, get_class_names(cfg.dataset, cfg.num_classes), \
        bool(upscore_trained)


def run_predict(cfg, *, checkpoint: str, images: str, out_dir: str,
                batch_size: int = 8, viz: bool = False,
                int8: bool = False, verbose: bool = True) -> list[str]:
    """Predict label maps for every image; returns the written paths."""
    import jax.numpy as jnp
    import PIL.Image

    from zeroshotsemanticsegmentation_tpu.viz import label2rgb

    predict, names, trained = build_predictor(cfg, checkpoint, int8=int8)
    if verbose:
        print(f"predictor ready ({len(names)} classes, "
              f"upscore_trained={trained})")
    files = _list_images(images)
    os.makedirs(out_dir, exist_ok=True)
    bh, bw = cfg.bucket
    written = []
    for i in range(0, len(files), batch_size):
        chunk = files[i:i + batch_size]
        imgs, sizes = [], []
        for f in chunk:
            a = np.asarray(PIL.Image.open(f).convert("RGB"), np.uint8)
            if a.shape[0] > bh or a.shape[1] > bw:
                raise ValueError(
                    f"{f}: {a.shape[:2]} exceeds the bucket {(bh, bw)} — "
                    "raise it with --bucket")
            sizes.append(a.shape[:2])
            imgs.append(_pad_to(a, bh, bw))
        # static batch shape: pad the tail chunk so one program serves all
        while len(imgs) < batch_size:
            imgs.append(np.zeros((bh, bw, 3), np.uint8))
        # uint8 feed: the predictor normalizes on device (compact feed)
        lbl = np.asarray(predict(jnp.asarray(np.stack(imgs))))
        for f, (h, w), lb in zip(chunk, sizes, lbl):
            stem = osp.splitext(osp.basename(f))[0]
            pred = lb[:h, :w].astype(np.uint8)
            p = osp.join(out_dir, f"{stem}_pred.png")
            PIL.Image.fromarray(pred, mode="L").save(p)
            written.append(p)
            if viz:
                img = np.asarray(PIL.Image.open(f).convert("RGB"), np.uint8)
                ov = label2rgb(pred.astype(np.int32), img,
                               n_labels=len(names))
                pv = osp.join(out_dir, f"{stem}_viz.png")
                PIL.Image.fromarray(ov.astype(np.uint8)).save(pv)
                written.append(pv)
        if verbose:
            print(f"  {min(i + batch_size, len(files))}/{len(files)}")
    return written


def main(argv=None):
    from zeroshotsemanticsegmentation_tpu.configs import get_config

    p = argparse.ArgumentParser(
        description="Batch SZN inference: images -> label PNGs")
    p.add_argument("-c", "--config", type=int, default=15,
                   help="preset supplying dataset/embeddings/unseen split")
    p.add_argument("--checkpoint", required=True,
                   help="orbax run dir (…/best) or reference torch file")
    p.add_argument("--images", required=True, help="image file or directory")
    p.add_argument("--out", required=True, help="output directory")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--bucket", type=int, default=None,
                   help="static HxW bucket (default: preset's)")
    p.add_argument("--context_classes", type=int, choices=[33, 59])
    p.add_argument("--arch", type=str, choices=["fcn32s", "fcn8s"],
                   help="model architecture (default: preset's; must match "
                        "the checkpoint)")
    p.add_argument("--viz", action="store_true",
                   help="also write color overlays")
    p.add_argument("--int8", action="store_true",
                   help="opt-in int8 quantized serving path")
    args = p.parse_args(argv)

    overrides = {"load_fcn_path": args.checkpoint}
    if args.bucket is not None:
        overrides["bucket"] = (args.bucket, args.bucket)
    if args.context_classes is not None:
        overrides["context_classes"] = args.context_classes
    if args.arch is not None:
        overrides["arch"] = args.arch
    cfg = get_config(args.config, **overrides)
    written = run_predict(cfg, checkpoint=args.checkpoint, images=args.images,
                          out_dir=args.out, batch_size=args.batch_size,
                          viz=args.viz, int8=args.int8)
    print(f"wrote {len(written)} files to {args.out}")


if __name__ == "__main__":
    sys.exit(main())
