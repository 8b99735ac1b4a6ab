"""Experiment driver: config → data → model → two-stage training / testing.

CLI-compatible with the reference entry point (train.py:16-200):
``python -m zeroshotsemanticsegmentation_tpu.cli.train -c 14`` runs the
8/2/10 PASCAL zero-shot SZN pipeline end to end (FCN stage, then seenmask
stage, checkpoints, CSV/TB logs). TPU-native flags add batching, dtype, mesh
axes, and a --synthetic mode for air-gapped smoke runs.
"""

from __future__ import annotations

import argparse
import dataclasses
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np

from zeroshotsemanticsegmentation_tpu.configs import (
    PRESETS, get_config, run_name)
from zeroshotsemanticsegmentation_tpu.data import (
    BatchLoader, PascalContext, PascalVOC, SyntheticDataset,
    load_class_embeddings)
from zeroshotsemanticsegmentation_tpu.models import (
    FCN32s, FCN8s, load_vgg16_into_params)
from zeroshotsemanticsegmentation_tpu.train import (
    FCNTrainer, SeenmaskTrainer, make_fcn_optimizer, make_seenmask_optimizer)
from zeroshotsemanticsegmentation_tpu.train import checkpoint as ckpt
from zeroshotsemanticsegmentation_tpu.utils import RunLogger


def _ensure_datasets(cfg, data_dir, logger) -> None:
    """Reference parity: the driver fetches missing dataset archives at
    startup (train.py:71 calls download(data_dir)). Idempotent — archives
    already present (or pre-provisioned air-gapped) are skipped; a failed
    fetch (zero-egress environments) logs and continues so the dataset
    constructor raises its usual actionable error."""
    from zeroshotsemanticsegmentation_tpu.data.download import (
        download_context, download_pascal)
    fetch = download_pascal if cfg.dataset == "pascal" else download_context
    try:
        fetch(data_dir)
    except Exception as e:
        logger.stdout(f"WARNING: dataset auto-download failed ({e!r}); "
                      "expecting pre-provisioned data under "
                      f"{osp.join(data_dir, cfg.dataset)} "
                      "(see scripts/egress_runbook.py)")


def _build_datasets(cfg, *, data_dir, synthetic):
    if synthetic:
        hi = min(cfg.bucket)
        mk = lambda n, seed: SyntheticDataset(  # noqa: E731
            num_images=n, num_classes=cfg.num_classes,
            size_range=(min(64, hi), hi), seed=seed)
        return mk(8, 0), mk(6, 1), mk(4, 2)
    cls = PascalVOC if cfg.dataset == "pascal" else PascalContext
    kw = dict(data_dir=data_dir, val_unseen=list(cfg.val_unseen))
    if cfg.dataset == "context":
        kw["n_classes"] = cfg.context_classes
    train = cls("train", **kw)
    train_seen = cls("train_seen", train_unseen=list(cfg.train_unseen), **kw)
    val = cls("val", **kw)
    return train, train_seen, val


def run_experiment(cfg, *, preset: int = 0, name: str | None = None,
                   data_dir: str = "data", tb_dir: str | None = None,
                   log_dir: str | None = None, synthetic: bool = False,
                   vgg16_path: str | None = None, resume: str = "",
                   mesh=None, verbose: bool = True) -> dict:
    """Build and run one experiment; returns summary dict.

    Mirrors reference main() wiring: FCN trains on the *train_seen* loader,
    the seenmask stage on the *train* loader (train.py:144,185 — the
    asymmetry is the method); test modes only validate.
    """
    try:  # persistent XLA compilation cache: big graphs recompile in ~1s
        jax.config.update("jax_compilation_cache_dir",
                          osp.expanduser("~/.cache/zss_jax_cache"))
    except Exception:
        pass
    log_dir = log_dir or osp.join(data_dir, "logs",
                                  run_name(preset, cfg, name=name))
    logger = RunLogger(log_dir, tb_dir=tb_dir, verbose=verbose)
    logger.dump_config(dataclasses.asdict(cfg))

    # 1. data
    if not synthetic:
        _ensure_datasets(cfg, data_dir, logger)
    train_ds, train_seen_ds, val_ds = _build_datasets(
        cfg, data_dir=data_dir, synthetic=synthetic)
    mk_loader = lambda ds, bs, sh: BatchLoader(  # noqa: E731
        ds, bs, bucket_hw=tuple(cfg.bucket), shuffle=sh, seed=cfg.seed,
        compact=getattr(cfg, "compact_feed", False))
    train_loader = mk_loader(train_ds, cfg.batch_size, True)
    train_seen_loader = mk_loader(train_seen_ds, cfg.batch_size, True)
    val_loader = mk_loader(val_ds, cfg.eval_batch_size, False)

    counts = [str(len(train_seen_ds)), str(len(train_ds) - len(train_seen_ds)),
              str(len(val_ds))]
    logger.csv_append("counts.csv", ["train_seen", "train_unseen", "val"],
                      counts)
    for tag, v in zip(["num/train_seen", "num/train_unseen", "num/val"],
                      counts):
        logger.text(tag, v)

    # 2. embeddings (NNE always uses the word2vec matrix; regression targets
    # use one-hot when cfg.one_hot_embed — reference trainer_fcn.py:49)
    embeddings = target_embeddings = None
    if cfg.embed_dim:
        if synthetic:
            r = np.random.RandomState(0).randn(
                cfg.num_classes, cfg.embed_dim).astype(np.float32)
            embeddings = r / np.linalg.norm(r, axis=1, keepdims=True)
        else:
            embeddings = load_class_embeddings(cfg.dataset, cfg.embed_dim,
                                               n_classes=cfg.num_classes)
        target_embeddings = embeddings
        if cfg.one_hot_embed:
            target_embeddings = (np.eye(cfg.num_classes, dtype=np.float32)
                                 if synthetic else
                                 load_class_embeddings(
                                     cfg.dataset, cfg.embed_dim,
                                     one_hot=True,
                                     n_classes=cfg.num_classes))

    # 3. model + init
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    model_cls = FCN8s if cfg.arch == "fcn8s" else FCN32s
    # "auto" gates on single-chip TPU: GSPMD can't partition the pallas_call
    # inside the model body (the eval/serving kernel is shard_mapped
    # explicitly, but block 1 runs under pjit) — mesh runs keep XLA block 1
    fb1 = cfg.fused_block1 == "on" or (cfg.fused_block1 == "auto"
                                       and jax.default_backend() == "tpu"
                                       and mesh is None)
    model = model_cls(num_classes=cfg.head_channels, dtype=dtype,
                      channel_scale=cfg.channel_scale, remat=cfg.remat,
                      prune_pad=cfg.prune_pad, fused_block1=fb1)
    sample = jnp.zeros((1, cfg.bucket[0], cfg.bucket[1], 3), jnp.float32)
    params = jax.jit(
        lambda: model.init(jax.random.PRNGKey(cfg.seed), sample,
                           mode="both"))()["params"]

    start_epoch = start_iteration = 0
    best_mean_iu = 0.0
    # STRUCTURAL `seenmask_upscore` trained-ness (reference stage 2 trains it,
    # train.py:304-307): read from checkpoint metadata when present; None
    # (fresh init / legacy checkpoint) lets the trainer fall back to numeric
    # host-leaf sniffing. Threads to FCNTrainer -> fused-eval gate routing.
    upscore_trained = None
    load_path = resume or cfg.load_fcn_path
    checkpoint = None
    ckpt_path = None
    if load_path:
        from zeroshotsemanticsegmentation_tpu.models.ref_import import (
            is_reference_checkpoint, load_reference_checkpoint)
        ckpt_path = load_path if (ckpt.checkpoint_exists(load_path)
                                  or is_reference_checkpoint(load_path)) else \
            osp.join(data_dir, "logs", load_path, "best")
        if is_reference_checkpoint(ckpt_path):
            # a reference torch.save FILE (orbax checkpoints are dirs):
            # import the model weights with layout surgery; torch optimizer
            # state is not convertible (models/ref_import.py docstring)
            checkpoint = load_reference_checkpoint(ckpt_path, params)
            params = checkpoint["params"]
            logger.stdout(
                f"imported reference torch checkpoint {ckpt_path} "
                f"(epoch {checkpoint['epoch']}, upscore_trained="
                f"{checkpoint['upscore_trained']}; optimizer state "
                "reinitialized)")
            if checkpoint["skipped_keys"]:
                logger.stdout("  skipped unknown checkpoint keys: "
                              + ", ".join(checkpoint["skipped_keys"]))
        else:
            checkpoint = ckpt.restore_checkpoint(ckpt_path)
            params = _merge_params(params, checkpoint["params"], logger)
        upscore_trained = checkpoint.get("upscore_trained")
        # checkpoint['epoch'] is the last *completed* epoch; training resumes
        # after it (the reference re-runs every epoch on resume — train.py:295
        # ignores the restored counter — which we treat as a bug, not parity)
        start_epoch = int(checkpoint["epoch"]) + 1
        start_iteration = int(checkpoint["iteration"])
        best_mean_iu = float(checkpoint["best_mean_iu"])
    elif vgg16_path:
        params = load_vgg16_into_params(params, vgg16_path)
    elif not synthetic and cfg.mode == "train":
        # reference always starts fresh runs from caffe-VGG16 (train.py:127-129)
        default_vgg = osp.join(data_dir, "models", "vgg16_from_caffe.pth")
        if not osp.exists(default_vgg):
            try:  # reference parity: fetch + md5-verify on first use
                from zeroshotsemanticsegmentation_tpu.models.pretrained import (
                    cached_download_vgg16)
                cached_download_vgg16(data_dir)
            except Exception as e:
                logger.stdout(
                    f"WARNING: VGG16 auto-download failed ({e!r})")
        if osp.exists(default_vgg):
            logger.stdout(f"initializing backbone from {default_vgg}")
            params = load_vgg16_into_params(params, default_vgg)
        else:
            logger.stdout(
                "WARNING: no --vgg16 given and no cached "
                f"{default_vgg}; the backbone is RANDOMLY INITIALIZED — the "
                "reference always starts from pretrained VGG16 "
                "(train.py:127-129) and results will not be comparable")

    # 4. stage-1 trainer
    tx = make_fcn_optimizer(params, optim=cfg.fcn_optim, lr=cfg.fcn_lr)
    opt_state = None
    if checkpoint is not None and checkpoint.get("opt_state") is not None:
        # reference restores optimizer state whenever a checkpoint is loaded
        # (train.py:134-135); orbax needs the live optax structure as the
        # restore target (raw restore loses the namedtuple containers)
        try:
            target = {"params": params,
                      "opt_state": jax.eval_shape(tx.init, params)}
            opt_state = ckpt.restore_checkpoint(
                ckpt_path, target=target)["opt_state"]
        except Exception as e:  # different optimizer/arch: fresh init
            logger.stdout("WARNING: checkpoint optimizer state does not "
                          f"match the current optimizer ({e!r}); "
                          "reinitializing optimizer state")
    fcn_trainer = FCNTrainer(
        cfg=cfg, model=model, tx=tx, params=params,
        train_loader=train_seen_loader, val_loader=val_loader, logger=logger,
        embeddings=embeddings, target_embeddings=target_embeddings,
        start_epoch=start_epoch, start_iteration=start_iteration,
        best_mean_iu=best_mean_iu, opt_state=opt_state, mesh=mesh,
        upscore_trained=upscore_trained)

    summary = {"log_dir": log_dir}
    if cfg.mode == "train":
        if cfg.fcn_epochs > 0:
            fcn_trainer.train()
        if cfg.seenmask_epochs > 0:
            # stage 2 starts from the best stage-1 weights (train.py:177-179);
            # when this run never wrote a best/ (fcn_epochs=0 resume-into-
            # seenmask, or a resumed run that never improved) fall back to the
            # loaded checkpoint, mirroring the reference's `if not checkpoint`
            best_path = osp.join(log_dir, "best")
            if ckpt.checkpoint_exists(best_path):
                best = ckpt.restore_checkpoint(best_path)
            elif checkpoint is not None:
                best = checkpoint
            else:
                raise FileNotFoundError(
                    f"stage 2 needs a stage-1 checkpoint: no {best_path} and "
                    "no -r/load_fcn_path checkpoint was loaded")
            params2 = _merge_params(fcn_trainer.state.params, best["params"],
                                    logger)
            tx2 = make_seenmask_optimizer(params2, lr=cfg.seenmask_lr)
            seenmask_trainer = SeenmaskTrainer(
                cfg=cfg, model=model, tx=tx2, params=params2,
                train_loader=train_loader, val_loader=val_loader,
                logger=logger, mesh=mesh)
            seenmask_trainer.train(base_checkpoint={
                "epoch": int(best["epoch"]),
                "best_mean_iu": float(best["best_mean_iu"])})
            summary["seenmask_best_mean_iu"] = seenmask_trainer.best_mean_iu
        summary["best_mean_iu"] = fcn_trainer.best_mean_iu
    elif cfg.mode == "test_fcn":
        summary["mean_iu"] = fcn_trainer.validate(both_fcn_and_seenmask=False)
    elif cfg.mode == "test_all":
        summary["mean_iu"] = fcn_trainer.validate(both_fcn_and_seenmask=True)
    # saves overlap training (checkpoint._save_one block=False); by the time
    # this function returns every artifact must be on disk — a caller that
    # immediately reads or deletes log_dir would otherwise race the async
    # orbax writer (the atexit hook only covers process exit)
    ckpt.finish_pending()
    logger.close()
    return summary


def _merge_params(params, loaded, logger=None, to_device=True):
    """strict=False load (reference train.py:114): copy matching entries.

    Anything NOT copied (missing module/leaf or shape mismatch — e.g. a
    checkpoint from a different embed_dim) is reported through `logger` so a
    partial load is never silent. `to_device=False` keeps merged leaves as
    host arrays (callers that still need to inspect values, e.g. the
    predictor's upscore trained-ness resolution — readbacks collapse H2D on
    the axon tunnel, CLAUDE.md)."""
    out = jax.tree_util.tree_map(lambda x: x, params)
    skipped = []
    for module, leaves in loaded.items():
        if module not in out:
            skipped.append(f"{module}/* (no such module)")
            continue
        for k, v in leaves.items():
            if k not in out[module]:
                skipped.append(f"{module}/{k} (no such leaf)")
            elif np.shape(v) != np.shape(out[module][k]):
                skipped.append(
                    f"{module}/{k} (shape {np.shape(v)} vs "
                    f"{np.shape(out[module][k])})")
            else:
                out[module][k] = jnp.asarray(v) if to_device else v
    if skipped and logger is not None:
        logger.stdout("WARNING: partial checkpoint load; skipped: "
                      + ", ".join(skipped))
    return out


def _parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-n", "--name", type=str, default=None)
    p.add_argument("-c", "--config", type=int, default=1,
                   choices=sorted(PRESETS.keys()))
    p.add_argument("-dir", "--data_dir", type=str, default="data")
    p.add_argument("-tb", "--tb_dir", type=str, default=None)
    p.add_argument("-m", "--mode", type=str,
                   choices=["train", "test_fcn", "test_all"])
    p.add_argument("-d", "--dataset", type=str, choices=["pascal", "context"])
    p.add_argument("-tu", "--train_unseen", type=str,
                   help="comma-separated unseen class ids for train filtering")
    p.add_argument("-vu", "--val_unseen", type=str)
    p.add_argument("-e", "--embed_dim", type=int,
                   choices=[2, 5, 10, 20, 21, 50, 100, 200, 300])
    p.add_argument("-ve", "--fcn_epochs", type=int)
    p.add_argument("-lr", "--fcn_learning_rate", type=float)
    p.add_argument("-loss", "--fcn_loss", type=str,
                   choices=["cos", "mse", "cross_entropy"])
    p.add_argument("-o", "--fcn_optim", type=str, choices=["sgd", "adam"])
    p.add_argument("-se", "--seenmask_epochs", type=int)
    p.add_argument("-slr", "--seenmask_learning_rate", type=float)
    p.add_argument("-oh", "--one_hot_embed", action="store_true")
    p.add_argument("-fu", "--forced_unseen", action="store_true")
    p.add_argument("-r", "--resume", type=str, default="")
    # TPU-native flags
    p.add_argument("--arch", type=str, choices=["fcn32s", "fcn8s"])
    p.add_argument("--batch_size", type=int)
    p.add_argument("--eval_batch_size", type=int)
    p.add_argument("--dtype", type=str, choices=["bfloat16", "float32"])
    p.add_argument("--data_parallel", type=int)
    p.add_argument("--model_parallel", type=int)
    p.add_argument("--synthetic", action="store_true",
                   help="synthetic data (smoke runs without datasets)")
    p.add_argument("--bucket", type=int, default=None,
                   help="static square bucket size (default 512)")
    p.add_argument("--channel_scale", type=float, default=None,
                   help="backbone width multiplier (<1 for smoke tests)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize conv blocks (larger train batches)")
    p.add_argument("--no_prune_pad", action="store_true",
                   help="disable support-pruned pad-100 blocks (exact fast "
                        "path, on by default)")
    p.add_argument("--chunked_loss", action="store_true",
                   help="per-sample loss memory chunking (larger batches)")
    p.add_argument("--grad_accum", type=int,
                   help="microbatches per train step (larger batches)")
    p.add_argument("--data_echo", type=str, choices=["off", "auto"],
                   help="device-side batch echoing when H2D can't keep up "
                        "(trainer_fcn.echo_feed; default off)")
    p.add_argument("--context_classes", type=int, choices=[33, 59],
                   help="PASCAL-Context label vocabulary: 33 (reference "
                        "parity) or 59 (standard 59-class protocol, "
                        "extension; needs 59_context_labels + 59-class "
                        "embeddings — scripts/make_context59_labels.py)")
    p.add_argument("--vgg16", type=str, default=None,
                   help="path to a torch VGG16 state dict (.pth)")
    return p.parse_args(argv)


def main(argv=None) -> dict:
    import faulthandler
    import signal
    faulthandler.enable()
    if hasattr(signal, "SIGUSR1"):  # live stack dumps: kill -USR1 <pid>
        faulthandler.register(signal.SIGUSR1)
    args = _parse_args(argv)
    overrides = {}
    for src, dst in [("mode", "mode"), ("dataset", "dataset"),
                     ("embed_dim", "embed_dim"), ("fcn_epochs", "fcn_epochs"),
                     ("fcn_learning_rate", "fcn_lr"), ("fcn_loss", "fcn_loss"),
                     ("fcn_optim", "fcn_optim"),
                     ("seenmask_epochs", "seenmask_epochs"),
                     ("seenmask_learning_rate", "seenmask_lr"),
                     ("arch", "arch"),
                     ("batch_size", "batch_size"),
                     ("eval_batch_size", "eval_batch_size"),
                     ("dtype", "compute_dtype"),
                     ("data_parallel", "data_parallel"),
                     ("model_parallel", "model_parallel"),
                     ("channel_scale", "channel_scale"),
                     ("grad_accum", "grad_accum"),
                     ("data_echo", "data_echo"),
                     ("context_classes", "context_classes")]:
        v = getattr(args, src)
        if v is not None:
            overrides[dst] = v
    for flag in ["one_hot_embed", "forced_unseen", "remat", "chunked_loss"]:
        if getattr(args, flag):
            overrides[flag] = True
    if args.no_prune_pad:
        overrides["prune_pad"] = False
    for lst in ["train_unseen", "val_unseen"]:
        v = getattr(args, lst)
        if v:
            overrides[lst] = tuple(int(x) for x in v.split(","))
    if args.bucket is not None:
        overrides["bucket"] = (args.bucket, args.bucket)
    if args.resume:
        overrides["load_fcn_path"] = args.resume

    cfg = get_config(args.config, **overrides)
    mesh = None
    if cfg.data_parallel * cfg.model_parallel > 1:
        from zeroshotsemanticsegmentation_tpu.parallel import make_mesh
        mesh = make_mesh(cfg.data_parallel, cfg.model_parallel)
    return run_experiment(cfg, preset=args.config, name=args.name,
                          data_dir=args.data_dir, tb_dir=args.tb_dir,
                          synthetic=args.synthetic, vgg16_path=args.vgg16,
                          resume=args.resume, mesh=mesh)


if __name__ == "__main__":
    main()
