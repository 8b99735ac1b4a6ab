"""Stage-1 trainer: FCN embedding regression / softmax baseline.

Orchestrates the jitted steps over the batch pipeline with the reference
Trainer's observable behavior (trainer_fcn.py:19-306): per-iteration train
CSV/TB/stdout with loss + grad sums + train metrics, per-epoch validation
with overall + seen/unseen metric breakdown, first-N visualization tile,
checkpoint-every-eval with best-by-mean-IoU copy, and the dataset-specific
early-stop image budget.

TPU-native differences: batches instead of bs=1 (losses are per-sample means,
identical at bs=1), all metric histograms accumulate on device, and the whole
step — forward, loss, backward, NNE inference, confusion matrix — is one XLA
program.
"""

from __future__ import annotations

import os
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np

from zeroshotsemanticsegmentation_tpu.data.transforms import batch_image_rgb
from zeroshotsemanticsegmentation_tpu.ops import hist_to_metrics
from zeroshotsemanticsegmentation_tpu.ops.metrics import unseen_mask_vector
from zeroshotsemanticsegmentation_tpu.train import checkpoint as ckpt
from zeroshotsemanticsegmentation_tpu.train.state import TrainState
from zeroshotsemanticsegmentation_tpu.train.steps import (
    make_fcn_eval_step, make_fcn_train_step, make_szn_eval_step)
from zeroshotsemanticsegmentation_tpu.viz import (
    get_tile_image, save_image, visualize_segmentation)

_METRIC_NAMES = ("pxl_acc", "class_acc", "mean_iu", "fwavacc")

TRAIN_HEADERS = ["epoch", "iteration", "train/loss", "train/pxl_acc",
                 "train/class_acc", "train/mean_iu", "train/fwavacc",
                 "elapsed_time"]


def val_headers(zeroshot: bool) -> list[str]:
    h = ["epoch", "iteration", "val/loss", "val/pxl_acc", "val/class_acc",
         "val/mean_iu", "val/fwavacc"]
    if zeroshot:
        for grp in ("seen", "unseen"):
            h += [f"val/{grp}/{m}" for m in _METRIC_NAMES]
    return h + ["elapsed_time"]


def _to_device(batch: dict) -> dict:
    return {
        "image": jnp.asarray(batch["image"]),
        "label": jnp.asarray(batch["label"]),
        "sizes": jnp.asarray(batch["sizes"]),
        "num_real": jnp.asarray(batch["num_real"], jnp.int32),
    }


def _upscore_pristine(params) -> bool:
    """True when `seenmask_upscore` provably still equals its bilinear init.

    Only HOST leaves are inspected (a checkpoint restored by orbax): a
    device leaf means the param came from fresh init — pristine by
    construction — and reading it back would trip this platform's H2D
    collapse (CLAUDE.md). Stage 1 freezes the upscore, so only resumed
    STAGE-2 checkpoints can be non-pristine.
    """
    leaf = params.get("seenmask_upscore", {}).get("kernel")
    if leaf is None or not isinstance(leaf, np.ndarray):
        return True
    from zeroshotsemanticsegmentation_tpu.ops.bilinear import (
        bilinear_upsampling_kernel)
    ref = bilinear_upsampling_kernel(leaf.shape[2], leaf.shape[0])
    return leaf.shape == ref.shape and bool(np.array_equal(leaf, ref))


def echo_feed(loader, put, *, depth: int = 2, min_pool: int = 3,
              max_factor: float = 4.0):
    """Device-resident batch pool with asynchronous refresh (data echoing).

    Platform finding (2026-08-17, axon TPU tunnel): executing one large
    training program permanently drops host->device bandwidth from
    ~1.6 GB/s to ~40 MB/s at every transfer size (chunking, parallel
    streams and feeder threads don't help — the device_put RPC holds the
    GIL while *completing*, though *issuing* one returns in ~37 ms), so a
    B=24 512² compact batch costs ~630 ms against a ~205 ms step and the
    loop runs 3x transfer-bound. This feed keeps the device stepping at
    full rate, threadless: each iteration issues up to `depth` transfers
    asynchronously (put() must not block on completion — jnp.asarray /
    device_put are async on this platform), harvests the ones whose
    arrays report is_ready(), and serves a fresh batch when available or
    an echo of a resident one otherwise (round-robin over the last
    `min_pool`). Iteration count per epoch is unchanged; sample freshness
    drops by the echo factor (served/fresh — cf. data echoing, Choi et
    al. 2020), which the trainer logs. Training-only — validation must
    never echo.

    `max_factor` bounds the echo factor: once served/fresh would exceed it,
    the feed BLOCKS on the oldest in-flight transfer instead of re-serving
    the pool, so a fully starved feed degrades to "wait for data" rather
    than re-serving `min_pool` batches indefinitely. The default 4 is the
    largest factor inside the measured accuracy envelope
    (docs/ECHO_DYNAMICS.md — echo beats starved-fresh at fixed wall-clock
    for f ∈ {2, 4}; beyond that the claim is extrapolation). Epoch-tail
    echoes (loader exhausted, nothing in flight) are exempt — they are
    bounded by `depth` and the alternative is ending the epoch short.

    Yields (host_batch, device_batch); host_batch is None for echoes.
    """
    from collections import deque

    it = iter(loader)
    inflight: deque = deque()
    pool: list = []
    exhausted = False
    served = echoes = rr = 0
    n_batches = len(loader)

    def ready(db):
        return all(leaf.is_ready()
                   for leaf in jax.tree_util.tree_leaves(db)
                   if hasattr(leaf, "is_ready"))

    try:
        for _ in range(n_batches):
            while not exhausted and len(inflight) < depth:
                try:
                    hb = next(it)
                except StopIteration:
                    exhausted = True
                    break
                inflight.append((hb, put(hb)))  # async issue (~37 ms)
            # serve at most one fresh batch per step (each transferred
            # batch is trained on exactly once before becoming echo stock)
            fresh = None
            if inflight and ready(inflight[0][1]):
                fresh = inflight.popleft()
                pool.append(fresh)
                if len(pool) > min_pool:
                    pool.pop(0)
            over_cap = (served + 1) / max(served - echoes, 1) > max_factor
            if fresh is None and inflight and (not pool or over_cap):
                # epoch start (nothing resident yet) or the echo-factor cap
                # reached: block on the oldest transfer for a fresh batch
                fresh = inflight.popleft()
                jax.block_until_ready(fresh[1])
                pool.append(fresh)
                if len(pool) > min_pool:
                    pool.pop(0)
            if fresh is None and not pool:
                break  # loader shorter than len() claimed
            served += 1
            if fresh is not None:
                yield fresh
            else:
                echoes += 1
                rr += 1
                yield None, pool[rr % len(pool)][1]
    finally:
        if served:
            echo_feed.last_stats = {
                "served": served, "echoes": echoes,
                "echo_factor": served / max(served - echoes, 1)}


echo_feed.last_stats = None


def prefetch_to_device(loader, put, depth: int = 2):
    """Yield (host_batch, device_batch) pairs with `depth`-deep device-side
    double buffering: the transfer of batch N+1 is issued (asynchronously)
    before batch N's step results are consumed, so host->HBM copies overlap
    device compute instead of serializing after each dispatch (the reference
    has no analog — its DataLoader prefetches host-side only, train.py:81-84).
    """
    from collections import deque
    q: deque = deque()
    it = iter(loader)

    def fill():
        while len(q) < depth:
            try:
                b = next(it)
            except StopIteration:
                return
            q.append((b, put(b)))

    fill()
    while q:
        pair = q.popleft()
        fill()  # issue the next transfer before the caller blocks on compute
        yield pair


class StepLogBuffer:
    """Deferred per-step log emission: fetching `aux` scalars right after a
    dispatch blocks the host on the device queue (~30 ms RPC per fetch on
    this platform, ~15% of a 204 ms step at log_interval=1). Instead the
    tiny aux pytrees (scalars + an (n,n) hist) stay on device and are
    fetched `flush_steps` at a time in one jax.device_get, so the device
    runs ahead while every stdout/CSV/TB row is still emitted once per
    logged iteration (reference cadence, trainer_fcn.py:160-178). stdout
    rows appear in bursts of <= flush_steps; CSV timestamps are captured at
    step time (host clock, no sync). flush_steps=1 restores the
    reference-exact immediate behavior; flush_steps=0 defers EVERY fetch to
    the epoch-end flush() — on this platform the first device->host readback
    permanently collapses H2D bandwidth (CLAUDE.md trigger 1), so an
    epoch-end-only fetch keeps the whole first epoch's feed at full rate
    (data_echo covers later epochs)."""

    def __init__(self, flush_steps: int, emit):
        fs = int(flush_steps)
        self._flush_steps = fs if fs >= 1 else float("inf")
        self._emit = emit
        self._pending: list = []

    def push(self, meta: tuple, aux) -> None:
        self._pending.append((meta, aux))
        if len(self._pending) >= self._flush_steps:
            self.flush()

    def flush(self) -> None:
        if not self._pending:
            return
        fetched = jax.device_get([aux for _, aux in self._pending])
        pending, self._pending = self._pending, []
        for (meta, _), aux in zip(pending, fetched):
            self._emit(meta, aux)


class FCNTrainer:
    def __init__(self, *, cfg, model, tx, params, train_loader, val_loader,
                 logger, embeddings=None, target_embeddings=None,
                 start_epoch: int = 0,
                 start_iteration: int = 0, best_mean_iu: float = 0.0,
                 opt_state=None, mesh=None, upscore_trained=None):
        self.cfg = cfg
        self.model = model
        self.tx = tx
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.logger = logger
        self.mesh = mesh
        self.epoch = start_epoch
        self.best_mean_iu = best_mean_iu

        n = cfg.num_classes
        self.n_class = n
        # class partitioning: stitch/forced-unseen uses train+val unseen
        # (reference trainer_fcn.py:44,56-64); metric breakdown uses
        # val_unseen only (trainer_fcn.py:223)
        self.all_unseen = tuple(cfg.train_unseen) + tuple(cfg.val_unseen)
        # embeddings/mask vectors stay HOST numpy: the step factories close
        # over them, and lowering a jit-captured DEVICE array reads it back
        # to the host — and ANY device->host readback collapses H2D
        # bandwidth on this platform (probe_h2d d2h_* bisect;
        # steps._host_const). As np consts they inline into the HLO as
        # literals, which GSPMD replicates for free — no mesh replicate().
        all_unseen_vec = np.asarray(unseen_mask_vector(n, self.all_unseen))
        val_unseen_vec = np.asarray(unseen_mask_vector(n, cfg.val_unseen))
        self.zeroshot = bool(self.all_unseen)

        emb = None if embeddings is None else np.asarray(embeddings,
                                                         np.float32)
        temb = (None if target_embeddings is None
                else np.asarray(target_embeddings, np.float32))
        self.embeddings = emb

        # `seenmask_upscore` trained-ness is STRUCTURAL when known: checkpoint
        # metadata (checkpoint.save_checkpoint upscore_trained=..., set by
        # stage 2) threads through run_experiment to this kwarg. Only when the
        # caller passes None (legacy checkpoint / direct library use) fall
        # back to numeric sniffing — checked BEFORE any device placement:
        # restored checkpoint leaves are host numpy (orbax), fresh-init
        # leaves are device arrays that are pristine by construction —
        # either way no device->host readback.
        if upscore_trained is None:
            upscore_trained = not _upscore_pristine(params)
        self.upscore_trained = bool(upscore_trained)
        self._pristine_upscore = not self.upscore_trained

        if mesh is not None:
            from zeroshotsemanticsegmentation_tpu.parallel import (
                shard_params)
            params = shard_params(params, mesh)
        if opt_state is None:
            opt_state = jax.jit(tx.init)(params)
        elif mesh is not None:
            from zeroshotsemanticsegmentation_tpu.parallel import (
                shard_opt_state)
            opt_state = shard_opt_state(opt_state, mesh)
        self.state = TrainState(params=params, opt_state=opt_state,
                                step=jnp.asarray(start_iteration, jnp.int32))

        kw = dict(loss_name=cfg.fcn_loss, num_classes=n, embeddings=emb,
                  target_embeddings=temb, forced_unseen=cfg.forced_unseen,
                  all_unseen_vec=all_unseen_vec)
        self._train_step = make_fcn_train_step(
            model, tx, chunked_loss=getattr(cfg, "chunked_loss", False),
            grad_accum=getattr(cfg, "grad_accum", 1),
            # SZN_FUSED_TAIL policy (auto: on TPU backend); under a mesh
            # the kernel shard_maps over the batch axes per data shard
            # (ops/costail_fused.fused_cos_tail), like the serving kernel
            fused_tail=None, mesh=mesh, **kw)
        # fused eval = the serving inference kernel inside validation; "auto"
        # enables it on real TPU runs, single-chip or mesh (the kernel is
        # shard_mapped over the 'data' axis — ops/szn_fused._fused_call);
        # interpret-mode pallas stays off on CPU where it's slow
        fe = getattr(cfg, "fused_eval", "auto")
        fused = fe == "on" or (fe == "auto"
                               and jax.default_backend() == "tpu")
        self._eval_step = make_fcn_eval_step(model, val_unseen_vec=val_unseen_vec,
                                             fused=fused, mesh=mesh, **kw)
        # the fused SZN kernel upsamples the seenmask gate with the FIXED
        # bilinear taps; that is exact only while `seenmask_upscore` still
        # equals its bilinear init (true for fresh inits and stage-1-only
        # checkpoints — stage 1 freezes it; the reference's stage 2 TRAINS
        # it, train.py:304-307). Restored params arrive as host numpy, so
        # this check is free of device readbacks; fresh-init device params
        # are pristine by construction.
        szn_fused = fused and self._pristine_upscore
        if self.zeroshot and emb is not None:
            self._szn_eval_step = make_szn_eval_step(
                model, loss_name=cfg.fcn_loss, num_classes=n, embeddings=emb,
                target_embeddings=temb, all_unseen_vec=all_unseen_vec,
                val_unseen_vec=val_unseen_vec, fused=szn_fused, mesh=mesh)
        else:
            self._szn_eval_step = None
        self._dropout_key = jax.random.PRNGKey(cfg.seed)

    # ------------------------------------------------------------------

    @property
    def iteration(self) -> int:
        return int(self.state.step)

    def _put(self, batch: dict) -> dict:
        if self.mesh is not None:
            from zeroshotsemanticsegmentation_tpu.parallel import shard_batch
            return shard_batch(
                {k: v for k, v in batch.items() if k != "ids"}, self.mesh)
        return _to_device(batch)

    def _emit_train_row(self, meta: tuple, aux: dict) -> None:
        epoch, batch_idx, it, elapsed = meta
        log = self.logger
        loss = float(aux["loss"])
        if np.isnan(loss):
            raise ValueError("loss is nan while training")  # ref :107
        metrics = hist_to_metrics(np.asarray(aux["hist"]))
        log.stdout(
            "FCN Train Epoch {:<5} | Iteration {:<5} | Loss {:5.5f} | "
            "score_fr grad sum {:15.6f} | score sum {:10.5f}".format(
                epoch, batch_idx, loss,
                float(aux["score_fr_grad_sum"]),
                float(aux["score_sum"])))
        log.csv_append("train_log.csv", TRAIN_HEADERS,
                       [epoch, it, loss, *metrics, elapsed])
        log.scalar("fcn/train/loss", loss, it)
        log.scalars("fcn/train", list(_METRIC_NAMES), metrics, it)

    def train_epoch(self) -> None:
        self.train_loader.set_epoch(self.epoch)
        log = self.logger
        profiling = False
        echo = getattr(self.cfg, "data_echo", "off") == "auto"
        feed = (echo_feed(self.train_loader, self._put,
                          max_factor=getattr(self.cfg, "data_echo_max_factor",
                                             4.0)) if echo
                else prefetch_to_device(self.train_loader, self._put))
        it0 = int(self.state.step)  # one sync per epoch; steps add 1 each
        buf = StepLogBuffer(getattr(self.cfg, "log_flush_steps", 16),
                            self._emit_train_row)
        for batch_idx, (_, dbatch) in enumerate(feed):
            # optional jax.profiler window (skip step 0: compile noise)
            if (self.cfg.profile_steps and self.epoch == 0
                    and batch_idx == 1 and not profiling):
                import jax
                jax.profiler.start_trace(osp.join(log.log_dir, "profile"))
                profiling = True
            self.state, aux = self._train_step(self.state, dbatch,
                                               self._dropout_key)
            if profiling and batch_idx >= self.cfg.profile_steps:
                import jax
                jax.block_until_ready(aux["loss"])
                jax.profiler.stop_trace()
                profiling = False
            if batch_idx % self.cfg.log_interval:
                continue
            buf.push((self.epoch, batch_idx, it0 + batch_idx,
                      log.elapsed_seconds), aux)
        buf.flush()
        if echo and echo_feed.last_stats:
            s = echo_feed.last_stats
            log.stdout(f"data-echo epoch {self.epoch}: {s['served']} steps, "
                       f"{s['echoes']} echoed (factor "
                       f"{s['echo_factor']:.2f})")

    def validate(self, *, both_fcn_and_seenmask: bool = False) -> float:
        """One full validation pass; returns overall mean-IoU.

        both_fcn_and_seenmask=True runs the full-SZN path (reference
        forward_szn / test_all); False runs plain fcn inference (test_fcn).
        """
        cfg, log = self.cfg, self.logger
        step_fn = (self._szn_eval_step if both_fcn_and_seenmask
                   else self._eval_step)
        if step_fn is None:
            raise ValueError("SZN validation requires zero-shot embeddings")

        loss_sum, n_images = 0.0, 0
        hists = np.zeros((3, self.n_class, self.n_class), np.int64)
        tiles = []
        for batch, dbatch in prefetch_to_device(self.val_loader, self._put):
            out = step_fn(self.state.params, dbatch)
            loss_sum += float(out["loss_sum"])
            n_images += batch["num_real"]
            hists += np.asarray(out["hists"])
            if len(tiles) < cfg.num_viz:
                pred = np.asarray(out["pred"])
                for i in range(batch["num_real"]):
                    if len(tiles) >= cfg.num_viz:
                        break
                    h, w = batch["sizes"][i]
                    img = batch_image_rgb(batch["image"][i, :h, :w])
                    tiles.append(visualize_segmentation(
                        lbl_pred=pred[i, :h, :w],
                        lbl_true=batch["label"][i, :h, :w].copy(),
                        img=img, n_class=self.n_class,
                        unseen=list(cfg.val_unseen)))

        viz_dir = osp.join(log.log_dir,
                           "szn_viz" if both_fcn_and_seenmask else "fcn_viz")
        os.makedirs(viz_dir, exist_ok=True)
        tile = get_tile_image(tiles) if tiles else None
        if tile is not None:
            save_image(osp.join(viz_dir, f"epoch{self.epoch}.jpg"), tile)
            log.image("fcn/segmentations", tile, self.epoch)

        val_loss = loss_sum / max(n_images, 1)  # per-image mean (ref :250)
        metrics = hist_to_metrics(hists[0])
        row = [self.epoch, self.iteration, val_loss, *metrics]
        log.scalar("fcn/val/loss", val_loss, self.epoch)
        log.scalars("fcn/val", list(_METRIC_NAMES), metrics, self.epoch)
        if self.zeroshot:
            seen_metrics = hist_to_metrics(hists[1])
            unseen_metrics = hist_to_metrics(hists[2])
            log.scalars("fcn/val/seen", list(_METRIC_NAMES), seen_metrics,
                        self.epoch)
            log.scalars("fcn/val/unseen", list(_METRIC_NAMES), unseen_metrics,
                        self.epoch)
            for grp, m in [("seen", seen_metrics), ("unseen", unseen_metrics)]:
                for name, v in zip(_METRIC_NAMES, m):
                    log.stdout(f"{grp} {name}: {v:.3f}")
            row += [*seen_metrics, *unseen_metrics]
        for name, v in zip(_METRIC_NAMES, metrics):
            log.stdout(f"overall {name}: {v:.3f}")
        row.append(log.elapsed_seconds)
        log.csv_append("val_log.csv", val_headers(self.zeroshot), row)

        mean_iu = metrics[2]
        is_best = bool(mean_iu > self.best_mean_iu or
                       np.isnan(self.best_mean_iu))
        if is_best and not np.isnan(mean_iu):
            self.best_mean_iu = mean_iu
        ckpt.save_checkpoint(
            log.log_dir, params=self.state.params,
            opt_state=self.state.opt_state, epoch=self.epoch,
            iteration=self.iteration, best_mean_iu=self.best_mean_iu,
            is_best=is_best, upscore_trained=self.upscore_trained)
        return mean_iu

    def train(self) -> None:
        """Epoch loop with the reference's image-budget early stop
        (trainer_fcn.py:294-306)."""
        for epoch in range(self.epoch, self.cfg.fcn_epochs):
            self.epoch = epoch
            self.train_epoch()
            self.validate()
            # reference counts epoch * images-per-epoch (trainer_fcn.py:302)
            if epoch * len(self.train_loader.dataset) > self.cfg.early_stop_images:
                break
