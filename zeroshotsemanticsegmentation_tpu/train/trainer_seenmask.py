"""Stage-2 trainer: binary seenmask head on a frozen backbone.

Reference behavior (trainer_seenmask.py:19-172, train.py:163-194): train the
2-channel head with size-averaged CE where the binary target is "pixel's
class ∈ seen" (unlabeled counts as unseen); trained on the *train* split —
which keeps train_unseen pixels as negatives (that asymmetry is the method,
SURVEY §6 hard-parts) — evaluated on val; per-iteration logs mirror stage 1
under seenmask/* tags.

Deliberate fixes over the reference (SURVEY "bugs to fix"): metrics use a
2-class histogram (the reference reuses the 21/33-class one,
trainer_seenmask.py:137) and the merged best checkpoint is only rewritten
when mean-IoU actually improves (the reference overwrites unconditionally,
trainer_seenmask.py:165-166).
"""

from __future__ import annotations

import os
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np

from zeroshotsemanticsegmentation_tpu.data.transforms import batch_image_rgb
from zeroshotsemanticsegmentation_tpu.ops import hist_to_metrics
from zeroshotsemanticsegmentation_tpu.train import checkpoint as ckpt
from zeroshotsemanticsegmentation_tpu.train.state import TrainState
from zeroshotsemanticsegmentation_tpu.train.steps import (
    make_seenmask_eval_step, make_seenmask_train_step)
from zeroshotsemanticsegmentation_tpu.train.trainer_fcn import (
    _METRIC_NAMES, TRAIN_HEADERS, StepLogBuffer, _to_device,
    prefetch_to_device, val_headers)
from zeroshotsemanticsegmentation_tpu.viz import (
    get_tile_image, save_image, visualize_seenmask)


class SeenmaskTrainer:
    def __init__(self, *, cfg, model, tx, params, train_loader, val_loader,
                 logger, start_iteration: int = 0, mesh=None):
        self.cfg = cfg
        self.model = model
        self.tx = tx
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.logger = logger
        self.mesh = mesh
        self.epoch = 0
        self.best_mean_iu = 0.0

        n = cfg.num_classes
        # seen = classes not in train_unseen (reference train.py:192,
        # trainer_seenmask.py:55)
        seen = np.array([c not in set(cfg.train_unseen) for c in range(n)])
        seen_vec = seen  # host np: jit-captured device consts collapse H2D

        # stage 2 optimizes `seenmask_upscore` whenever the arch has one
        # (reference train.py:304-307) — record that STRUCTURALLY so every
        # checkpoint this trainer writes carries upscore_trained metadata
        # (FCN8s keeps a fixed seenmask upsample: stays False)
        self.upscore_trained = "seenmask_upscore" in params

        if mesh is not None:
            from zeroshotsemanticsegmentation_tpu.parallel import shard_params
            params = shard_params(params, mesh)
        opt_state = jax.jit(tx.init)(params)
        self.state = TrainState(params=params, opt_state=opt_state,
                                step=jnp.asarray(start_iteration, jnp.int32))
        self._train_step = make_seenmask_train_step(model, tx,
                                                    seen_vec=seen_vec)
        self._eval_step = make_seenmask_eval_step(model, seen_vec=seen_vec)
        self._dropout_key = jax.random.PRNGKey(cfg.seed + 1)

    @property
    def iteration(self) -> int:
        return int(self.state.step)

    def _put(self, batch):
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
            raise ValueError("loss is nan while training")
        metrics = hist_to_metrics(np.asarray(aux["hist"]))
        log.stdout(
            "Seenmask Train Epoch {:<5} | Iteration {:<5} | Loss {:5.5f} | "
            "seenmask grad sum {:7.8f} | score sum {:10.5f}".format(
                epoch, batch_idx, loss,
                float(aux["seenmask_grad_sum"]), float(aux["score_sum"])))
        log.csv_append("seenmask_train_log.csv", TRAIN_HEADERS,
                       [epoch, it, loss, *metrics, elapsed])
        log.scalar("seenmask/train/loss", loss, it)
        log.scalars("seenmask/train", list(_METRIC_NAMES), metrics, it)

    def train_epoch(self) -> None:
        self.train_loader.set_epoch(1_000_000 + self.epoch)
        log = self.logger
        echo = getattr(self.cfg, "data_echo", "off") == "auto"
        from zeroshotsemanticsegmentation_tpu.train.trainer_fcn import (
            echo_feed)
        feed = (echo_feed(self.train_loader, self._put,
                          max_factor=getattr(self.cfg, "data_echo_max_factor",
                                             4.0)) if echo
                else prefetch_to_device(self.train_loader, self._put))
        it0 = int(self.state.step)  # one sync per epoch; steps add 1 each
        buf = StepLogBuffer(getattr(self.cfg, "log_flush_steps", 16),
                            self._emit_train_row)
        for batch_idx, (_, dbatch) in enumerate(feed):
            self.state, aux = self._train_step(self.state, dbatch,
                                               self._dropout_key)
            if batch_idx % self.cfg.log_interval:
                continue
            buf.push((self.epoch, batch_idx, it0 + batch_idx,
                      log.elapsed_seconds), aux)
        buf.flush()

    def validate(self, *, base_checkpoint: dict | None = None) -> float:
        cfg, log = self.cfg, self.logger
        loss_sum, n_images = 0.0, 0
        hist = np.zeros((2, 2), np.int64)
        tiles = []
        for batch, dbatch in prefetch_to_device(self.val_loader, self._put):
            out = self._eval_step(self.state.params, dbatch)
            loss_sum += float(out["loss_sum"])
            n_images += batch["num_real"]
            hist += np.asarray(out["hists"])[0]
            if len(tiles) < cfg.num_viz:
                pred = np.asarray(out["pred"])
                for i in range(batch["num_real"]):
                    if len(tiles) >= cfg.num_viz:
                        break
                    h, w = batch["sizes"][i]
                    img = batch_image_rgb(batch["image"][i, :h, :w])
                    lbl = batch["label"][i, :h, :w]
                    seen_true = np.where(
                        lbl < 0, -1,
                        (~np.isin(lbl, list(cfg.train_unseen))).astype(np.int32))
                    tiles.append(visualize_seenmask(
                        lbl_pred=pred[i, :h, :w], lbl_true=seen_true,
                        img=img, n_class=2))

        viz_dir = osp.join(log.log_dir, "seenmask_viz")
        os.makedirs(viz_dir, exist_ok=True)
        if tiles:
            tile = get_tile_image(tiles)
            save_image(osp.join(viz_dir, f"epoch{self.epoch}.jpg"), tile)
            log.image("seenmask/segmentations", tile, self.epoch)

        val_loss = loss_sum / max(n_images, 1)
        metrics = hist_to_metrics(hist)
        log.scalar("seenmask/val/loss", val_loss, self.epoch)
        log.scalars("seenmask/val", list(_METRIC_NAMES), metrics, self.epoch)
        for name, v in zip(_METRIC_NAMES, metrics):
            log.stdout(f"{name}: {v:.3f}")
        log.csv_append("seenmask_val_log.csv", val_headers(False),
                       [self.epoch, self.iteration, val_loss, *metrics,
                        log.elapsed_seconds])

        mean_iu = metrics[2]
        is_best = bool(mean_iu > self.best_mean_iu)
        if is_best:
            self.best_mean_iu = mean_iu
        # merge updated weights into the stage-1 checkpoint and save as best
        base = base_checkpoint or {}
        ckpt.save_checkpoint(
            log.log_dir, params=self.state.params,
            opt_state=self.state.opt_state,
            epoch=base.get("epoch", self.epoch),
            iteration=self.iteration,
            best_mean_iu=base.get("best_mean_iu", self.best_mean_iu),
            is_best=is_best, upscore_trained=self.upscore_trained)
        return mean_iu

    def train(self, *, base_checkpoint: dict | None = None) -> None:
        for epoch in range(self.cfg.seenmask_epochs):
            self.epoch = epoch
            self.train_epoch()
            self.validate(base_checkpoint=base_checkpoint)
