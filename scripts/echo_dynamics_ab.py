#!/usr/bin/env python
"""Data-echo training-dynamics A/B (VERDICT r3 item 6).

`data_echo="auto"` (trainer_fcn.echo_feed) is the throughput rescue for this
platform's collapsed feed (loop 22.6 -> 85.5 img/s), but echoing changes the
sample schedule vs the reference's fresh-batch loader
(/root/reference/train.py:81-84): under feed starvation the step budget is
wall-clock-bound, so echo factor f means the SAME number of optimizer steps
sees ~1/f as many unique samples. This experiment quantifies what that does
to convergence on a *learnable* synthetic task, isolating the schedule from
platform noise by emulating echo deterministically (each fetched batch is
stepped f times; fixed total step budget).

Task: 9-class segmentation where each class has a distinct RGB signature
(color blocks + strong noise) — the FCN genuinely learns color->class and
generalizes to a held-out split, so val mIoU is a real generalization
measure, unlike the throughput SyntheticDataset whose labels are
image-independent.

Writes docs/ECHO_DYNAMICS.json and prints a markdown summary (paste into
docs/ECHO_DYNAMICS.md). Runs on the real TPU (~15 min with warm cache).
"""

import json
import os.path as osp
import sys
import time

_REPO_ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

SIZE = 128
BATCH = 8
TRAIN_IMAGES = 4800  # pool > f=1 draws, so unique-sample counts differ by f
VAL_IMAGES = 64
K = 9                # classes == embedding dim (one-hot embeddings)
LR = 1e-3
# (echo_factor, step_budget): the 600-step rows compare schedules at equal
# optimizer work (infinite-bandwidth framing); the (1, 300)/(1, 150) rows are
# the PRODUCTION controls — echo OFF under a 2x/4x-starved feed delivers
# proportionally fewer steps in the same wall clock
MODES = ((1, 600), (2, 600), (4, 600), (1, 300), (1, 150))
SEEDS = (0, 1, 2)


def _class_colors(rng):
    # well-separated RGB signatures, roughly centered for mean-sub
    import numpy as np
    return (rng.standard_normal((K, 3)).astype(np.float32) * 60.0)


def make_split(seed, n, colors):
    """Blocky class images: image = color[label] + N(0, 40) noise."""
    import numpy as np
    imgs, lbls = [], []
    for i in range(n):
        rng = np.random.Generator(np.random.SFC64(seed * 999983 + i))
        # 2x2 grid of 64-px class blocks: resolvable at the 1/32-res head
        ch = rng.integers(0, K, size=(2, 2))
        rep = -(-SIZE // 2)
        lbl = np.kron(ch, np.ones((rep, rep), np.int64))[:SIZE, :SIZE]
        img = colors[lbl] + rng.standard_normal(
            (SIZE, SIZE, 3), dtype=np.float32) * 40.0
        ign = rng.integers(0, SIZE * SIZE, size=SIZE * SIZE // 50)
        lbl = lbl.astype(np.int32)
        lbl.ravel()[ign] = -1
        imgs.append(img)
        lbls.append(lbl)
    return np.stack(imgs), np.stack(lbls)


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      osp.expanduser("~/.cache/zss_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from zeroshotsemanticsegmentation_tpu.models import FCN32s
    from zeroshotsemanticsegmentation_tpu.ops.nne import infer_labels
    from zeroshotsemanticsegmentation_tpu.ops.metrics import (
        confusion_matrix, hist_to_metrics)
    from zeroshotsemanticsegmentation_tpu.train import make_fcn_optimizer
    from zeroshotsemanticsegmentation_tpu.train.state import TrainState
    from zeroshotsemanticsegmentation_tpu.train.steps import (
        make_fcn_train_step)

    rng = np.random.Generator(np.random.SFC64(7))
    colors = _class_colors(rng)
    tr_img, tr_lbl = make_split(1, TRAIN_IMAGES, colors)
    va_img, va_lbl = make_split(2, VAL_IMAGES, colors)
    embed = np.eye(K, dtype=np.float32)  # one-hot embeddings, cosine loss

    model = FCN32s(num_classes=K, dtype=jnp.bfloat16)
    va_img_d = jnp.asarray(va_img)
    va_lbl_d = jnp.asarray(va_lbl)

    @jax.jit
    def eval_hist(params):
        def one(carry, i):
            img = jax.lax.dynamic_slice_in_dim(va_img_d, i * BATCH, BATCH)
            lbl = jax.lax.dynamic_slice_in_dim(va_lbl_d, i * BATCH, BATCH)
            score = model.apply({"params": params}, img, mode="fcn",
                                train=False)
            pred = infer_labels(score, jnp.asarray(embed))
            return carry + confusion_matrix(lbl, pred, K), 0
        hist0 = jnp.zeros((K, K), jnp.int32)
        hist, _ = jax.lax.scan(one, hist0, jnp.arange(VAL_IMAGES // BATCH))
        return hist

    results = {}
    for f, steps in MODES:
      per_seed = []
      for seed in SEEDS:
        params0s = jax.jit(lambda s: model.init(
            jax.random.PRNGKey(s), jnp.zeros((1, SIZE, SIZE, 3),
                                             jnp.float32),
            mode="both"), static_argnums=())(jnp.int32(seed))["params"]
        tx = make_fcn_optimizer(params0s, optim="adam", lr=LR)
        step = make_fcn_train_step(model, tx, loss_name="cos",
                                   num_classes=K, embeddings=embed)
        state = TrainState(params=params0s,
                           opt_state=jax.jit(tx.init)(params0s),
                           step=jnp.zeros((), jnp.int32))
        key = jax.random.PRNGKey(42 + seed)
        order = np.random.Generator(np.random.SFC64(3 + 7 * seed)).permutation(
            TRAIN_IMAGES)
        losses, cursor, fetched = [], 0, 0
        t0 = time.time()
        s = 0
        while s < steps:
            idx = order[cursor:cursor + BATCH]
            if len(idx) < BATCH:  # wrap the shuffled pool
                order = np.random.Generator(
                    np.random.SFC64(4 + fetched)).permutation(TRAIN_IMAGES)
                cursor = 0
                continue
            cursor += BATCH
            fetched += 1
            batch = {
                "image": jnp.asarray(tr_img[idx]),
                "label": jnp.asarray(tr_lbl[idx]),
                "sizes": jnp.asarray(
                    np.full((BATCH, 2), SIZE, np.int32)),
                "num_real": jnp.asarray(BATCH, jnp.int32),
            }
            for _ in range(f):        # echo: reuse the resident batch
                if s >= steps:
                    break
                state, aux = step(state, batch, key)
                losses.append(float(aux["loss"]))
                s += 1
        hist = np.asarray(eval_hist(state.params))
        acc, acc_cls, miou, fwav = hist_to_metrics(hist)
        per_seed.append({
            "seed": seed,
            "unique_samples": int(fetched * BATCH),
            "train_loss_last10_mean": round(float(np.mean(losses[-10:])), 4),
            "loss_curve_every10": [round(float(np.mean(
                losses[i:i + 10])), 4) for i in range(0, steps, 10)],
            "val_pixel_acc": round(float(acc), 4),
            "val_mean_iu": round(float(miou), 4),
            "wall_s": round(time.time() - t0, 1),
        })
        print(json.dumps({"echo_factor": f,
                          **{k: v for k, v in per_seed[-1].items()
                             if k != "loss_curve_every10"}}))
      mious = [r["val_mean_iu"] for r in per_seed]
      results[(f, steps)] = {
          "echo_factor": f, "steps": steps,
          "unique_samples": per_seed[0]["unique_samples"],
          "val_mean_iu_mean": round(float(np.mean(mious)), 4),
          "val_mean_iu_min": min(mious), "val_mean_iu_max": max(mious),
          "val_pixel_acc_mean": round(float(np.mean(
              [r["val_pixel_acc"] for r in per_seed])), 4),
          "train_loss_last10_mean": round(float(np.mean(
              [r["train_loss_last10_mean"] for r in per_seed])), 4),
          "per_seed": per_seed,
      }

    out = {
        "task": f"{K}-class color-signature 2x2 blocks + N(0,40) noise, "
                f"{SIZE}x{SIZE}, B={BATCH}, adam {LR}, cosine loss, "
                "one-hot embeddings",
        "framing": "fixed step budget (feed-starved regime): echo factor f "
                   "=> same steps, ~1/f unique samples",
        "modes": {f"f{k[0]}_steps{k[1]}": v for k, v in results.items()},
    }
    with open(osp.join(_REPO_ROOT, "docs", "ECHO_DYNAMICS.json"), "w") as fh:
        json.dump(out, fh, indent=1)

    print("\n| echo f | steps | unique samples | final train loss "
          "| val pixel acc | val mIoU (mean [min-max] over seeds) |")
    print("|---|---|---|---|---|---|")
    for key in MODES:
        r = results[key]
        print(f"| {r['echo_factor']} | {r['steps']} | "
              f"{r['unique_samples']} | "
              f"{r['train_loss_last10_mean']:.4f} | "
              f"{r['val_pixel_acc_mean']:.3f} | {r['val_mean_iu_mean']:.3f} "
              f"[{r['val_mean_iu_min']:.3f}-{r['val_mean_iu_max']:.3f}] |")


if __name__ == "__main__":
    main()
