#!/usr/bin/env python
"""Per-op TPU profile of the serving forward (and optionally the train step).

Captures a jax.profiler trace of the production program and prints the
top-k ops by self time from the xplane proto — the round-2 recipe from
PLAN.md item 2 (tensorboard_plugin_profile's converter is version-broken in
this image; direct xplane_pb2 parsing works).

Usage:
    python scripts/profile_forward.py [--train] [--topk 25] [--batch N]
"""

import argparse
import glob
import os
import os.path as osp
import sys
import tempfile
from collections import defaultdict

_REPO_ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def _find_xplane(logdir):
    paths = glob.glob(osp.join(logdir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {logdir}")
    return max(paths, key=os.path.getmtime)


def summarize_xplane(path, topk):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    space = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())
    per_op = defaultdict(float)
    for plane in space.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                per_op[name] += ev.duration_ps / 1e9  # -> ms
    total = sum(per_op.values())
    print(f"\n== xplane {osp.basename(path)}: {total:.2f} ms total "
          f"device-op time ==")
    for name, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[:topk]:
        print(f"{ms:9.3f} ms  {100 * ms / max(total, 1e-9):5.1f}%  {name}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--topk", type=int, default=25)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--no_prune", action="store_true")
    ap.add_argument("--no_fused_block1", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    jax.config.update("jax_compilation_cache_dir",
                      osp.expanduser("~/.cache/zss_jax_cache"))

    from zeroshotsemanticsegmentation_tpu.models import FCN32s
    from zeroshotsemanticsegmentation_tpu.ops.szn_fused import (
        infer_labels_szn_fused)
    from zeroshotsemanticsegmentation_tpu.ops.metrics import (
        unseen_mask_vector)
    from zeroshotsemanticsegmentation_tpu.data.assets import (
        load_class_embeddings)

    B, H, W = args.batch, 512, 512
    rng = np.random.RandomState(0)
    model = FCN32s(num_classes=20, dtype=jnp.bfloat16,
                   prune_pad=not args.no_prune,
                   fused_block1=not args.no_fused_block1)
    x = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32) * 40)
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x[:1],
                                        mode="both"))()["params"]
    # host np: jit-captured device consts collapse H2D (CLAUDE.md trigger 1)
    embed = np.asarray(load_class_embeddings("pascal", 20), np.float32)
    unseen_vec = np.asarray(unseen_mask_vector(21, [1, 13]))

    if args.train:
        from zeroshotsemanticsegmentation_tpu.train import make_fcn_optimizer
        from zeroshotsemanticsegmentation_tpu.train.state import TrainState
        from zeroshotsemanticsegmentation_tpu.train.steps import (
            make_fcn_train_step)
        batch = {"image": x,
                 "label": jnp.asarray(
                     rng.randint(-1, 21, (B, H, W)).astype(np.int32)),
                 "sizes": jnp.asarray(np.full((B, 2), H, np.int32)),
                 "num_real": jnp.asarray(B, jnp.int32)}
        tx = make_fcn_optimizer(params, optim="adam", lr=1e-5)
        step = make_fcn_train_step(model, tx, loss_name="cos",
                                   num_classes=21, embeddings=embed)
        state = TrainState(params=params, opt_state=jax.jit(tx.init)(params),
                           step=jnp.zeros((), jnp.int32))
        key = jax.random.PRNGKey(0)

        def run():
            nonlocal state
            state, aux = step(state, batch, key)
            return aux["loss"]
    else:
        @jax.jit
        def fwd(params, x):
            f_raw, s_raw = model.apply({"params": params}, x, mode="raw")
            return infer_labels_szn_fused(f_raw, s_raw, embed, unseen_vec,
                                          (H, W))

        def run():
            return fwd(params, x)

    jax.block_until_ready(run())  # compile outside the trace
    logdir = tempfile.mkdtemp(prefix="zss_profile_")
    with jax.profiler.trace(logdir):
        for _ in range(3):
            out = run()
        jax.block_until_ready(out)
    summarize_xplane(_find_xplane(logdir), args.topk)
    print(f"\ntrace dir: {logdir}")


if __name__ == "__main__":
    main()
