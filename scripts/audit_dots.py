#!/usr/bin/env python
"""Assert the production programs are dot-free (H2D-collapse guard).

Why: on this platform, compiling-or-loading ANY XLA executable containing a
`dot`/`dot_general` permanently collapses host->device bandwidth for the
process (~1.5 GB/s -> ~15-40 MB/s; bisected in scripts/probe_h2d.py). Convs
and Pallas kernels are exempt (a Pallas matmul body was probed clean), so
the hot programs implement every contraction as conv / multiply-reduce
(ops/dotless.py, ops/bilinear.py) / Pallas (ops/pdot.py).

This audit lowers each production program FOR THE TPU BACKEND (lowering is
local and fast; only compiles go through the remote helper) and counts
`stablehlo.dot_general` ops with their source metadata. Pallas kernels
lower to opaque `tpu_custom_call` payloads, so any textual dot_general is a
genuine XLA dot that would trip the collapse. Note the trigger is
mid-pipeline, not the final executable: the TPU backend re-lowers surviving
dots into `convolution` HLO, so optimized-HLO grepping shows 0 dots even
for programs that measurably collapse — the StableHLO level is the right
place to look, and scripts/probe_h2d.py remains the operational truth.

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/audit_dots.py [prog ...]

progs: train eval seenmask serving (default: all). Exits nonzero if any
program contains a dot. One JSON summary line at the end.
"""

import json
import os.path as osp
import re
import sys

_REPO_ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

H = W = 512
B_TRAIN = 8
B_EVAL = 8


def _common():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from zeroshotsemanticsegmentation_tpu.models import FCN32s
    from zeroshotsemanticsegmentation_tpu.data.assets import (
        load_class_embeddings)
    model = FCN32s(num_classes=20, dtype=jnp.bfloat16, fused_block1=True)
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(
            rng.randn(B_TRAIN, H, W, 3).astype(np.float32) * 40),
        "label": jnp.asarray(
            rng.randint(-1, 21, (B_TRAIN, H, W)).astype(np.int32)),
        "sizes": jnp.asarray(np.full((B_TRAIN, 2), H, np.int32)),
        "num_real": jnp.asarray(B_TRAIN, jnp.int32),
    }
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0),
                                        batch["image"][:1],
                                        mode="both"))()["params"]
    # host np, like production post-fix: embeddings/unseen vecs enter the
    # jitted programs as closure consts, and device-array consts collapse
    # H2D on this platform (probe_h2d closure_tiny/closure_conv) — np
    # consts inline as HLO literals and are clean (closure_np)
    embed = np.asarray(load_class_embeddings("pascal", 20), np.float32)
    return model, batch, params, embed


def build_train():
    """(jitted step, example args) — mirrors FCNTrainer's construction."""
    import jax
    import jax.numpy as jnp
    from zeroshotsemanticsegmentation_tpu.train import make_fcn_optimizer
    from zeroshotsemanticsegmentation_tpu.train.state import TrainState
    from zeroshotsemanticsegmentation_tpu.train.steps import (
        make_fcn_train_step)
    model, batch, params, embed = _common()
    tx = make_fcn_optimizer(params, optim="adam", lr=1e-5)
    step = make_fcn_train_step(model, tx, loss_name="cos", num_classes=21,
                               embeddings=embed)
    state = TrainState(params=params, opt_state=jax.jit(tx.init)(params),
                       step=jnp.zeros((), jnp.int32))
    return step, (state, batch, jax.random.PRNGKey(0))


def build_eval():
    import numpy as np
    from zeroshotsemanticsegmentation_tpu.ops.metrics import (
        unseen_mask_vector)
    from zeroshotsemanticsegmentation_tpu.train.steps import (
        make_fcn_eval_step)
    model, batch, params, embed = _common()
    val_unseen = np.asarray(unseen_mask_vector(21, [1, 13]))
    step = make_fcn_eval_step(model, loss_name="cos", num_classes=21,
                              embeddings=embed, val_unseen_vec=val_unseen,
                              fused=True)
    return step, (params, batch)


def build_seenmask():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from zeroshotsemanticsegmentation_tpu.ops.metrics import (
        unseen_mask_vector)
    from zeroshotsemanticsegmentation_tpu.train import (
        make_seenmask_optimizer)
    from zeroshotsemanticsegmentation_tpu.train.state import TrainState
    from zeroshotsemanticsegmentation_tpu.train.steps import (
        make_seenmask_train_step)
    model, batch, params, embed = _common()
    seen_vec = np.asarray(~unseen_mask_vector(21, [1, 13]))
    tx = make_seenmask_optimizer(params, lr=1e-5)
    step = make_seenmask_train_step(model, tx, seen_vec=seen_vec)
    state = TrainState(params=params, opt_state=jax.jit(tx.init)(params),
                       step=jnp.zeros((), jnp.int32))
    return step, (state, batch, jax.random.PRNGKey(0))


def build_serving():
    import jax
    import numpy as np
    from zeroshotsemanticsegmentation_tpu.ops.metrics import (
        unseen_mask_vector)
    from zeroshotsemanticsegmentation_tpu.ops.szn_fused import (
        infer_labels_szn_fused)
    model, batch, params, embed = _common()
    unseen_vec = np.asarray(unseen_mask_vector(21, [1, 13]))

    @jax.jit
    def serve(params, x):
        f_raw, s_raw = model.apply({"params": params}, x, mode="raw")
        return infer_labels_szn_fused(f_raw, s_raw, embed, unseen_vec, (H, W))

    return serve, (params, batch["image"][:B_EVAL])


BUILDERS = {"train": build_train, "eval": build_eval,
            "seenmask": build_seenmask, "serving": build_serving}


_LOC_RE = re.compile(r'loc\("([^"]*)"')


def audit(name: str, lowered) -> dict:
    txt = lowered.as_text()
    sites = {}
    n = 0
    for line in txt.splitlines():
        if "stablehlo.dot_general" in line:
            n += 1
            m = _LOC_RE.search(line)
            key = m.group(1)[:200] if m else "(no loc)"
            sites[key] = sites.get(key, 0) + 1
    print(f"== {name}: {n} dot_general ops ==")
    for k, c in sorted(sites.items()):
        print(f"  x{c}  {k}")
    return {"dots": n, "sites": sorted(sites)}


def main(argv):
    import jax
    assert jax.default_backend() == "tpu", (
        "run under the TPU backend — on CPU, Pallas interpret mode inlines "
        "kernel bodies as real dots and the audit false-positives")
    # the audit is about the dot-free MODE (ops/dotpolicy.py) — pin it on,
    # whatever SZN_DOT_FREE says in this shell
    from zeroshotsemanticsegmentation_tpu.ops import dotpolicy
    dotpolicy.set_dot_free(True)
    progs = argv or ["train", "eval", "seenmask", "serving"]
    out = {}
    for p in progs:
        fn, args = BUILDERS[p]()
        out[p] = audit(p, fn.lower(*args))
    total = sum(v["dots"] for v in out.values())
    print(json.dumps({k: v["dots"] for k, v in out.items()}))
    with open("/tmp/audit_dots.json", "w") as f:
        json.dump(out, f, indent=1)
    return 1 if total else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
