#!/usr/bin/env python
"""Re-measure the stage-2 (seenmask) train step after the trainable
seenmask_upscore change (round 4): the step now differentiates and updates
the full-res ConvTranspose kernel (reference train.py:168-171,304-307), so
the committed 22.5 ms @ B=24 number (commit e9f2873, frozen-upscore model)
needs a fresh measurement.

Methodology = bench.py --train: CHAIN dependent steps inside one jit
(donated state), every aux kept alive, scalar host fetch, warm run timed.
Prints one JSON line.
"""

import functools
import json
import os.path as osp
import sys
import time

_REPO = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

BATCH = 24
H = W = 512
CHAIN = 8


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          osp.expanduser("~/.cache/zss_jax_cache"))
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    from zeroshotsemanticsegmentation_tpu.models import FCN32s
    from zeroshotsemanticsegmentation_tpu.ops.metrics import (
        unseen_mask_vector)
    from zeroshotsemanticsegmentation_tpu.train import (
        make_seenmask_optimizer)
    from zeroshotsemanticsegmentation_tpu.train.state import TrainState
    from zeroshotsemanticsegmentation_tpu.train.steps import (
        make_seenmask_train_step)

    model = FCN32s(num_classes=20, dtype=jnp.bfloat16, fused_block1=True)
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.randn(BATCH, H, W, 3).astype(np.float32)
                             * 40),
        "label": jnp.asarray(
            rng.randint(-1, 21, (BATCH, H, W)).astype(np.int32)),
        "sizes": jnp.asarray(np.full((BATCH, 2), H, np.int32)),
        "num_real": jnp.asarray(BATCH, jnp.int32),
    }
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0),
                                        batch["image"][:1],
                                        mode="both"))()["params"]
    seen_vec = np.asarray(~unseen_mask_vector(21, [1, 13]))
    tx = make_seenmask_optimizer(params, lr=1e-5)
    step = make_seenmask_train_step(model, tx, seen_vec=seen_vec)
    state0 = TrainState(params=params, opt_state=jax.jit(tx.init)(params),
                        step=jnp.zeros((), jnp.int32))
    key = jax.random.PRNGKey(0)

    @functools.partial(jax.jit, donate_argnums=0)
    def chained(state, batch):
        def body(_, carry):
            st, acc = carry
            st, aux = step(st, batch, key)
            acc = (acc + aux["loss"]
                   + jnp.sum(aux["hist"]).astype(jnp.float32)
                   + aux["seenmask_grad_sum"] + aux["score_sum"] * 1e-9)
            return st, acc
        st, acc = jax.lax.fori_loop(
            0, CHAIN, body, (state, jnp.zeros((), jnp.float32)))
        return st, acc

    st, acc = chained(state0, batch)
    acc.block_until_ready()
    t0 = time.perf_counter()
    _, acc = chained(st, batch)
    checksum = float(acc)
    dt = (time.perf_counter() - t0) / CHAIN
    assert np.isfinite(checksum)

    print(json.dumps({
        "metric": "seenmask_train_step",
        "step_ms": round(dt * 1e3, 2),
        "img_per_s": round(BATCH / dt, 1),
        "batch": BATCH,
        "chain": CHAIN,
    }))


if __name__ == "__main__":
    main()
