#!/usr/bin/env python
"""Headline benchmark: end-to-end SZN zero-shot inference throughput.

Measures megapixels/second/chip for the flagship program — FCN-32s forward
(both heads, bfloat16) + fused NNE cosine inference with seenmask stitching —
on 512x512 inputs, matching BASELINE.json's north-star metric
(target: >= 50 MP/s/chip on TPU v5e; vs_baseline = value / 50).

Prints exactly one JSON line.
"""

import json
import os.path as osp
import sys
import time

_REPO_ROOT = osp.dirname(osp.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

BASELINE_MP_S = 50.0
H = W = 512
BATCH = 16  # throughput saturates at 16 on v5e (82.8 vs 76.2 MP/s at 8)
WARMUP = 3
ITERS = 30


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir",
                          osp.expanduser("~/.cache/zss_jax_cache"))
    except Exception:
        pass

    from zeroshotsemanticsegmentation_tpu.models import FCN32s
    from zeroshotsemanticsegmentation_tpu.ops import infer_labels_szn
    from zeroshotsemanticsegmentation_tpu.ops.metrics import unseen_mask_vector
    from zeroshotsemanticsegmentation_tpu.data.assets import (
        load_class_embeddings)

    model = FCN32s(num_classes=20, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(BATCH, H, W, 3).astype(np.float32) * 40)
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x[:1],
                                        mode="both"))()["params"]
    embed = jnp.asarray(load_class_embeddings("pascal", 20))
    unseen_vec = jnp.asarray(unseen_mask_vector(21, [1, 13]))

    @jax.jit
    def szn_infer(params, x):
        fcn_score, seenmask_score = model.apply({"params": params}, x,
                                                mode="both")
        return infer_labels_szn(fcn_score, seenmask_score, embed, unseen_vec)

    out = jax.block_until_ready(szn_infer(params, x))
    assert out.shape == (BATCH, H, W)
    for _ in range(WARMUP):
        out = szn_infer(params, x)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = szn_infer(params, x)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    mp_per_s = BATCH * H * W * ITERS / dt / 1e6
    print(json.dumps({
        "metric": "szn_inference_throughput",
        "value": round(mp_per_s, 2),
        "unit": "megapixels/sec/chip",
        "vs_baseline": round(mp_per_s / BASELINE_MP_S, 3),
    }))


if __name__ == "__main__":
    main()
