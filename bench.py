#!/usr/bin/env python
"""Headline benchmark: end-to-end SZN zero-shot inference throughput.

Measures megapixels/second/chip for the flagship serving program — FCN-32s
forward (bfloat16) + fused projection/upsample/argmax Pallas kernel
(ops.szn_fused) — on 512x512 inputs, matching BASELINE.json's north-star
metric (target: >= 50 MP/s/chip on TPU v5e; vs_baseline = value / 50).

Methodology: N dependent iterations chained *inside one jit* (each step's
labels perturb the next input), timed around a single dispatch with a scalar
host fetch. This is immune to the two artifacts observed on this platform:
per-call RPC latency (~30 ms synchronized) and result-dedup of repeated
identical calls, which can fake arbitrarily high throughput.

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
BATCH = 32  # best measured batch on v5e (84 vs 78 MP/s at 16)
CHAIN = 8   # model evaluations per dispatch


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
    from zeroshotsemanticsegmentation_tpu.ops.szn_fused import (
        infer_labels_szn_fused)
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
    def chained(params, x):
        def body(_, carry):
            x, acc = carry
            f_raw, s_raw = model.apply({"params": params}, x, mode="raw")
            lbl = infer_labels_szn_fused(f_raw, s_raw, embed, unseen_vec,
                                         (H, W))
            # feed label statistics into the next input: no two iterations
            # are identical, so nothing can be deduplicated or DCE'd
            x = x + jnp.mean(lbl.astype(jnp.float32)) * 1e-6
            return x, acc + jnp.sum(lbl)
        _, acc = jax.lax.fori_loop(0, CHAIN, body,
                                   (x, jnp.zeros((), jnp.int32)))
        return acc

    acc = chained(params, x)
    acc.block_until_ready()  # compile + warm
    t0 = time.perf_counter()
    checksum = int(chained(params, x))  # scalar host fetch = full completion
    dt = (time.perf_counter() - t0) / CHAIN
    assert checksum != 0

    mp_per_s = BATCH * H * W / dt / 1e6
    print(json.dumps({
        "metric": "szn_inference_throughput",
        "value": round(mp_per_s, 2),
        "unit": "megapixels/sec/chip",
        "vs_baseline": round(mp_per_s / BASELINE_MP_S, 3),
    }))


if __name__ == "__main__":
    main()
