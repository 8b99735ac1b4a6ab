#!/usr/bin/env python
"""Probe how the dependent-chain CONSUMPTION op changes serving throughput.

Motivation (round 4): bench.py's serving chain measured 6.0 MP/s while an
identical chain consuming labels via fp32 mean measured 125.4 MP/s in the
same healthy window (scripts/bisect_serving.py). The only differences are
the consumption ops. Variants:

  int_sum    acc += jnp.sum(lbl)                 (bench.py r2/r3 form)
  f32_mean   acc += mean(lbl.astype(f32))        (bisect form)
  f32_sum    acc += sum(lbl.astype(f32))
  int_slice  acc += lbl[0, 0, 0]                 (minimal consumption)

Each runs the FULL serving program (FCN32s raw + fused SZN) in a CHAIN-long
fori_loop, one jit, dedup-proof. One JSON line per variant.
"""

import json
import os.path as osp
import sys
import time

_REPO_ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

H = W = 512
CHAIN = 8
BATCH = 64


def main(argv):
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      osp.expanduser("~/.cache/zss_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    import numpy as np

    from zeroshotsemanticsegmentation_tpu.models import FCN32s
    from zeroshotsemanticsegmentation_tpu.ops.szn_fused import (
        infer_labels_szn_fused)
    from zeroshotsemanticsegmentation_tpu.ops.metrics import unseen_mask_vector
    from zeroshotsemanticsegmentation_tpu.data.assets import (
        load_class_embeddings)

    model = FCN32s(num_classes=20, dtype=jnp.bfloat16, fused_block1=True)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(BATCH, H, W, 3).astype(np.float32) * 40)
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x[:1],
                                        mode="both"))()["params"]
    embed = np.asarray(load_class_embeddings("pascal", 20), np.float32)
    unseen_vec = np.asarray(unseen_mask_vector(21, [1, 13]))

    CONSUME = {
        "int_sum": lambda lbl: jnp.sum(lbl).astype(jnp.float32),
        "f32_mean": lambda lbl: jnp.mean(lbl.astype(jnp.float32)),
        "f32_sum": lambda lbl: jnp.sum(lbl.astype(jnp.float32)),
        "int_slice": lambda lbl: lbl[0, 0, 0].astype(jnp.float32),
    }
    which = argv or list(CONSUME)

    for name in which:
        consume = CONSUME[name]

        def chain(params, x):
            def body(_, carry):
                x, acc = carry
                f_raw, s_raw = model.apply({"params": params}, x, mode="raw")
                lbl = infer_labels_szn_fused(f_raw, s_raw, embed, unseen_vec,
                                             (H, W))
                d = consume(lbl)
                return x + d * 1e-9, acc + d
            _, acc = jax.lax.fori_loop(0, CHAIN, body,
                                       (x, jnp.zeros((), jnp.float32)))
            return acc

        f = jax.jit(chain)
        f(params, x).block_until_ready()
        t0 = time.perf_counter()
        float(f(params, x))
        dt = (time.perf_counter() - t0) / CHAIN
        print(json.dumps({
            "consume": name, "ms_per_iter": round(dt * 1e3, 2),
            "mp_per_s": round(BATCH * H * W / dt / 1e6, 2)}), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
