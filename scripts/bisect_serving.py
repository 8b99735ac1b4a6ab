#!/usr/bin/env python
"""Bisect the serving pipeline: time each component as its own dependent
chain so the 126.4 (round 2) vs 6.0 MP/s (round 4 start) serving gap can be
attributed. Components:

  forward   — FCN32s.apply(mode="raw") alone (the FLOPs: ~360 GFLOP/img)
  fused     — infer_labels_szn_fused alone on precomputed raw heads
  e2e       — forward + fused (bench.py's serving program)

Each is a CHAIN-long dependent fori_loop inside one jit (dedup/DCE-proof,
same methodology as bench.py). Prints one JSON line per component.

Usage: python scripts/bisect_serving.py [forward fused e2e] [--batch N]
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


def main(argv):
    batch = 64
    if "--batch" in argv:
        i = argv.index("--batch")
        batch = int(argv[i + 1])
        del argv[i:i + 2]
    which = [a for a in argv if not a.startswith("-")] or [
        "forward", "fused", "e2e"]

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
    x = jnp.asarray(rng.randn(batch, H, W, 3).astype(np.float32) * 40)
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x[:1],
                                        mode="both"))()["params"]
    embed = np.asarray(load_class_embeddings("pascal", 20), np.float32)
    unseen_vec = np.asarray(unseen_mask_vector(21, [1, 13]))

    def time_chain(fn, *args):
        f = jax.jit(fn)
        f(*args).block_until_ready()  # compile + warm
        t0 = time.perf_counter()
        float(f(*args))
        return (time.perf_counter() - t0) / CHAIN

    results = {}

    if "forward" in which:
        def fwd_chain(params, x):
            def body(_, carry):
                x, acc = carry
                f_raw, s_raw = model.apply({"params": params}, x, mode="raw")
                d = (jnp.mean(f_raw.astype(jnp.float32))
                     + jnp.mean(s_raw.astype(jnp.float32)))
                return x + d * 1e-6, acc + d
            _, acc = jax.lax.fori_loop(0, CHAIN, body,
                                       (x, jnp.zeros((), jnp.float32)))
            return acc
        dt = time_chain(fwd_chain, params, x)
        results["forward"] = dt

    if "fused" in which:
        f_raw, s_raw = jax.jit(
            lambda p, x: model.apply({"params": p}, x, mode="raw"))(params, x)
        f_raw = jax.block_until_ready(f_raw)

        def fused_chain(f_raw, s_raw):
            def body(_, carry):
                f, acc = carry
                lbl = infer_labels_szn_fused(f, s_raw, embed, unseen_vec,
                                             (H, W))
                d = jnp.mean(lbl.astype(jnp.float32))
                return f + (d * 1e-6).astype(f.dtype), acc + d
            _, acc = jax.lax.fori_loop(0, CHAIN, body,
                                       (f_raw, jnp.zeros((), jnp.float32)))
            return acc
        dt = time_chain(fused_chain, f_raw, s_raw)
        results["fused"] = dt

    if "e2e" in which:
        def e2e_chain(params, x):
            def body(_, carry):
                x, acc = carry
                f_raw, s_raw = model.apply({"params": params}, x, mode="raw")
                lbl = infer_labels_szn_fused(f_raw, s_raw, embed, unseen_vec,
                                             (H, W))
                d = jnp.mean(lbl.astype(jnp.float32))
                return x + d * 1e-6, acc + d
            _, acc = jax.lax.fori_loop(0, CHAIN, body,
                                       (x, jnp.zeros((), jnp.float32)))
            return acc
        dt = time_chain(e2e_chain, params, x)
        results["e2e"] = dt

    for name, dt in results.items():
        print(json.dumps({
            "component": name, "batch": batch, "chain": CHAIN,
            "ms_per_iter": round(dt * 1e3, 2),
            "mp_per_s": round(batch * H * W / dt / 1e6, 2),
        }))


if __name__ == "__main__":
    main(sys.argv[1:])
