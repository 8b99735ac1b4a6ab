#!/usr/bin/env python
"""Platform health control: a trivial conv-chain microbench with NONE of the
repo's code — no Pallas, no dots, no device constants.

Purpose: separate code regressions from axon-tunnel/chip degradation before
trusting ANY benchmark number (the round-3 judge measured this control at
0.1 TFLOP/s against a 197 TFLOP/s v5e peak — a ~1000x-degraded platform —
which made the round's committed numbers unusable). Run this FIRST; if it
reports sick, record the evidence and do not tune against the chip.

Prints one JSON line: {"healthy": bool, "tflops": N, "peak": 197.0, ...}.
Healthy threshold: >= 20 TFLOP/s (a plain NHWC 3x3 conv chain at 256x256x256
reaches 60-120 TFLOP/s on a healthy v5e; anything under 20 means the
platform, not the code, is the bottleneck).
"""

import json
import os.path as osp
import sys
import time

_REPO_ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def main():
    import jax
    # persistent compile cache: without it every run pays a ~4 min remote
    # compile; with it repeat runs are seconds (same setup as bench.py)
    jax.config.update("jax_compilation_cache_dir",
                      osp.expanduser("~/.cache/zss_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    import numpy as np

    dev = jax.devices()[0]
    B, H, W, C = 8, 256, 256, 256
    K = 3
    CHAIN = 20

    # host-np constants only (inlined literals — exempt from the H2D
    # collapse triggers, see CLAUDE.md)
    import ml_dtypes
    rng = np.random.default_rng(0)
    w_np = (rng.standard_normal((K, K, C, C)) * 0.01).astype(ml_dtypes.bfloat16)
    x_np = rng.standard_normal((B, H, W, C)).astype(ml_dtypes.bfloat16)

    def chain(x, s):
        # s perturbs the input so repeat dispatches are never
        # buffer-identical (the tunnel dedups identical calls, CLAUDE.md)
        x = x * (1.0 + s * 1e-6).astype(x.dtype)
        w = jnp.asarray(w_np)
        for _ in range(CHAIN):
            x = jax.lax.conv_general_dilated(
                x, w, window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = jnp.tanh(x)  # keep the chain dependent, non-foldable
        return jnp.sum(x.astype(jnp.float32))

    f = jax.jit(chain)
    x = jax.device_put(x_np, dev)
    # warm (compile + first run)
    t0 = time.perf_counter()
    float(f(x, jnp.float32(0.0)))
    compile_s = time.perf_counter() - t0

    times = []
    for i in range(3):
        s = jnp.float32(1.0 + i)
        t0 = time.perf_counter()
        float(f(x, s))
        times.append(time.perf_counter() - t0)
    dt = min(times)

    flops = 2.0 * B * H * W * C * C * K * K * CHAIN
    tflops = flops / dt / 1e12
    peak = 197.0
    out = {
        "healthy": bool(tflops >= 20.0),
        "tflops": round(tflops, 2),
        "peak": peak,
        "frac_peak": round(tflops / peak, 4),
        "best_s": round(dt, 4),
        "all_s": [round(t, 4) for t in times],
        "compile_s": round(compile_s, 1),
        "device": str(dev),
    }
    print(json.dumps(out))
    return 0 if out["healthy"] else 1


if __name__ == "__main__":
    sys.exit(main())
