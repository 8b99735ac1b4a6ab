"""Microbench: block-1 variants at B=16, 530^2 pre-padded input (512^2 image
support geometry). Dependent chains inside one jit per CLAUDE.md."""
import os.path as osp
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  osp.expanduser("~/.cache/zss_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import zeroshotsemanticsegmentation_tpu.ops.block1_fused as bf

B, HP, WP = 16, 530, 530
CHAIN = 20
rng = np.random.RandomState(0)
xp = jnp.asarray(rng.randn(B, HP, WP, 3).astype(np.float32) * 0.5,
                 jnp.bfloat16)
k1 = jnp.asarray(rng.randn(3, 3, 3, 64).astype(np.float32) * 0.1)
b1 = jnp.asarray(rng.randn(64).astype(np.float32) * 0.1)
k2 = jnp.asarray(rng.randn(3, 3, 64, 64).astype(np.float32) * 0.05)
b2 = jnp.asarray(rng.randn(64).astype(np.float32) * 0.1)


def _pack_k1_pairs(k1):
    z = jnp.zeros_like(k1[:, 0])
    cols = []
    for j in range(4):
        even = k1[:, j] if j < 3 else z
        odd = k1[:, j - 1] if j >= 1 else z
        cols.append(jnp.concatenate([even, odd], axis=-1))
    return jnp.stack(cols, axis=1)


def xla_c11_packed(xp, k1, b1):
    c11p = jax.lax.conv_general_dilated(
        xp, _pack_k1_pairs(k1).astype(jnp.bfloat16), (1, 2),
        ((0, 0), (0, 0)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jnp.maximum(c11p + jnp.concatenate([b1, b1]).astype(jnp.bfloat16),
                       0)


def timeit(name, fn, out_stat=jnp.sum):
    @jax.jit
    def chained(xp):
        def body(_, carry):
            x, acc = carry
            o = fn(x)
            x = x + (out_stat(o.astype(jnp.float32)) * 1e-9).astype(x.dtype)
            return x, acc + out_stat(o.astype(jnp.float32))
        _, acc = jax.lax.fori_loop(0, CHAIN, body, (xp, jnp.zeros(())))
        return acc
    acc = chained(xp)
    acc.block_until_ready()
    t0 = time.perf_counter()
    chained(xp).block_until_ready()
    dt = (time.perf_counter() - t0) / CHAIN * 1000
    print(f"{name:28s} {dt:7.2f} ms")


timeit("s2d_input only", lambda x: bf._s2d_input(x))
timeit("conv1_1_pairs (pallas)", lambda x: bf.conv1_1_pairs(x, k1, b1))
timeit("xla_c11_packed (old)", lambda x: xla_c11_packed(x, k1, b1))
timeit("fused_block1 (new)", lambda x: bf.fused_block1(x, k1, b1, k2, b2))
timeit("xla_block1 (plain)", lambda x: bf.xla_block1(x, k1, b1, k2, b2))
timeit("fused_block1_full (ONE krn)",
       lambda x: bf.fused_block1_full(x, k1, b1, k2, b2))
