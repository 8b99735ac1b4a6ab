"""Cost of closed-over host-np constants vs device-array arguments on axon.

Hypothesis from the bench bisect: an HLO constant operand costs ~5-15 ms of
copy-start per EXECUTION on this platform (program-load staging at collapsed
bandwidth?), so a fori_loop body with np constants is far slower than the
same program taking the arrays as device arguments.
"""
import time, json, sys
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/zss_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

rng = np.random.RandomState(0)
const_np = rng.randn(21, 20).astype(np.float32)
x_np = rng.randn(8, 128, 128, 20).astype(np.float32)
x = jnp.asarray(x_np)
const_dev = jnp.asarray(const_np)
CHAIN = 32

def body_with(c):
    def body(_, carry):
        x, acc = carry
        e = c.astype(jnp.float32)
        n2 = jnp.sum(e * e, axis=1, keepdims=True)
        es = e / jnp.sqrt(jnp.where(n2 == 0, 1.0, n2))
        s = jnp.sum(x[..., None, :] * es, axis=-1)
        d = jnp.mean(s)
        return x + d * 1e-6, acc + d
    return body

@jax.jit
def f_const(x):
    _, acc = jax.lax.fori_loop(0, CHAIN, body_with(const_np),
                               (x, jnp.zeros((), jnp.float32)))
    return acc

@jax.jit
def f_arg(x, c):
    _, acc = jax.lax.fori_loop(0, CHAIN, body_with(c),
                               (x, jnp.zeros((), jnp.float32)))
    return acc

for name, call in [("np_const", lambda: f_const(x)),
                   ("dev_arg", lambda: f_arg(x, const_dev))]:
    call().block_until_ready()
    t0 = time.perf_counter(); float(call()); dt = time.perf_counter() - t0
    print(json.dumps({"case": name, "ms_per_iter": round(dt / CHAIN * 1e3, 3)}))
