"""Is the closure-form bench number real, or a tunnel dedup hit?

Times the SAME chained serving program three ways:
  same-buf   — dispatch with the identical input buffers as warm-up
               (bench.py's current methodology)
  fresh-buf  — a new device buffer with identical VALUES each dispatch
  fresh-val  — a new buffer with different values each dispatch
If same-buf is much faster than fresh-*, the bench has been measuring the
tunnel's result cache, not the TPU.
"""
import sys, time, json
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/zss_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from zeroshotsemanticsegmentation_tpu.models import FCN32s
from zeroshotsemanticsegmentation_tpu.ops.szn_fused import infer_labels_szn_fused
from zeroshotsemanticsegmentation_tpu.ops.metrics import unseen_mask_vector
from zeroshotsemanticsegmentation_tpu.data.assets import load_class_embeddings

H = W = 512
BATCH = 16
CHAIN = 4

model = FCN32s(num_classes=20, dtype=jnp.bfloat16, fused_block1=True)
rng = np.random.RandomState(0)
x_np = rng.randn(BATCH, H, W, 3).astype(np.float32) * 40
x = jnp.asarray(x_np)
params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x[:1],
                                    mode="both"))()["params"]
embed = jnp.asarray(load_class_embeddings("pascal", 20))
unseen_vec = jnp.asarray(unseen_mask_vector(21, [1, 13]))

@jax.jit
def chained(params, x):
    def body(_, carry):
        x, acc = carry
        f_raw, s_raw = model.apply({"params": params}, x, mode="raw")
        lbl = infer_labels_szn_fused(f_raw, s_raw, embed, unseen_vec, (H, W))
        x = x + jnp.mean(lbl.astype(jnp.float32)) * 1e-6
        return x, acc + jnp.sum(lbl)
    _, acc = jax.lax.fori_loop(0, CHAIN, body, (x, jnp.zeros((), jnp.int32)))
    return acc

chained(params, x).block_until_ready()  # compile + warm

def mp_s(dt):
    return BATCH * H * W * CHAIN / dt / 1e6

# same buffer as warm-up
t0 = time.perf_counter(); int(chained(params, x)); dt = time.perf_counter() - t0
print(json.dumps({"case": "same-buf", "s": round(dt, 3), "mp_s": round(mp_s(dt), 1)}))

# fresh buffer, same values
x2 = jax.device_put(x_np)
t0 = time.perf_counter(); int(chained(params, x2)); dt = time.perf_counter() - t0
print(json.dumps({"case": "fresh-buf-same-vals", "s": round(dt, 3), "mp_s": round(mp_s(dt), 1)}))

# fresh buffer, different values
x3 = jax.device_put(x_np * 1.0001 + 0.001)
t0 = time.perf_counter(); int(chained(params, x3)); dt = time.perf_counter() - t0
print(json.dumps({"case": "fresh-vals", "s": round(dt, 3), "mp_s": round(mp_s(dt), 1)}))

# and again same buffer (post readbacks)
t0 = time.perf_counter(); int(chained(params, x)); dt = time.perf_counter() - t0
print(json.dumps({"case": "same-buf-again", "s": round(dt, 3), "mp_s": round(mp_s(dt), 1)}))
