#!/usr/bin/env python
"""Measure stage-2 (trained-upscore) serving vs the pristine bilinear gate.

bench.py's headline measures the PRISTINE route (fused kernel upsamples the
seenmask gate with fixed bilinear taps). After the reference's stage 2 the
`seenmask_upscore` kernel is trained, so production test_all serving takes
the TRAINED route (serving.py): the gate goes through the model's own
ConvTranspose at full res and the class argmax runs as TWO fused-kernel
calls (always-seen + always-unseen partitions) stitched by the gate.

Same dependent-chain methodology as bench.py (device closures, one scalar
fetch per timed dispatch). Prints one JSON line with both numbers.
"""

import json
import os.path as osp
import sys
import time

_REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

H = W = 512
BATCH = 64
CHAIN = 8


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir",
                          osp.expanduser("~/.cache/zss_jax_cache"))
    except Exception:
        pass

    from zeroshotsemanticsegmentation_tpu.data.assets import (
        load_class_embeddings)
    from zeroshotsemanticsegmentation_tpu.models import FCN32s
    from zeroshotsemanticsegmentation_tpu.ops.bilinear import (
        upscore_conv_transpose_cropped)
    from zeroshotsemanticsegmentation_tpu.ops.metrics import (
        unseen_mask_vector)
    from zeroshotsemanticsegmentation_tpu.ops.szn_fused import (
        infer_labels_szn_fused)

    model = FCN32s(num_classes=20, dtype=jnp.bfloat16, fused_block1=True)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(BATCH, H, W, 3).astype(np.float32) * 40)
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x[:1],
                                        mode="both"))()["params"]
    # a trained (drifted) upscore kernel — forces the exact-gate route
    up = np.asarray(params["seenmask_upscore"]["kernel"])
    up_trained = jnp.asarray(
        up + 0.01 * rng.randn(*up.shape).astype(np.float32))
    embed = jnp.asarray(load_class_embeddings("pascal", 20))
    unseen_vec = jnp.asarray(unseen_mask_vector(21, [1, 13]))

    def label_pristine(f_raw, s_raw):
        return infer_labels_szn_fused(f_raw, s_raw, embed, unseen_vec, (H, W))

    def label_trained(f_raw, s_raw):
        # serving.py's trained route, verbatim semantics
        gate = upscore_conv_transpose_cropped(
            s_raw.astype(jnp.float32), up_trained.astype(jnp.float32),
            stride=32, crop_offset=19, out_h=H, out_w=W)
        pixel_unseen = jnp.argmax(gate, axis=-1) == 0
        seen_lbl = infer_labels_szn_fused(
            f_raw, jnp.zeros_like(s_raw).at[..., 1].set(1.0), embed,
            unseen_vec, (H, W))
        unseen_lbl = infer_labels_szn_fused(
            f_raw, jnp.zeros_like(s_raw).at[..., 0].set(1.0), embed,
            unseen_vec, (H, W))
        return jnp.where(pixel_unseen, unseen_lbl, seen_lbl)

    def measure(label_fn):
        @jax.jit
        def chained(params, x):
            def body(_, carry):
                x, acc = carry
                f_raw, s_raw = model.apply({"params": params}, x, mode="raw")
                lbl = label_fn(f_raw, s_raw)
                x = x + jnp.mean(lbl.astype(jnp.float32)) * 1e-6
                return x, acc + jnp.sum(lbl)
            _, acc = jax.lax.fori_loop(0, CHAIN, body,
                                       (x, jnp.zeros((), jnp.int32)))
            return acc

        chained(params, x).block_until_ready()  # compile + warm
        t0 = time.perf_counter()
        checksum = int(chained(params, x))
        dt = (time.perf_counter() - t0) / CHAIN
        assert checksum != 0
        return BATCH * H * W / dt / 1e6

    pristine = measure(label_pristine)
    trained = measure(label_trained)
    print(json.dumps({
        "metric": "szn_trained_gate_serving",
        "pristine_mp_s": round(pristine, 2),
        "trained_mp_s": round(trained, 2),
        "trained_over_pristine": round(trained / pristine, 4),
        "batch": BATCH, "hw": H,
    }))


if __name__ == "__main__":
    main()
