#!/usr/bin/env python
"""Bisect the H2D-collapse trigger (axon TPU tunnel platform quirk).

Finding so far (CLAUDE.md): executing ONE training program (forward+backward)
permanently drops host->device bandwidth for the process from ~1.6 GB/s to
~40 MB/s; forward-only programs don't trigger it. This probe runs ONE
candidate program in a fresh process and measures H2D bandwidth before and
after, to bisect WHICH backward construct trips the collapse:

    python scripts/probe_h2d.py <mode>

modes:
  none     no program at all (tunnel baseline)
  fwd      FCN32s forward B=4 512^2 (known-good control)
  matmul   grad of a big dense matmul (no convs)
  conv     grad of one 3x3 conv (input+weight grads, C=64, 258^2)
  convw    weight-grad only of that conv (input grad not built)
  ss       grad of a 2x2 max pool (select-and-scatter alone)
  head     seenmask stage-2 step B=4 (head-only backward)
  tiny     full fcn train step B=2 at 128^2
  full     full fcn train step B=8 at 512^2

Each mode prints one JSON line: {"mode", "bw_before_mbs", "bw_after_mbs",
"collapsed": bool}. Run every mode via `--all` (spawns subprocesses — the
collapse is per-process-permanent so each probe needs a fresh one).
"""

import json
import os.path as osp
import subprocess
import sys
import time

_REPO_ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

MODES = ("none", "fwd", "matmul", "conv", "convw", "ss", "head", "tiny",
         "full",
         # round-2 narrowing: `matmul` collapsed, `conv`/`convw`/`ss` did
         # NOT — the old "backward pass" theory is dead. These bisect what
         # it is about the matmul-grad program that trips the tunnel.
         "mm_fwd",      # sum(a@w) forward only, fp32 4096^2
         "mm_notanh",   # grad of sum(a@w): backward is a^T @ ones
         "mm_bf16",     # the collapsing program with bf16 operands
         "mm_small",    # 1024^2 fp32 grad (footprint 1/16)
         "mm_highest",  # fp32 4096^2 fwd @ Precision.HIGHEST (loss-style)
         "fwd_loss",    # FCN fwd + cos loss value, no grad
         # round-3 narrowing: ALL dot-containing programs collapsed, all
         # conv-only programs didn't. Presence-vs-size, dot-as-conv
         # (mitigation candidate), compile-vs-execute.
         "mm_tiny",     # one 8x8 dot — presence, not FLOPs/footprint
         "mm_as_conv",  # the 4096^2 contraction as a 1x1 conv
         "mm_compile",  # AOT-compile the 4096^2 dot, never execute
         # round-4 narrowing: separate trigger (A) "executing a dot" from
         # (B) "fresh remote-compile RPC". conv_compile has no dot anywhere;
         # rerunning mm_compile/mm_tiny on a warm cache removes (B).
         "conv_compile",  # AOT-compile a fresh conv-only program
         "pallas_dot",    # execute a Pallas kernel whose body is a matmul
         # round-5 (dot-free rewrite acceptance): the production programs
         # after every XLA dot was replaced by conv / multiply-reduce /
         # Pallas twins (ops/dotless.py, ops/bilinear.py, ops/pdot.py).
         "serve",         # fused SZN serving program (B=8 512²)
         # round-6: `full` STILL collapsed with 0 stablehlo.dot_general —
         # bisect the dot-free train step's building blocks (fresh process
         # each). Candidates: algsimp re-deriving dots from multiply-reduce,
         # the Pallas pdot at production shape, the 49-tap scatter
         # overlap-add, losses, metrics, the elementwise upsample, adam.
         "mr",            # proj_rows multiply-reduce (B=8 512² x 21x20)
         "sel",           # select_rows one-hot multiply-reduce
         "upsamp",        # elementwise bilinear upsample fwd+vjp
         "pdot_big",      # ops.pdot at the fc6-igrad production shape
         "olap",          # conv_valid_mmgrad backward (pdot + overlap-add)
         "ce_grad",       # cross_entropy2d grad (log_softmax + one-hot)
         "cos_grad",      # cosine_loss grad (double-where norms)
         "cm",            # confusion_matrix one-hot reduction
         "adam",          # optax adam update on FCN-sized params
         # round-7: micro-bisect the round-6 contradictions. pdot_big
         # collapsed but the same call inside `olap` didn't; ce/cos grads
         # collapsed with no source dot; `serve` collapsed though all its
         # pieces probed clean.
         "pdot_nopad",    # pdot at aligned shapes — no jnp.pad/slice
         "pdot_repeat",   # pdot_big twice in one process (determinism)
         "sumprod",       # jnp.sum(s*t, -1) forward alone (8,512²,21)
         "sumprod_grad",  # grad of sum(tanh(sum(s*t,-1)))
         "l2norm_grad",   # _l2_normalize + grad (double-where norms)
         "logsm_grad",    # grad of masked log_softmax sum (no one-hot)
         "ce_fwd",        # cross_entropy2d forward only
         "cos_fwd")       # cosine_loss forward only


def measure_bw(nbytes: int = 25 * 1024 * 1024, reps: int = 3) -> float:
    """Median H2D bandwidth (MB/s) for one ~25 MB uint8 transfer."""
    import jax
    import numpy as np
    host = np.random.randint(0, 255, (nbytes,), np.uint8)
    times = []
    for i in range(reps):
        host[0] = i  # never bit-identical (dedup immunity)
        t0 = time.perf_counter()
        jax.block_until_ready(jax.device_put(host))
        times.append(time.perf_counter() - t0)
    return nbytes / sorted(times)[len(times) // 2] / 1e6


def run_program(mode: str) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    rng = np.random.RandomState(0)

    if mode == "none":
        return
    if mode == "fwd":
        from zeroshotsemanticsegmentation_tpu.models import FCN32s
        model = FCN32s(num_classes=20, dtype=jnp.bfloat16)
        x = jnp.asarray(rng.randn(4, 512, 512, 3).astype(np.float32))
        params = jax.jit(lambda: model.init(
            jax.random.PRNGKey(0), x[:1], mode="both"))()["params"]
        out = jax.jit(lambda p, x: model.apply(
            {"params": p}, x, mode="raw"))(params, x)
        jax.block_until_ready(out)
        return
    if mode == "matmul":
        a = jnp.asarray(rng.randn(4096, 4096).astype(np.float32))

        def f(w):
            return jnp.sum(jnp.tanh(a @ w))

        g = jax.jit(jax.grad(f))(a)
        jax.block_until_ready(g)
        return
    if mode == "pallas_dot":
        from jax.experimental import pallas as pl

        def kern(a_ref, b_ref, o_ref):
            o_ref[...] = jnp.dot(a_ref[...], b_ref[...],
                                 preferred_element_type=jnp.float32)

        a = jnp.asarray(rng.randn(512, 512).astype(np.float32))
        out = jax.jit(lambda a, b: pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((512, 512), jnp.float32),
        )(a, b))(a, a)
        jax.block_until_ready(out)
        return
    if mode.startswith("mm_") or mode == "conv_compile":
        if mode == "mm_tiny":
            a = jnp.asarray(rng.randn(8, 8).astype(np.float32))
            jax.block_until_ready(jax.jit(lambda w: a @ w)(a))
            return
        if mode == "mm_as_conv":
            a = jnp.asarray(rng.randn(4096, 4096).astype(np.float32))

            def f(w):
                y = jax.lax.conv_general_dilated(
                    a.reshape(1, 64, 64, 4096), w.reshape(1, 1, 4096, 4096),
                    (1, 1), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return jnp.sum(y)

            jax.block_until_ready(jax.jit(f)(a))
            return
        if mode == "mm_compile":
            a = jnp.asarray(rng.randn(4096, 4096).astype(np.float32))
            jax.jit(lambda w: jnp.sum(a @ w)).lower(a).compile()
            return
        if mode == "conv_compile":
            x = jnp.asarray(rng.randn(3, 131, 137, 48).astype(np.float32))
            k = jnp.asarray(rng.randn(5, 5, 48, 56).astype(np.float32))

            def f(x, k):
                y = jax.lax.conv_general_dilated(
                    x, k, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return jnp.sum(jnp.maximum(y, 0))

            jax.jit(f).lower(x, k).compile()
            return
        n = 1024 if mode == "mm_small" else 4096
        dt = np.float16 if mode == "mm_bf16" else np.float32
        a = jnp.asarray(rng.randn(n, n).astype(dt))
        if mode == "mm_bf16":
            a = a.astype(jnp.bfloat16)

        if mode == "mm_fwd":
            out = jax.jit(lambda w: jnp.sum(a @ w))(a)
        elif mode == "mm_highest":
            out = jax.jit(lambda w: jnp.sum(
                jax.lax.dot(a, w,
                            precision=jax.lax.Precision.HIGHEST)))(a)
        elif mode == "mm_notanh":
            out = jax.jit(jax.grad(lambda w: jnp.sum(a @ w)))(a)
        else:  # mm_small / mm_bf16: the full collapsing program
            out = jax.jit(jax.grad(lambda w: jnp.sum(jnp.tanh(a @ w))))(a)
        jax.block_until_ready(out)
        return
    if mode == "fwd_loss":
        from zeroshotsemanticsegmentation_tpu.models import FCN32s
        from zeroshotsemanticsegmentation_tpu.data.assets import (
            load_class_embeddings)
        from zeroshotsemanticsegmentation_tpu.ops.losses import cosine_loss
        model = FCN32s(num_classes=20, dtype=jnp.bfloat16)
        x = jnp.asarray(rng.randn(4, 512, 512, 3).astype(np.float32))
        lbl = jnp.asarray(rng.randint(-1, 20, (4, 512, 512)), jnp.int32)
        emb = jnp.asarray(load_class_embeddings("pascal", 20))
        params = jax.jit(lambda: model.init(
            jax.random.PRNGKey(0), x[:1], mode="both"))()["params"]

        def f(p, x, lbl):
            score = model.apply({"params": p}, x, mode="fcn")
            onehot = jax.nn.one_hot(jnp.clip(lbl, 0, None), emb.shape[0],
                                    dtype=jnp.float32)
            tgt = jnp.einsum("bhwn,nd->bhwd", onehot, emb,
                             precision=jax.lax.Precision.HIGHEST)
            return cosine_loss(score, lbl, tgt)

        out = jax.jit(f)(params, x, lbl)
        jax.block_until_ready(out)
        return
    if mode in ("conv", "convw"):
        x = jnp.asarray(rng.randn(4, 258, 258, 64).astype(np.float32))
        k = jnp.asarray(rng.randn(3, 3, 64, 64).astype(np.float32) * 0.01)

        def f(k, x):
            y = jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jnp.sum(jnp.maximum(y, 0))

        if mode == "conv":
            g = jax.jit(jax.grad(f, argnums=(0, 1)))(k, x)
        else:
            g = jax.jit(jax.grad(f))(k, x)
        jax.block_until_ready(g)
        return
    if mode == "ss":
        x = jnp.asarray(rng.randn(4, 258, 258, 64).astype(np.float32))

        def f(x):
            y = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                "VALID")
            return jnp.sum(y)

        g = jax.jit(jax.grad(f))(x)
        jax.block_until_ready(g)
        return

    if mode in ("pdot_nopad", "pdot_repeat"):
        from zeroshotsemanticsegmentation_tpu.ops.pdot import pdot
        if mode == "pdot_nopad":
            a = jnp.asarray(rng.randn(2048, 4096).astype(np.float32),
                            jnp.bfloat16)
            b2 = jnp.asarray(rng.randn(4096, 25088).astype(np.float32),
                             jnp.bfloat16)
            jax.block_until_ready(pdot(a, b2, out_dtype=jnp.float32))
            return
        a = jnp.asarray(rng.randn(2312, 4096).astype(np.float32),
                        jnp.bfloat16)
        b2 = jnp.asarray(rng.randn(4096, 25088).astype(np.float32),
                         jnp.bfloat16)
        jax.block_until_ready(pdot(a, b2, out_dtype=jnp.float32))
        mid = measure_bw()
        print(json.dumps({"mode": "pdot_repeat/mid", "bw_mid_mbs":
                          round(mid, 1)}), flush=True)
        jax.block_until_ready(pdot(a * 2, b2, out_dtype=jnp.float32))
        return
    if mode in ("sumprod", "sumprod_grad", "l2norm_grad",
                "logsm_grad", "ce_fwd", "cos_fwd"):
        from zeroshotsemanticsegmentation_tpu.ops.losses import (
            _l2_normalize, cosine_loss, cross_entropy2d)
        s = jnp.asarray(rng.randn(8, 512, 512, 21).astype(np.float32))
        t = jnp.asarray(rng.randn(8, 512, 512, 21).astype(np.float32))
        lbl = jnp.asarray(rng.randint(-1, 21, (8, 512, 512)), jnp.int32)
        if mode == "sumprod":
            out = jax.jit(lambda s, t: jnp.sum(s * t, -1))(s, t)
        elif mode == "sumprod_grad":
            out = jax.jit(jax.grad(
                lambda s: jnp.sum(jnp.tanh(jnp.sum(s * t, -1)))))(s)
        elif mode == "l2norm_grad":
            out = jax.jit(jax.grad(
                lambda s: jnp.sum(jnp.tanh(_l2_normalize(s)))))(s)
        elif mode == "logsm_grad":
            out = jax.jit(jax.grad(
                lambda s: jnp.sum(jax.nn.log_softmax(s, -1) * 1e-3)))(s)
        elif mode == "ce_fwd":
            out = jax.jit(lambda s: cross_entropy2d(s, lbl))(s)
        else:
            out = jax.jit(lambda s: cosine_loss(s, lbl, t))(s)
        jax.block_until_ready(out)
        return
    if mode == "mr":
        from zeroshotsemanticsegmentation_tpu.ops.dotless import proj_rows
        s = jnp.asarray(rng.randn(8, 512, 512, 21).astype(np.float32))
        e = jnp.asarray(rng.randn(21, 21).astype(np.float32))
        jax.block_until_ready(jax.jit(proj_rows)(s, e))
        return
    if mode == "sel":
        from zeroshotsemanticsegmentation_tpu.ops.dotless import select_rows
        lbl = jnp.asarray(rng.randint(0, 21, (8, 512, 512)), jnp.int32)
        e = jnp.asarray(rng.randn(21, 20).astype(np.float32))
        jax.block_until_ready(jax.jit(select_rows)(lbl, e))
        return
    if mode == "upsamp":
        from zeroshotsemanticsegmentation_tpu.ops.bilinear import (
            upsample_bilinear_cropped)
        x = jnp.asarray(rng.randn(8, 17, 17, 21).astype(np.float32))

        def f(x):
            y = upsample_bilinear_cropped(x, stride=32, kernel_size=64,
                                          crop_offset=19, out_h=512,
                                          out_w=512)
            return jnp.sum(jnp.tanh(y * 1e-3))

        jax.block_until_ready(jax.jit(jax.grad(f))(x))
        return
    if mode == "pdot_big":
        from zeroshotsemanticsegmentation_tpu.ops.pdot import pdot
        a = jnp.asarray(rng.randn(2312, 4096).astype(np.float32),
                        jnp.bfloat16)
        b2 = jnp.asarray(rng.randn(4096, 25088).astype(np.float32),
                         jnp.bfloat16)
        jax.block_until_ready(pdot(a, b2, out_dtype=jnp.float32))
        return
    if mode == "olap":
        from zeroshotsemanticsegmentation_tpu.ops.conv7x7 import (
            conv_valid_mmgrad)
        x = jnp.asarray(rng.randn(8, 23, 23, 512).astype(np.float32),
                        jnp.bfloat16)
        k = jnp.asarray(rng.randn(7, 7, 512, 4096).astype(np.float32) * .01,
                        jnp.bfloat16)

        def f(x, k):
            return jnp.sum(conv_valid_mmgrad(x, k).astype(jnp.float32))

        jax.block_until_ready(jax.jit(jax.grad(f, argnums=(0, 1)))(x, k))
        return
    if mode in ("ce_grad", "cos_grad"):
        from zeroshotsemanticsegmentation_tpu.ops.losses import (
            cosine_loss, cross_entropy2d)
        s = jnp.asarray(rng.randn(8, 512, 512, 21).astype(np.float32))
        lbl = jnp.asarray(rng.randint(-1, 21, (8, 512, 512)), jnp.int32)

        def f(s):
            if mode == "ce_grad":
                return cross_entropy2d(s, lbl)
            t = jnp.asarray(rng.randn(8, 512, 512, 21).astype(np.float32))
            return cosine_loss(s, lbl, t)

        jax.block_until_ready(jax.jit(jax.grad(f))(s))
        return
    if mode == "cm":
        from zeroshotsemanticsegmentation_tpu.ops.metrics import (
            confusion_matrix)
        lt = jnp.asarray(rng.randint(-1, 21, (8, 512, 512)), jnp.int32)
        lp = jnp.asarray(rng.randint(0, 21, (8, 512, 512)), jnp.int32)
        jax.block_until_ready(
            jax.jit(lambda a, b: confusion_matrix(a, b, 21))(lt, lp))
        return
    if mode == "adam":
        import optax
        params = {f"p{i}": jnp.asarray(rng.randn(256, 256, 3, 3)
                                       .astype(np.float32))
                  for i in range(8)}
        tx = optax.adam(1e-4)
        opt_state = jax.jit(tx.init)(params)
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        jax.block_until_ready(
            jax.jit(lambda g, s, p: tx.update(g, s, p))(
                grads, opt_state, params))
        return
    if mode == "serve":
        from zeroshotsemanticsegmentation_tpu.models import FCN32s
        from zeroshotsemanticsegmentation_tpu.ops.szn_fused import (
            infer_labels_szn_fused)
        from zeroshotsemanticsegmentation_tpu.ops.metrics import (
            unseen_mask_vector)
        from zeroshotsemanticsegmentation_tpu.data.assets import (
            load_class_embeddings)
        model = FCN32s(num_classes=20, dtype=jnp.bfloat16, fused_block1=True)
        x = jnp.asarray(rng.randn(8, 512, 512, 3).astype(np.float32) * 40)
        params = jax.jit(lambda: model.init(
            jax.random.PRNGKey(0), x[:1], mode="both"))()["params"]
        embed = jnp.asarray(load_class_embeddings("pascal", 20))
        unseen_vec = jnp.asarray(unseen_mask_vector(21, [1, 13]))

        @jax.jit
        def serve(params, x):
            f_raw, s_raw = model.apply({"params": params}, x, mode="raw")
            return infer_labels_szn_fused(f_raw, s_raw, embed, unseen_vec,
                                          (512, 512))

        jax.block_until_ready(serve(params, x))
        return

    # trainer-step modes
    from zeroshotsemanticsegmentation_tpu.models import FCN32s
    from zeroshotsemanticsegmentation_tpu.data.assets import (
        load_class_embeddings)
    from zeroshotsemanticsegmentation_tpu.train import make_fcn_optimizer
    from zeroshotsemanticsegmentation_tpu.train.optim import (
        make_seenmask_optimizer)
    from zeroshotsemanticsegmentation_tpu.train.state import TrainState
    from zeroshotsemanticsegmentation_tpu.train.steps import (
        make_fcn_train_step, make_seenmask_train_step)
    from zeroshotsemanticsegmentation_tpu.ops.metrics import (
        unseen_mask_vector)

    b, hw = {"head": (4, 512), "tiny": (2, 128), "full": (8, 512)}[mode]
    model = FCN32s(num_classes=20, dtype=jnp.bfloat16)
    batch = {
        "image": jnp.asarray(rng.randn(b, hw, hw, 3).astype(np.float32)),
        "label": jnp.asarray(rng.randint(-1, 21, (b, hw, hw)), jnp.int32),
        "sizes": jnp.asarray(np.full((b, 2), hw, np.int32)),
        "num_real": jnp.asarray(b, jnp.int32),
    }
    params = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), batch["image"][:1], mode="both"))()["params"]
    if mode == "head":
        seen_vec = 1.0 - jnp.asarray(
            unseen_mask_vector(21, [1, 13]), jnp.float32)
        tx = make_seenmask_optimizer(params, lr=1e-3)
        step = make_seenmask_train_step(model, tx, seen_vec=seen_vec)
    else:
        embed = jnp.asarray(load_class_embeddings("pascal", 20))
        tx = make_fcn_optimizer(params, optim="adam", lr=1e-5)
        step = make_fcn_train_step(model, tx, loss_name="cos",
                                   num_classes=21, embeddings=embed)
    state = TrainState(params=params, opt_state=jax.jit(tx.init)(params),
                       step=jnp.zeros((), jnp.int32))
    state, aux = step(state, batch, jax.random.PRNGKey(0))
    jax.block_until_ready(aux["loss"])


def probe(mode: str) -> dict:
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      osp.expanduser("~/.cache/zss_jax_cache"))
    before = measure_bw()
    run_program(mode)
    after = measure_bw()
    return {"mode": mode, "bw_before_mbs": round(before, 1),
            "bw_after_mbs": round(after, 1),
            "collapsed": after < before / 4}


def main() -> None:
    if len(sys.argv) < 2 or sys.argv[1] == "--all" or len(sys.argv) > 2:
        modes = MODES if len(sys.argv) < 2 or sys.argv[1] == "--all" \
            else sys.argv[1:]
        for m in modes:
            r = subprocess.run(
                [sys.executable, osp.abspath(__file__), m],
                capture_output=True, text=True,
                env={**__import__("os").environ,
                     "PYTHONPATH": "/root/.axon_site:" + _REPO_ROOT})
            line = (r.stdout.strip().splitlines() or ["<no output>"])[-1]
            print(line, flush=True)
            if r.returncode:
                print(f"  {m}: rc={r.returncode} "
                      f"{r.stderr.strip().splitlines()[-1:]}", flush=True)
        return
    print(json.dumps(probe(sys.argv[1])), flush=True)


if __name__ == "__main__":
    main()
