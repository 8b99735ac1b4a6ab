#!/usr/bin/env python
"""Bisect the H2D-collapse trigger (axon TPU tunnel platform quirk).

FINAL MODEL (20 probe rounds, 2026-08-18; the MODES comments below are the
lab notebook): host->device bandwidth drops from ~1.2-1.7 GB/s to
~15-40 MB/s, permanently for the process (no recovery after 75 s idle;
gc/clear_caches/chunking/parallel streams don't help), on EITHER of two
independent triggers:

  T1. ANY device->host readback — np.asarray/float()/device_get/
      copy_to_host_async, any array, any size (84 bytes, no compute:
      `d2h_only`). Jitted programs capturing DEVICE-array consts collapse
      via this at lowering (the const is read back to inline its literal);
      host-np consts are exempt (`closure_np`).
  T2. Any XLA dot at compile/load — 8x8 suffices (`mm_tiny`), compile-only
      suffices (`mm_compile`), a cache hit suffices, explicit args suffice
      (`mm_args`, so T2 is not T1 in disguise). Convs with real spatial
      extent are exempt; 1x1-OUTPUT convs (incl. every 1x1 conv's weight
      grad: `c11_wgrad`) canonicalize into dots mid-pipeline and collapse.
      Pallas matmul bodies are exempt (`pallas_dot`).

Three earlier theories fell to confounds: "backward pass" (round 1; the
forward control was conv-only), "any XLA dot" (rounds 3-5; every dot probe
ALSO captured operands by closure -> T1), "closure capture" (rounds 10-16;
the factory's own np.asarray(device const) readback was the actual T1 hit).

This probe runs ONE candidate program in a fresh process and measures H2D
bandwidth before and after:

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
         "cos_fwd",       # cosine_loss forward only
         # round-8: pattern-breakers for the refined trigger — a minor-axis
         # reduce of an elementwise product whose result is *consumed*
         # (non-root) gets algsimp'd into a dot mid-pipeline (root-output
         # probes sumprod/mr were clean; consumed ones collapsed). Each
         # candidate interposes something between multiply and reduce and
         # re-runs the cos_fwd program:
         "pairsum",       # reshape (.., C) -> (.., C/2, 2), two reduces
         "cumsum",        # cumsum along the minor axis, take last column
         "barrier",       # lax.optimization_barrier between mul and sum
         # round-9: ALL pattern-breakers collapsed — whatever detects the
         # inner-product structure sees through barriers/reshapes/cumsum.
         # Isolate the remaining suspects in the loss structure:
         "maskedsum",     # sum(valid) - sum(where(valid, u, 0)), no product
         "selfprod",      # consumed sum(s*s, -1) (self-product, non-root)
         "rowdot_pl",     # cos structure w/ product-reduce inside Pallas
         # round-10: maskedsum collapsed with NO product-reduce -> re-audit
         # of every probe shows the real confound: every collapsed program
         # CLOSES OVER a jnp (device) array; every clean one passes arrays
         # as explicit jit arguments or closes over host np constants. The
         # op-type theory (dot vs conv) was confounded from round 1 — the
         # dot probes captured operands by closure, the conv probes didn't.
         "cos_args",      # cos_fwd, but s/t/lbl all explicit args
         "cos_npclo",     # cos_fwd, t/lbl closed over as host np arrays
         "closure_conv",  # the clean `conv` program, kernel via jnp closure
         "closure_tiny",  # elementwise add of a closed-over tiny jnp array
         # round-11: closure_conv and closure_tiny COLLAPSED, cos_args was
         # CLEAN — the trigger is capturing a DEVICE array by closure, not
         # any op type. (cos_npclo with 88 MB np literals timed out in
         # compile — a separate huge-literal cost.) Confirm both halves:
         "mm_args",       # the original collapsing matmul-grad, operands
                          # passed as explicit jit args -> expect CLEAN
         "closure_np",    # sum(s + c) with c a tiny host np constant
                          # (inlined HLO literal) -> expect CLEAN
         # round-12: mm_args COLLAPSED (dot trigger is real and independent
         # of closures), closure_np CLEAN. After the const fix `serve` is
         # clean but head/tiny/full still collapse; the remaining suspect
         # is the 1x1-conv WEIGHT gradient — a conv whose output spatial
         # dims are 1x1, which XLA canonicalizes into a dot mid-pipeline
         # (the same rewrite observed in mm_as_conv). serve has no wgrads;
         # head's only wgrad is its 1x1 head conv.
         "c11_wgrad",     # weight-grad of a 1x1 conv (4096ch, 17^2)
         "c11_igrad",     # input-grad of the same 1x1 conv
         "c77_wgrad",     # weight-grad of a 7x7 VALID conv (control)
         "ce_grad_args",  # CE loss grad, all arrays explicit args
         "cos_grad_args", # cos loss grad, all arrays explicit args
         "pdot_big2",     # rerun of the unexplained pdot_big collapse
         # round-13: c11_wgrad fixed (ops/conv1x1.py) but head/tiny/full
         # STILL collapse — bisect the seenmask head step's remaining
         # unprobed pieces:
         "c11_custom",    # grad of conv1x1_mmwgrad wrt k (the new path)
         "foldin",        # fold_in + Dropout-style bernoulli mask
         "padmask",       # _pad_mask broadcasted_iota target construction
         "headloss",      # upsample + CE loss + grad wrt head conv params
         "sgdm",          # masked SGD+momentum update (seenmask optimizer)
         "headfwd",       # the full seenmask forward (pruned blocks), no grad
         # round-14: every round-13 component is CLEAN in isolation but the
         # composed head step collapses — subtractive bisect of the real
         # step body (ha0 = full step replica, then remove one piece):
         "ha0",           # full replica of make_seenmask_train_step's body
         "ha_noopt",      # ... without tx.update / param tree ops
         "ha_nodrop",     # ... without dropout (train=False, no rngs)
         "ha_nocm",       # ... without the confusion-matrix aux
         "ha_lossgrad",   # loss + head grad only (no aux, no opt)
         "ha_lossonly",   # loss only, no grad at all
         # round-15: ha0 (scalar outputs) is CLEAN while the real factory
         # step collapses — the replica's one structural difference is that
         # the real step RETURNS the updated param tree + optimizer state:
         "ha_ret",        # ha0 but returning (new_params, new_opt_state)
         "ha_ret_donate", # same, with the old state donated
         # round-16: ha_ret CLEAN, ha_ret_donate COLLAPSED -> donation is a
         # trigger; but the factories never donate, so the real head step's
         # collapse needs one more discriminant. Bridge ha_ret -> factory:
         "ha_clone",      # exact factory-body clone (TrainState, fold_in,
                          # _prepare_batch, aux dict, num_real division)
         "ha_clone_noprep",  # the clone minus _prepare_batch
         # round-17 (idle host, max-of-5 measure): head collapses twice,
         # ha_clone clean, ha_ret_donate clean (its earlier 'collapse' was
         # CPU-contention noise). The head probe's sole remaining delta vs
         # the clone: it computes seen_vec EAGERLY on device
         # (1.0 - jnp.asarray(vec)) before building the step:
         "head_npseen",   # the real factory head step, seen_vec host np
         "eager_sub",     # JUST the eager 1.0 - jnp.asarray(vec), no step
         # round-18: head_npseen CLEAN, eager_sub CLEAN, head COLLAPSED.
         # With a jnp seen_vec the factory's _host_const does
         # np.asarray(<eager-op result>) — a D2H readback — before the big
         # jit executes. Separate those:
         "eager_d2h",     # eager sub + np.asarray(result) readback
         "d2h_only",      # np.asarray(device_put result) readback
         "eager_d2h_jit", # eager sub + readback + a big clean jit conv
         # round-19: ALL THREE COLLAPSED — the root trigger is the D2H
         # readback itself (d2h_only does no compute at all). Mitigation
         # probes: which readback paths are exempt, and does it recover?
         "d2h_async",     # copy_to_host_async, then np.asarray
         "d2h_float",     # float(scalar jit result)
         "d2h_jitout",    # np.asarray(conv jit output)
         "d2h_recover")   # readback, then re-measure after 75 s idle


def measure_bw(nbytes: int = 25 * 1024 * 1024, reps: int = 5) -> float:
    """BEST-rep H2D bandwidth (MB/s) for a ~25 MB uint8 transfer.

    Max over reps (after one untimed warmup): host-side contention (this is
    a 1-core host) can slow any individual rep 50x, but nothing makes a rep
    spuriously FAST, so the max is the contention-robust statistic for a
    collapse bisect — the collapsed state caps every rep at ~15-40 MB/s."""
    import jax
    import numpy as np
    host = np.random.randint(0, 255, (nbytes,), np.uint8)
    jax.block_until_ready(jax.device_put(host))  # warmup (conn setup etc.)
    times = []
    for i in range(reps):
        host[0] = i  # never bit-identical (dedup immunity)
        t0 = time.perf_counter()
        jax.block_until_ready(jax.device_put(host))
        times.append(time.perf_counter() - t0)
    return nbytes / min(times) / 1e6


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
    if mode in ("cos_args", "cos_npclo", "closure_conv", "closure_tiny"):
        from zeroshotsemanticsegmentation_tpu.ops.losses import cosine_loss
        if mode == "cos_args":
            s = jnp.asarray(rng.randn(8, 512, 512, 21).astype(np.float32))
            t = jnp.asarray(rng.randn(8, 512, 512, 21).astype(np.float32))
            lbl = jnp.asarray(rng.randint(-1, 21, (8, 512, 512)), jnp.int32)
            out = jax.jit(cosine_loss)(s, lbl, t)
        elif mode == "cos_npclo":
            s = jnp.asarray(rng.randn(8, 512, 512, 21).astype(np.float32))
            t_np = rng.randn(8, 512, 512, 21).astype(np.float32)
            lbl_np = rng.randint(-1, 21, (8, 512, 512)).astype(np.int32)
            out = jax.jit(lambda s: cosine_loss(s, lbl_np, t_np))(s)
        elif mode == "closure_conv":
            x = jnp.asarray(rng.randn(4, 258, 258, 64).astype(np.float32))
            k = jnp.asarray(rng.randn(3, 3, 64, 64).astype(np.float32) * .01)
            out = jax.jit(lambda x: jnp.sum(jnp.maximum(
                jax.lax.conv_general_dilated(
                    x, k, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC")), 0)))(x)
        else:  # closure_tiny
            s = jnp.asarray(rng.randn(8, 512, 512).astype(np.float32))
            c = jnp.asarray(rng.randn(512).astype(np.float32))
            out = jax.jit(lambda s: jnp.sum(s + c))(s)
        jax.block_until_ready(out)
        return
    if mode in ("c11_wgrad", "c11_igrad", "c77_wgrad"):
        kw = dict(window_strides=(1, 1),
                  dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if mode == "c77_wgrad":
            x = jnp.asarray(rng.randn(8, 23, 23, 512).astype(np.float32))
            k = jnp.asarray(rng.randn(7, 7, 512, 64).astype(np.float32) * .01)
            pad = "VALID"
        else:
            x = jnp.asarray(rng.randn(8, 17, 17, 4096).astype(np.float32))
            k = jnp.asarray(rng.randn(1, 1, 4096, 21).astype(np.float32) * .01)
            pad = "SAME"

        def f(x, k):
            return jnp.sum(jax.lax.conv_general_dilated(x, k, padding=pad,
                                                        **kw))

        argnum = 0 if mode == "c11_igrad" else 1
        jax.block_until_ready(jax.jit(jax.grad(f, argnums=argnum))(x, k))
        return
    if mode in ("ce_grad_args", "cos_grad_args"):
        from zeroshotsemanticsegmentation_tpu.ops.losses import (
            cosine_loss, cross_entropy2d)
        s = jnp.asarray(rng.randn(8, 512, 512, 21).astype(np.float32))
        lbl = jnp.asarray(rng.randint(-1, 21, (8, 512, 512)), jnp.int32)
        if mode == "ce_grad_args":
            out = jax.jit(jax.grad(cross_entropy2d))(s, lbl)
        else:
            t = jnp.asarray(rng.randn(8, 512, 512, 21).astype(np.float32))
            out = jax.jit(jax.grad(cosine_loss))(s, lbl, t)
        jax.block_until_ready(out)
        return
    if mode == "pdot_big2":
        from zeroshotsemanticsegmentation_tpu.ops.pdot import pdot
        a = jnp.asarray(rng.randn(2312, 4096).astype(np.float32),
                        jnp.bfloat16)
        b2 = jnp.asarray(rng.randn(4096, 25088).astype(np.float32),
                         jnp.bfloat16)
        jax.block_until_ready(pdot(a, b2, out_dtype=jnp.float32))
        return
    if mode in ("d2h_async", "d2h_float", "d2h_jitout", "d2h_recover"):
        if mode in ("d2h_jitout", "d2h_float"):
            x = jnp.asarray(rng.randn(4, 66, 66, 64).astype(np.float32))
            k = jnp.asarray(rng.randn(3, 3, 64, 64).astype(np.float32) * .01)
            out = jax.jit(lambda x, k: jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC")))(x, k)
            if mode == "d2h_float":
                _ = float(jnp.sum(out))  # scalar fetch (the loop's pattern)
            else:
                _ = np.asarray(out)
        else:
            v = jnp.asarray(rng.randn(512).astype(np.float32))
            if mode == "d2h_async":
                v.copy_to_host_async()
                _ = np.asarray(v)
            else:  # d2h_recover
                _ = np.asarray(v)
                mid = measure_bw()
                print(json.dumps({"mode": "d2h_recover/mid",
                                  "bw_mid_mbs": round(mid, 1)}), flush=True)
                time.sleep(75)
        return
    if mode in ("eager_sub", "eager_d2h", "d2h_only", "eager_d2h_jit"):
        from zeroshotsemanticsegmentation_tpu.ops.metrics import (
            unseen_mask_vector)
        vec = unseen_mask_vector(21, [1, 13])
        if mode == "d2h_only":
            v = jnp.asarray(np.float32(1.0) - vec)  # host compute, device_put
        else:
            v = 1.0 - jnp.asarray(vec, jnp.float32)  # eager device compute
        jax.block_until_ready(v)
        if mode != "eager_sub":
            _ = np.asarray(v)  # D2H readback
        if mode == "eager_d2h_jit":
            x = jnp.asarray(rng.randn(4, 258, 258, 64).astype(np.float32))
            k = jnp.asarray(rng.randn(3, 3, 64, 64).astype(np.float32) * .01)
            out = jax.jit(lambda x, k: jnp.sum(jnp.maximum(
                jax.lax.conv_general_dilated(
                    x, k, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC")), 0)))(x, k)
            jax.block_until_ready(out)
        return
    if mode in ("ha_clone", "ha_clone_noprep"):
        from zeroshotsemanticsegmentation_tpu.models import FCN32s
        from zeroshotsemanticsegmentation_tpu.ops.losses import (
            cross_entropy2d)
        from zeroshotsemanticsegmentation_tpu.ops.metrics import (
            confusion_matrix)
        from zeroshotsemanticsegmentation_tpu.train.optim import (
            make_seenmask_optimizer)
        from zeroshotsemanticsegmentation_tpu.train.state import TrainState
        from zeroshotsemanticsegmentation_tpu.train.steps import (
            _prepare_batch, _seenmask_target)
        model = FCN32s(num_classes=20, dtype=jnp.bfloat16)
        b, hw = 4, 512
        batch = {
            "image": jnp.asarray(rng.randn(b, hw, hw, 3).astype(np.float32)),
            "label": jnp.asarray(rng.randint(-1, 21, (b, hw, hw)), jnp.int32),
            "sizes": jnp.asarray(np.full((b, 2), hw, np.int32)),
            "num_real": jnp.asarray(b, jnp.int32),
        }
        seen = np.array([c not in (1, 13) for c in range(21)])
        params = jax.jit(lambda: model.init(
            jax.random.PRNGKey(0), batch["image"][:1],
            mode="both"))()["params"]
        tx = make_seenmask_optimizer(params, lr=1e-3)
        state = TrainState(params=params,
                           opt_state=jax.jit(tx.init)(params),
                           step=jnp.zeros((), jnp.int32))
        _HEAD = "seenmask_score"
        noprep = mode == "ha_clone_noprep"

        @jax.jit
        def train_step(state, batch, dropout_key):
            key = jax.random.fold_in(dropout_key, state.step)
            if noprep:
                images = batch["image"].astype(jnp.bfloat16)
                labels = batch["label"]
            else:
                images, labels = _prepare_batch(batch)
            target = _seenmask_target(labels, batch["sizes"], seen)
            frozen = {k: v for k, v in state.params.items() if k != _HEAD}

            def loss_fn(head_params):
                p = dict(frozen)
                p[_HEAD] = head_params
                score = model.apply({"params": p}, images, train=True,
                                    mode="seenmask", rngs={"dropout": key})
                losses = jax.vmap(
                    lambda s, t: cross_entropy2d(s[None], t[None],
                                                 size_average=True))(
                    score, target)
                loss = jnp.sum(losses) / jnp.maximum(batch["num_real"], 1)
                return loss, score

            (loss, score), head_grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params[_HEAD])
            grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            grads[_HEAD] = head_grads
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            new_params = jax.tree_util.tree_map(lambda p, u: p + u,
                                                state.params, updates)
            new_state = state.replace(params=new_params,
                                      opt_state=opt_state,
                                      step=state.step + 1)
            pred = jnp.argmax(score, axis=-1).astype(jnp.int32)
            aux = {
                "loss": loss,
                "hist": confusion_matrix(target, pred, 2),
                "score_sum": jnp.sum(score.astype(jnp.float32)),
                "seenmask_grad_sum": jnp.sum(grads[_HEAD]["kernel"]),
            }
            return new_state, aux

        state, aux = train_step(state, batch, jax.random.PRNGKey(7))
        jax.block_until_ready(aux["loss"])
        return
    if mode.startswith("ha"):
        from zeroshotsemanticsegmentation_tpu.models import FCN32s
        from zeroshotsemanticsegmentation_tpu.ops.losses import (
            cross_entropy2d)
        from zeroshotsemanticsegmentation_tpu.ops.metrics import (
            confusion_matrix)
        from zeroshotsemanticsegmentation_tpu.train.optim import (
            make_seenmask_optimizer)
        from zeroshotsemanticsegmentation_tpu.train.steps import (
            _seenmask_target)
        drop = mode not in ("ha_nodrop",)
        opt = mode in ("ha0", "ha_nodrop", "ha_nocm", "ha_ret",
                       "ha_ret_donate")
        cm = mode in ("ha0", "ha_noopt", "ha_nodrop", "ha_ret",
                      "ha_ret_donate")
        want_grad = mode != "ha_lossonly"
        ret_tree = mode in ("ha_ret", "ha_ret_donate")

        model = FCN32s(num_classes=20, dtype=jnp.bfloat16)
        b, hw = 4, 512
        images = jnp.asarray(rng.randn(b, hw, hw, 3).astype(np.float32))
        labels = jnp.asarray(rng.randint(-1, 21, (b, hw, hw)), jnp.int32)
        sizes = jnp.asarray(np.full((b, 2), hw, np.int32))
        seen = np.array([c not in (1, 13) for c in range(21)])
        params = jax.jit(lambda: model.init(
            jax.random.PRNGKey(0), images[:1], mode="both"))()["params"]
        tx = make_seenmask_optimizer(params, lr=1e-3) if opt else None
        opt_state = jax.jit(tx.init)(params) if opt else None
        _HEAD = "seenmask_score"

        def step(params, opt_state, images, labels, sizes, key):
            target = _seenmask_target(labels, sizes, seen)
            frozen = {k: v for k, v in params.items() if k != _HEAD}

            def loss_fn(head_params):
                p = dict(frozen)
                p[_HEAD] = head_params
                score = model.apply(
                    {"params": p}, images, train=drop, mode="seenmask",
                    **({"rngs": {"dropout": key}} if drop else {}))
                losses = jax.vmap(
                    lambda s, t: cross_entropy2d(s[None], t[None],
                                                 size_average=True))(
                    score, target)
                return jnp.sum(losses) / b, score

            if not want_grad:
                loss, score = loss_fn(params[_HEAD])
                return loss, jnp.sum(score.astype(jnp.float32))
            (loss, score), hg = jax.value_and_grad(
                loss_fn, has_aux=True)(params[_HEAD])
            outs = [loss, jnp.sum(hg["kernel"])]
            if cm:
                pred = jnp.argmax(score, axis=-1).astype(jnp.int32)
                outs.append(jnp.sum(confusion_matrix(target, pred, 2)))
            if opt:
                grads = jax.tree_util.tree_map(jnp.zeros_like, params)
                grads[_HEAD] = hg
                updates, new_os = tx.update(grads, opt_state, params)
                new_p = jax.tree_util.tree_map(lambda p, u: p + u,
                                               params, updates)
                if ret_tree:
                    return new_p, new_os, tuple(outs)
                outs.append(jnp.sum(new_p[_HEAD]["kernel"]))
            return tuple(outs)

        donate = (0, 1) if mode == "ha_ret_donate" else ()
        out = jax.jit(step, donate_argnums=donate)(
            params, opt_state, images, labels, sizes, jax.random.PRNGKey(7))
        jax.block_until_ready(out)
        return
    if mode == "c11_custom":
        from zeroshotsemanticsegmentation_tpu.ops.conv1x1 import (
            conv1x1_mmwgrad)
        x = jnp.asarray(rng.randn(8, 17, 17, 4096).astype(np.float32),
                        jnp.bfloat16)
        k = jnp.asarray(rng.randn(1, 1, 4096, 21).astype(np.float32) * .01,
                        jnp.bfloat16)

        def f(x, k):
            return jnp.sum(conv1x1_mmwgrad(x, k).astype(jnp.float32))

        jax.block_until_ready(jax.jit(jax.grad(f, argnums=(0, 1)))(x, k))
        return
    if mode == "foldin":
        x = jnp.asarray(rng.randn(8, 17, 17, 4096).astype(np.float32))
        step = jnp.asarray(3, jnp.int32)

        def f(key, step, x):
            key = jax.random.fold_in(key, step)
            keep = jax.random.bernoulli(key, 0.5, (8, 1, 1, 4096))
            return jnp.sum(jnp.where(keep, x / 0.5, 0.0))

        jax.block_until_ready(jax.jit(f)(jax.random.PRNGKey(0), step, x))
        return
    if mode == "padmask":
        from zeroshotsemanticsegmentation_tpu.train.steps import (
            _seenmask_target)
        lbl = jnp.asarray(rng.randint(-1, 21, (8, 512, 512)), jnp.int32)
        sizes = jnp.asarray(np.full((8, 2), 512, np.int32))
        seen = np.array([c not in (1, 13) for c in range(21)])
        jax.block_until_ready(
            jax.jit(lambda l, s: _seenmask_target(l, s, seen))(lbl, sizes))
        return
    if mode == "headloss":
        # cotangent path of the head-only step: 1x1 conv (custom wgrad) ->
        # fp32 bilinear upsample -> masked CE; grad wrt conv params only
        from zeroshotsemanticsegmentation_tpu.ops.bilinear import (
            upsample_bilinear_cropped)
        from zeroshotsemanticsegmentation_tpu.ops.conv1x1 import (
            conv1x1_mmwgrad)
        from zeroshotsemanticsegmentation_tpu.ops.losses import (
            cross_entropy2d)
        h = jnp.asarray(rng.randn(8, 17, 17, 4096).astype(np.float32),
                        jnp.bfloat16)
        k = jnp.asarray(rng.randn(1, 1, 4096, 2).astype(np.float32) * .01,
                        jnp.bfloat16)
        tgt = jnp.asarray(rng.randint(-1, 2, (8, 512, 512)), jnp.int32)

        def f(k, h, tgt):
            s = conv1x1_mmwgrad(h, k)
            score = upsample_bilinear_cropped(
                s.astype(jnp.float32), stride=32, kernel_size=64,
                crop_offset=19, out_h=512, out_w=512)
            return cross_entropy2d(score, tgt, size_average=True)

        jax.block_until_ready(jax.jit(jax.grad(f))(k, h, tgt))
        return
    if mode == "sgdm":
        from zeroshotsemanticsegmentation_tpu.train.optim import (
            make_seenmask_optimizer)
        params = {"seenmask_score": {
                      "kernel": jnp.asarray(rng.randn(1, 1, 4096, 2)
                                            .astype(np.float32)),
                      "bias": jnp.zeros((2,), jnp.float32)},
                  "fc7": {"kernel": jnp.asarray(rng.randn(1, 1, 512, 512)
                                                .astype(np.float32)),
                          "bias": jnp.zeros((512,), jnp.float32)}}
        tx = make_seenmask_optimizer(params, lr=1e-3)
        opt_state = jax.jit(tx.init)(params)
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        jax.block_until_ready(jax.jit(
            lambda g, s, p: tx.update(g, s, p))(grads, opt_state, params))
        return
    if mode == "headfwd":
        from zeroshotsemanticsegmentation_tpu.models import FCN32s
        model = FCN32s(num_classes=20, dtype=jnp.bfloat16)
        x = jnp.asarray(rng.randn(4, 512, 512, 3).astype(np.float32))
        params = jax.jit(lambda: model.init(
            jax.random.PRNGKey(0), x[:1], mode="both"))()["params"]
        out = jax.jit(lambda p, x: model.apply(
            {"params": p}, x, mode="seenmask"))(params, x)
        jax.block_until_ready(out)
        return
    if mode == "mm_args":
        a = jnp.asarray(rng.randn(4096, 4096).astype(np.float32))

        def f(a, w):
            return jnp.sum(jnp.tanh(a @ w))

        jax.block_until_ready(jax.jit(jax.grad(f, argnums=1))(a, a))
        return
    if mode == "closure_np":
        s = jnp.asarray(rng.randn(8, 512, 512).astype(np.float32))
        c = rng.randn(512).astype(np.float32)  # host constant
        jax.block_until_ready(jax.jit(lambda s: jnp.sum(s + c))(s))
        return
    if mode in ("maskedsum", "selfprod", "rowdot_pl"):
        s = jnp.asarray(rng.randn(8, 512, 512, 21).astype(np.float32))
        t = jnp.asarray(rng.randn(8, 512, 512, 21).astype(np.float32))
        lbl = jnp.asarray(rng.randint(-1, 21, (8, 512, 512)), jnp.int32)
        if mode == "maskedsum":
            def f(s):
                valid = lbl >= 0
                u = jnp.tanh(s[..., 0])
                return (jnp.sum(valid)
                        - jnp.sum(jnp.where(valid, u, 0.0)))
            jax.block_until_ready(jax.jit(f)(s))
            return
        if mode == "selfprod":
            def f(s):
                n2 = jnp.sum(s * s, axis=-1)  # consumed, not root
                return jnp.sum(jnp.sqrt(n2 + 1.0))
            jax.block_until_ready(jax.jit(f)(s))
            return
        # rowdot_pl: per-pixel inner product inside a Pallas kernel, the
        # rest of the cos-loss structure (mask + scalar sums) in XLA
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def kern(a_ref, b_ref, o_ref):
            o_ref[...] = jnp.sum(a_ref[...] * b_ref[...], axis=-1)

        def rowdot(a, b):
            bsz, h, w, c = a.shape
            th = 64  # (1, 64, 512, 21) fp32 = 2.75 MB per operand block
            return pl.pallas_call(
                kern,
                grid=(bsz, h // th),
                in_specs=[pl.BlockSpec((1, th, w, c),
                                       lambda i, j: (i, j, 0, 0),
                                       memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec((1, th, w), lambda i, j: (i, j, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((bsz, h, w), jnp.float32),
            )(a, b)

        def f(s, t):
            cos = rowdot(s, t)
            valid = lbl >= 0
            return (jnp.sum(valid) - jnp.sum(jnp.where(valid, cos, 0.0)))

        jax.block_until_ready(jax.jit(f)(s, t))
        return
    if mode in ("pairsum", "cumsum", "barrier"):
        s = jnp.asarray(rng.randn(8, 512, 512, 21).astype(np.float32))
        t = jnp.asarray(rng.randn(8, 512, 512, 21).astype(np.float32))
        lbl = jnp.asarray(rng.randint(-1, 21, (8, 512, 512)), jnp.int32)

        def sum_last(x):
            if mode == "pairsum":
                c = x.shape[-1]
                if c % 2:
                    x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, 1)])
                x = x.reshape(*x.shape[:-1], -1, 2)
                return jnp.sum(jnp.sum(x, axis=-1), axis=-1)
            if mode == "cumsum":
                return jnp.cumsum(x, axis=-1)[..., -1]
            return jnp.sum(jax.lax.optimization_barrier(x), axis=-1)

        def f(s, t):
            # the cos_fwd structure: normalized product-reduce, masked sums
            cos = sum_last(s * t)
            valid = lbl >= 0
            return (jnp.sum(valid) - jnp.sum(jnp.where(valid, cos, 0.0)))

        jax.block_until_ready(jax.jit(f)(s, t))
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
        # the PRODUCTION serving constructor (earlier revisions built an
        # ad-hoc closure over device embed/unseen_vec here, which is itself
        # a collapse trigger — it masked serving.py's actual cleanliness)
        from zeroshotsemanticsegmentation_tpu.models import FCN32s
        from zeroshotsemanticsegmentation_tpu.serving import (
            make_szn_predictor)
        from zeroshotsemanticsegmentation_tpu.data.assets import (
            load_class_embeddings)
        model = FCN32s(num_classes=20, dtype=jnp.bfloat16, fused_block1=True)
        x = jnp.asarray(rng.randn(8, 512, 512, 3).astype(np.float32) * 40)
        params = jax.jit(lambda: model.init(
            jax.random.PRNGKey(0), x[:1], mode="both"))()["params"]
        predict = make_szn_predictor(model, params,
                                     load_class_embeddings("pascal", 20),
                                     [1, 13],
                                     # fresh init: structurally pristine (a
                                     # device tree can't be sniffed on the
                                     # tunnel — serving.py would raise)
                                     upscore_trained=False)
        jax.block_until_ready(predict(x))
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

    b, hw = {"head": (4, 512), "head_npseen": (4, 512),
             "tiny": (2, 128), "full": (8, 512)}[mode]
    model = FCN32s(num_classes=20, dtype=jnp.bfloat16)
    batch = {
        "image": jnp.asarray(rng.randn(b, hw, hw, 3).astype(np.float32)),
        "label": jnp.asarray(rng.randint(-1, 21, (b, hw, hw)), jnp.int32),
        "sizes": jnp.asarray(np.full((b, 2), hw, np.int32)),
        "num_real": jnp.asarray(b, jnp.int32),
    }
    params = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), batch["image"][:1], mode="both"))()["params"]
    if mode.startswith("head"):
        if mode == "head_npseen":
            seen_vec = 1.0 - np.asarray(
                unseen_mask_vector(21, [1, 13]), np.float32)
        else:
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
