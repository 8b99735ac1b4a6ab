"""Multi-chip dry run: jit the full training step over an n-device mesh.

Builds the real full-width FCN32s, shards it DP×TP over a ('data', 'model')
mesh, runs ONE optimizer step plus one SZN eval step on tiny (64×64) shapes,
and asserts everything is finite. Used by the driver on N virtual CPU devices
to validate the multi-chip path without TPU hardware; also runnable directly:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python -m zeroshotsemanticsegmentation_tpu.parallel.dryrun 8
"""

from __future__ import annotations

import sys

import numpy as np


def run(n_devices: int, *, channel_scale: float = 0.5,
        bucket: int = 64, slices: int = 1,
        max_step_s: float = 300.0) -> dict:
    # channel_scale 0.5 keeps every sharding real (fc6 is still a 2048-wide
    # Megatron column split) while staying inside XLA:CPU's in-process
    # collective rendezvous termination timeout (hardcoded 40 s): at full
    # width on a 1-core host, 8 oversubscribed device threads starve each
    # other past the timeout and the run aborts (observed 2026-08; round-1
    # logs already showed 20 s near-miss warnings at full width).
    import jax
    import jax.numpy as jnp

    devices = jax.devices()
    if len(devices) < n_devices:
        raise RuntimeError(
            f"need {n_devices} devices, found {len(devices)} "
            f"({devices[0].platform}); set "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={n_devices}")

    from zeroshotsemanticsegmentation_tpu.models import FCN32s
    from zeroshotsemanticsegmentation_tpu.parallel import (
        make_mesh, make_multislice_mesh, shard_batch,
        shard_params)
    from zeroshotsemanticsegmentation_tpu.train import make_fcn_optimizer
    from zeroshotsemanticsegmentation_tpu.train.state import TrainState
    from zeroshotsemanticsegmentation_tpu.train.steps import (
        make_fcn_train_step, make_szn_eval_step)
    from zeroshotsemanticsegmentation_tpu.ops.metrics import unseen_mask_vector

    model_axis = 2 if n_devices % 2 == 0 and n_devices >= 4 else 1
    if slices > 1:
        # multi-slice (DCN) simulation: DP over 'slice', DP x TP within —
        # the gradient psum spans slice+data, everything else stays inside
        # a slice (see make_multislice_mesh's cost-model note)
        if n_devices % (slices * model_axis):
            raise ValueError(f"{n_devices} devices can't split into "
                             f"{slices} slices x {model_axis} model")
        data_axis = n_devices // (slices * model_axis)
        mesh = make_multislice_mesh(slices, data_axis, model_axis,
                                    devices=devices[:n_devices])
        batch_size = slices * data_axis
    else:
        data_axis = n_devices // model_axis
        mesh = make_mesh(data_axis, model_axis, devices=devices[:n_devices])
        batch_size = data_axis  # one sample per data shard

    rng = np.random.RandomState(0)
    model = FCN32s(num_classes=20, channel_scale=channel_scale)
    x = rng.randn(batch_size, bucket, bucket, 3).astype(np.float32) * 40
    label = rng.randint(-1, 21, (batch_size, bucket, bucket)).astype(np.int32)
    sizes = np.full((batch_size, 2), bucket, np.int32)
    embed = rng.randn(21, 20).astype(np.float32)
    embed /= np.linalg.norm(embed, axis=1, keepdims=True)

    params = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, bucket, bucket, 3)),
        mode="both"))()["params"]
    params = shard_params(params, mesh)
    # embeddings/mask vectors stay host np: the step factories inline them
    # as HLO literals (GSPMD replicates literals for free), and jit-captured
    # device consts collapse H2D on the axon platform (steps._host_const)
    emb = embed
    unseen_vec = unseen_mask_vector(21, [1, 13])

    tx = make_fcn_optimizer(params, optim="adam", lr=1e-5)
    opt_state = jax.jit(tx.init)(params)
    state = TrainState(params=params, opt_state=opt_state,
                       step=jnp.zeros((), jnp.int32))
    batch = shard_batch({"image": x, "label": label, "sizes": sizes,
                         "num_real": np.int32(batch_size)}, mesh)

    train_step = make_fcn_train_step(model, tx, loss_name="cos",
                                     num_classes=21, embeddings=emb)
    # first step compiles; subsequent steps are pure execution, so their
    # wall-clock bounds collective health — a rendezvous deadlock would
    # otherwise only surface as an opaque driver timeout
    import time
    state, aux = train_step(state, batch, jax.random.PRNGKey(1))
    loss = float(aux["loss"])
    assert np.isfinite(loss), f"non-finite train loss {loss}"
    t0 = time.perf_counter()
    state, aux = train_step(state, batch, jax.random.PRNGKey(1))
    loss = float(aux["loss"])  # host fetch = step complete
    exec_wall_s = time.perf_counter() - t0
    assert np.isfinite(loss), f"non-finite train loss {loss}"
    assert int(state.step) == 2
    # generous: one half-width 64² step measures ~75 s on this 1-core CPU
    # host — the bound only exists to turn a true collective deadlock
    # (infinite) into a fast, attributable failure (full-width callers pass
    # a larger max_step_s: 4x the FLOPs on the same single core)
    assert exec_wall_s < max_step_s, (
        f"a post-compile sharded step took {exec_wall_s:.0f}s "
        f"(bound {max_step_s:.0f}s) — collectives are likely stalled")

    eval_step = make_szn_eval_step(model, loss_name="cos", num_classes=21,
                                   embeddings=emb, all_unseen_vec=unseen_vec,
                                   val_unseen_vec=unseen_vec)
    out = eval_step(state.params, batch)
    assert np.isfinite(float(out["loss_sum"]))

    result = {"devices": n_devices, "mesh": dict(mesh.shape),
              "train_loss": loss, "eval_loss": float(out["loss_sum"]),
              "steps_wall_s": round(exec_wall_s, 2),
              "platform": devices[0].platform}
    print(f"dryrun_multichip OK: {result}", flush=True)
    return result


def compile_full_width(n_devices: int, *, bucket: int = 512,
                       batch: int = 4) -> dict:
    """Build the EXACT full-width production train-step HLO on an n-device
    DP x TP mesh — compile only, no execution.

    Execution at full width is what the 1-core XLA:CPU rendezvous timeout
    forbids (see run()'s channel_scale note); compilation has no
    collectives to rendezvous, so the production program (channel_scale
    1.0, 512² bucket) can still be GSPMD-partitioned and code-generated
    end-to-end. Abstract shapes throughout — no full-width buffers are
    ever allocated (params+Adam state would be ~1.6 GB).
    """
    import time

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding

    from zeroshotsemanticsegmentation_tpu.models import FCN32s
    from zeroshotsemanticsegmentation_tpu.parallel.mesh import (
        batch_pspecs, make_mesh, param_pspecs)
    from zeroshotsemanticsegmentation_tpu.train import make_fcn_optimizer
    from zeroshotsemanticsegmentation_tpu.train.state import TrainState
    from zeroshotsemanticsegmentation_tpu.train.steps import (
        make_fcn_train_step)

    t0 = time.perf_counter()
    devices = jax.devices()[:n_devices]
    model_axis = 2 if n_devices % 2 == 0 and n_devices >= 4 else 1
    mesh = make_mesh(n_devices // model_axis, model_axis, devices=devices)
    model = FCN32s(num_classes=20)          # channel_scale 1.0
    embed = np.random.RandomState(0).randn(21, 20).astype(np.float32)

    pshape = jax.eval_shape(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, bucket, bucket, 3)),
        mode="both"))["params"]
    pshard = jax.tree_util.tree_map(
        lambda x, s: jax.ShapeDtypeStruct(
            x.shape, x.dtype, sharding=NamedSharding(mesh, s)),
        pshape, param_pspecs(pshape),
        is_leaf=lambda x: not isinstance(x, dict))
    tx = make_fcn_optimizer(pshape, optim="adam", lr=1e-5)
    state_s = TrainState(params=pshard,
                         opt_state=jax.eval_shape(tx.init, pshard),
                         step=jax.ShapeDtypeStruct((), jnp.int32))
    bdict = {"image": np.zeros((batch, bucket, bucket, 3), np.float32),
             "label": np.zeros((batch, bucket, bucket), np.int32),
             "sizes": np.zeros((batch, 2), np.int32),
             "num_real": np.int32(batch)}
    bspecs = batch_pspecs(bdict, mesh)
    batch_s = {k: jax.ShapeDtypeStruct(np.shape(v), np.asarray(v).dtype,
                                       sharding=NamedSharding(mesh, bspecs[k]))
               for k, v in bdict.items()}
    step = make_fcn_train_step(model, tx, loss_name="cos", num_classes=21,
                               embeddings=embed)
    compiled = jax.jit(step).lower(
        state_s, batch_s,
        jax.ShapeDtypeStruct((2,), jnp.uint32)).compile()
    del compiled
    out = {"full_width_compile": "ok", "bucket": bucket, "batch": batch,
           "mesh": dict(mesh.shape),
           "compile_wall_s": round(time.perf_counter() - t0, 1)}
    print(f"full-width production HLO compiled on {n_devices} devices: "
          f"{out}", flush=True)
    return out


def run_all(n_devices: int) -> dict:
    """Driver hook body: the single-slice DP x TP program at 0.5 width, then
    a 2-slice ('slice','data','model') hybrid-mesh step at 0.25 width (small
    enough to stay inside XLA:CPU's in-process collective rendezvous timeout
    on a 1-core host — see run()'s channel_scale note), then a compile-only
    build of the EXACT full-width 512² production step (no execution — the
    rendezvous timeout binds execution, not GSPMD partitioning/codegen)."""
    result = run(n_devices)
    if n_devices >= 4 and n_devices % 4 == 0:
        result["multislice"] = run(n_devices, slices=2, channel_scale=0.25)
    result["full_width"] = compile_full_width(n_devices)
    return result


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    if len(sys.argv) > 2:
        run(n, slices=int(sys.argv[2]))
    else:
        run_all(n)
