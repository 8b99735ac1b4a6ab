"""Scale-out: device mesh + sharding rules (no reference equivalent).

The reference is strictly single-process single-GPU batch-1 (SURVEY §2:
no torch.distributed / NCCL anywhere); scale-out here is designed TPU-first:

* mesh axes ('data', 'model') over `jax.sharding.Mesh`;
* **DP**: batches sharded on 'data'; parameters replicated; XLA/GSPMD inserts
  the gradient psum over ICI automatically (params replicated + batch sharded
  ⇒ reduced grads) — there is no hand-written collective code to maintain;
* **TP**: fc6/fc7 form a 25088→4096→4096 MLP holding ~86% of the model's
  parameters — sharded Megatron-style on 'model' (fc6 column-parallel: kernel
  sharded on output channels; fc7 row-parallel: kernel sharded on input
  channels, activation psum after fc7). All convs and heads are replicated.
* **PP/EP/CP**: not applicable to a 16-layer convnet with no experts and no
  sequence dimension (documented out of scope, SURVEY §2).

Everything goes through jit: we only place data (`jax.device_put` with
`NamedSharding`) and let the compiler propagate + insert collectives.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
SLICE_AXIS = "slice"  # multi-slice (DCN) outer data axis

# fc6 column-parallel, fc7 row-parallel (kernel layout HWIO)
_TP_RULES = {
    "fc6": {"kernel": P(None, None, None, MODEL_AXIS),
            "bias": P(MODEL_AXIS)},
    "fc7": {"kernel": P(None, None, MODEL_AXIS, None),
            "bias": P()},
}


def make_mesh(data: int | None = None, model: int = 1,
              devices=None) -> Mesh:
    """('data', 'model') mesh; `data` defaults to n_devices // model."""
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // model
    if data * model > len(devices):
        raise ValueError(
            f"mesh {data}x{model} needs {data * model} devices, "
            f"have {len(devices)}")
    grid = np.asarray(devices[:data * model]).reshape(data, model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def make_multislice_mesh(slices: int, data: int | None = None,
                         model: int = 1, devices=None) -> Mesh:
    """('slice', 'data', 'model') hybrid mesh for multi-slice pods.

    Axis placement follows the DCN/ICI cost model: pure data parallelism
    over 'slice' (the only cross-slice traffic is the once-per-step gradient
    psum — small and latency-tolerant, so it can ride DCN), with
    within-slice DP on 'data' and Megatron TP on 'model' riding ICI. On real
    multi-slice hardware pass `jax.experimental.mesh_utils.
    create_hybrid_device_mesh((slices,), (data, model))`'s devices; on a
    flat device list (virtual CPU devices, or a single slice pretending to
    be several) a plain reshape produces the same logical topology, which is
    what the driver's CPU dryrun certifies.
    """
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // (slices * model)
    need = slices * data * model
    if need > len(devices) or min(slices, data, model) < 1:
        raise ValueError(
            f"mesh {slices}x{data}x{model} needs {need} devices, "
            f"have {len(devices)}")
    grid = np.asarray(devices[:need]).reshape(slices, data, model)
    return Mesh(grid, (SLICE_AXIS, DATA_AXIS, MODEL_AXIS))


def data_axes(mesh: Mesh | None) -> tuple:
    """The mesh axes a batch dimension shards over ('slice' included when
    the mesh is multi-slice)."""
    if mesh is not None and SLICE_AXIS in mesh.axis_names:
        return (SLICE_AXIS, DATA_AXIS)
    return (DATA_AXIS,)


def param_pspecs(params) -> dict:
    """PartitionSpec tree for a FCN32s param tree: TP on fc6/fc7, rest replicated."""
    def spec_for(module: str, leaf: str):
        return _TP_RULES.get(module, {}).get(leaf, P())

    return {
        module: {leaf: spec_for(module, leaf) for leaf in leaves}
        for module, leaves in params.items()
    }


def batch_pspecs(batch: dict, mesh: Mesh | None = None) -> dict:
    """Batch arrays sharded on the leading (data) axis — over
    ('slice', 'data') jointly on a multi-slice mesh; scalars replicated."""
    axes = data_axes(mesh)
    lead = axes[0] if len(axes) == 1 else axes
    out = {}
    for k, v in batch.items():
        if k == "ids":
            continue
        arr = np.asarray(v)
        if arr.ndim == 0:
            out[k] = P()
        else:
            out[k] = P(lead, *([None] * (arr.ndim - 1)))
    return out


def shard_params(params, mesh: Mesh):
    specs = param_pspecs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs,
        is_leaf=lambda x: not isinstance(x, dict))


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    specs = batch_pspecs(batch, mesh)
    out = {}
    for k, v in batch.items():
        if k == "ids":
            out[k] = v
        else:
            out[k] = jax.device_put(np.asarray(v), NamedSharding(mesh, specs[k]))
    return out


def shard_opt_state(opt_state, mesh: Mesh):
    """Shard a restored optimizer state like its parameters.

    Optax states (Adam mu/nu, SGD momentum) mirror the param tree inside
    their namedtuples; any leaf whose tree path ends with a (module, leaf)
    pair covered by the TP rules gets that param's spec, everything else
    (counts, non-TP params) is replicated. Freshly-initialized states don't
    need this (jit(tx.init) on sharded params propagates shardings); restored
    host-side states do — reference resume restores optimizer state
    (train.py:134-135) and the sharded path must match.
    """
    def spec_for(path, x):
        keys = [getattr(p, "key", getattr(p, "name", None)) for p in path]
        for mod, leaf in zip(keys, keys[1:]):
            spec = _TP_RULES.get(mod, {}).get(leaf)
            if spec is not None and np.ndim(x) == len(spec):
                return spec
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda path, x: jax.device_put(x, NamedSharding(mesh, spec_for(path, x))),
        opt_state)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree over the mesh (e.g. embedding matrices)."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)
