"""Orbax checkpointing with the reference's every-eval + best semantics.

Reference (trainer_fcn.py:274-292): after every validation, save
{epoch, iteration, arch, optim state, model state, best_mean_iu} to
``<log_dir>/checkpoint`` and copy to ``<log_dir>/best`` when mean-IoU
improved; resume restores model + optimizer + counters (train.py:110-116).

Layout: arrays (params, opt_state) go through orbax; scalar/string metadata
(arch, epoch, iteration, best_mean_iu) lives in a sidecar ``meta.json``
inside the checkpoint directory. `restore_checkpoint` returns one merged dict
with the reference's keys.

Stage 2 updates the model weights inside the loaded checkpoint and re-saves
``best`` (the reference does this unconditionally, ignoring its own is_best
tracking — trainer_seenmask.py:160-166; here best-tracking is honored,
documented as a deliberate fix).
"""

from __future__ import annotations

import json
import os
import os.path as osp
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

ARCH = "FCN32s"
_META = "meta.json"
_TREE = "tree"

_CKPTR: ocp.StandardCheckpointer | None = None


def _checkpointer() -> ocp.StandardCheckpointer:
    global _CKPTR
    if _CKPTR is None:
        _CKPTR = ocp.StandardCheckpointer()
    return _CKPTR


def _to_host(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


_PENDING_META: tuple | None = None

# a process exit with a save in flight must still produce a valid checkpoint
import atexit  # noqa: E402

atexit.register(lambda: _finish_pending())


def finish_pending() -> None:
    """Public barrier: block until the in-flight async save (if any) has
    fully landed, including its meta.json validity marker. Call before
    reading or deleting a log_dir from the saving process."""
    _finish_pending()


def _finish_pending() -> None:
    """Complete the previous async save (write its meta.json marker)."""
    global _PENDING_META
    if _PENDING_META is not None:
        ckptr, path, meta = _PENDING_META
        ckptr.wait_until_finished()
        # write + rename: meta.json may be hardlinked into best/ — an
        # in-place rewrite would corrupt the best checkpoint's metadata
        tmp = osp.join(path, _META + ".tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, osp.join(path, _META))
        _PENDING_META = None


def _save_one(ckptr, path: str, tree: dict, meta: dict, *,
              block: bool) -> None:
    """Start an orbax save; meta.json is written only after completion, so a
    checkpoint dir is valid iff meta.json exists. With block=False the wait
    happens lazily at the next save (training overlaps serialization — a full
    FCN32s+Adam tree is ~1.6 GB and ~1 min of I/O on slow hosts)."""
    global _PENDING_META
    ckptr.save(osp.join(path, _TREE), tree, force=True)
    _PENDING_META = (ckptr, path, meta)
    if block:
        _finish_pending()


def _link_copy(src: str, dst: str) -> None:
    """Copy a checkpoint dir via hardlinks (near-free for GB-scale trees)."""
    import shutil
    if osp.isdir(dst):
        shutil.rmtree(dst)
    shutil.copytree(src, dst, copy_function=os.link)


def save_checkpoint(log_dir: str, *, params, opt_state, epoch: int,
                    iteration: int, best_mean_iu: float,
                    is_best: bool, upscore_trained: bool = False) -> None:
    """`upscore_trained` records STRUCTURALLY whether `seenmask_upscore` has
    been optimized (stage 2 ran — reference train.py:304-307): consumers pick
    the fused bilinear-gate inference shortcut only when it is False. Carried
    as metadata because sniffing array values can't work for device-resident
    trees (any device->host readback collapses H2D here, CLAUDE.md)."""
    _finish_pending()  # the previous async save must land first
    tree = {"params": _to_host(params), "opt_state": _to_host(opt_state)}
    meta = {"arch": ARCH, "epoch": int(epoch), "iteration": int(iteration),
            "best_mean_iu": float(best_mean_iu),
            "upscore_trained": bool(upscore_trained)}
    ckptr = _checkpointer()
    base = osp.abspath(log_dir)
    os.makedirs(base, exist_ok=True)
    # best saves block (the hardlink copy needs complete files); routine
    # checkpoints overlap the next training epoch
    _save_one(ckptr, osp.join(base, "checkpoint"), tree, meta, block=is_best)
    if is_best:
        # reference copies the file (trainer_fcn.py:291-292); serializing the
        # multi-GB tree twice per eval stalls training, hardlinks don't
        _link_copy(osp.join(base, "checkpoint"), osp.join(base, "best"))


def restore_checkpoint(path: str, target: Any | None = None) -> dict:
    """Restore '<log_dir>/best' or '<log_dir>/checkpoint' into one dict
    {arch, epoch, iteration, best_mean_iu, params, opt_state}."""
    _finish_pending()  # an in-flight save may be the checkpoint being read
    path = osp.abspath(path)
    ckptr = _checkpointer()
    if target is not None:
        tree = ckptr.restore(osp.join(path, _TREE), target=target)
    else:
        tree = ckptr.restore(osp.join(path, _TREE))
    with open(osp.join(path, _META)) as f:
        meta = json.load(f)
    return {**meta, **tree}


def checkpoint_exists(path: str) -> bool:
    return osp.isfile(osp.join(osp.abspath(path), _META))
