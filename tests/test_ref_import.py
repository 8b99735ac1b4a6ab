"""Reference-checkpoint importer: torch ``torch.save`` dicts → Flax params.

The reference's ``-r`` consumes its own torch checkpoints
({epoch, iteration, arch, optim_state_dict, model_state_dict, best_mean_iu}
— trainer_fcn.py:281-288, loaded strict=False at train.py:110-116). These
tests build such a checkpoint with torch in-test (from the independent
torch oracle), import it, and assert exact weight recovery, forward
agreement, strict=False semantics, the upscore_trained structural flag, and
the CLI ``load_fcn_path`` end-to-end route.
"""

import os.path as osp

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from zeroshotsemanticsegmentation_tpu.models import FCN32s
from zeroshotsemanticsegmentation_tpu.models.ref_import import (
    is_reference_checkpoint, load_reference_checkpoint,
    szn_params_from_reference_state_dict)
from zeroshotsemanticsegmentation_tpu.ops import bilinear_upsampling_kernel
from torch_oracle import TorchFCN  # noqa: E402 — tests dir module

SCALE = 0.25
N = 9  # head channels (embed_dim)


def init_params(seed, *, drift_upscore=False, scale=SCALE, n=N):
    model = FCN32s(num_classes=n, channel_scale=scale)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = jax.tree.map(np.asarray, model.init(
        jax.random.PRNGKey(seed), x, mode="both")["params"])
    if drift_upscore:  # simulate a stage-2-trained checkpoint
        rng = np.random.RandomState(seed + 100)
        up = params["seenmask_upscore"]["kernel"]
        params["seenmask_upscore"]["kernel"] = (
            up + 0.03 * rng.randn(*up.shape).astype(np.float32))
    return model, params


def reference_state_dict(oracle: TorchFCN) -> dict:
    """The oracle's tensors under the reference FCN32s state-dict names
    (models.py:43-98: bare module names, ConvTranspose weights included)."""
    sd = {}
    for name, conv in oracle.convs.items():
        sd[f"{name}.weight"] = conv.weight.data.clone()
        sd[f"{name}.bias"] = conv.bias.data.clone()
    sd["upscore.weight"] = oracle.up_score_fr.clone()
    sd["seenmask_upscore.weight"] = oracle.up_seenmask_score.data.clone()
    return sd


def save_reference_checkpoint(path, params, *, epoch=7, iteration=123,
                              best=0.42) -> None:
    torch.save({
        "epoch": epoch, "iteration": iteration, "arch": "FCN32s",
        "optim_state_dict": {"state": {}, "param_groups": []},
        "model_state_dict": reference_state_dict(TorchFCN(params)),
        "best_mean_iu": best,
    }, path)


def test_roundtrip_exact_and_forward_agreement(tmp_path):
    """torch-save → import recovers every weight EXACTLY (the layout surgery
    inverts the oracle's flax→torch mapping), metadata carries through, and
    the imported tree's forward matches the torch oracle."""
    _, params_a = init_params(0, drift_upscore=True)
    path = str(tmp_path / "best")
    save_reference_checkpoint(path, params_a)
    assert is_reference_checkpoint(path)

    model, params_b = init_params(1)  # different init: recovery must be real
    ckpt = load_reference_checkpoint(path, params_b)
    assert ckpt["epoch"] == 7 and ckpt["iteration"] == 123
    assert ckpt["best_mean_iu"] == pytest.approx(0.42)
    assert ckpt["upscore_trained"] is True
    assert ckpt["opt_state"] is None
    assert ckpt["skipped_keys"] == []
    for mod in params_a:
        for leaf in params_a[mod]:
            np.testing.assert_array_equal(
                ckpt["params"][mod][leaf], params_a[mod][leaf],
                err_msg=f"{mod}.{leaf}")

    rng = np.random.RandomState(3)
    x = rng.randn(1, 64, 64, 3).astype(np.float32) * 30
    f, s = model.apply({"params": ckpt["params"]}, jnp.asarray(x),
                       mode="both")
    with torch.no_grad():
        tf, ts = TorchFCN(params_a)(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), mode="both")
    np.testing.assert_allclose(np.asarray(f), tf.numpy().transpose(0, 2, 3, 1),
                               rtol=0, atol=2e-4)
    np.testing.assert_allclose(np.asarray(s), ts.numpy().transpose(0, 2, 3, 1),
                               rtol=0, atol=2e-4)


def test_strict_false_partial_dict():
    """load_state_dict(strict=False) semantics (train.py:114): absent modules
    keep their current values; unknown keys are reported, not fatal."""
    _, params_a = init_params(0)
    sd = reference_state_dict(TorchFCN(params_a))
    for k in list(sd):
        if k.startswith(("fc7.", "seenmask")):
            del sd[k]
    sd["some_new_module.weight"] = torch.zeros(1)

    _, params_b = init_params(1)
    merged, upscore_trained = szn_params_from_reference_state_dict(
        sd, params_b)
    assert upscore_trained is False  # no seenmask_upscore in the dict
    np.testing.assert_array_equal(merged["conv1_1"]["kernel"],
                                  params_a["conv1_1"]["kernel"])
    np.testing.assert_array_equal(merged["fc7"]["kernel"],
                                  params_b["fc7"]["kernel"])
    np.testing.assert_array_equal(merged["seenmask_score"]["bias"],
                                  params_b["seenmask_score"]["bias"])


def test_pristine_upscore_flag_false():
    _, params_a = init_params(0, drift_upscore=False)
    _, params_b = init_params(1)
    merged, upscore_trained = szn_params_from_reference_state_dict(
        reference_state_dict(TorchFCN(params_a)), params_b)
    assert upscore_trained is False
    np.testing.assert_array_equal(merged["seenmask_upscore"]["kernel"],
                                  bilinear_upsampling_kernel(2, 64))


def test_tampered_fcn_upscore_rejected():
    """The FCN upscore is a fixed bilinear function here (the reference never
    optimizes it, train.py:324-327) — a checkpoint whose upscore.weight
    drifted cannot be represented and must be refused loudly."""
    _, params_a = init_params(0)
    sd = reference_state_dict(TorchFCN(params_a))
    sd["upscore.weight"] = sd["upscore.weight"] + 0.01
    with pytest.raises(ValueError, match="upscore.weight"):
        szn_params_from_reference_state_dict(sd, init_params(1)[1])


def test_trained_upscore_into_fixed_upsample_arch_rejected():
    """A stage-2-trained seenmask_upscore cannot be represented by an arch
    with a fixed bilinear upsample (FCN8s) — must refuse, never drop."""
    _, params_a = init_params(0, drift_upscore=True)
    sd = reference_state_dict(TorchFCN(params_a))
    target = {k: v for k, v in init_params(1)[1].items()
              if k != "seenmask_upscore"}  # FCN8s-shaped: no such param
    with pytest.raises(ValueError, match="fixed bilinear"):
        szn_params_from_reference_state_dict(sd, target)
    # a PRISTINE upscore into the same arch is fine (nothing lost)
    _, pristine = init_params(0)
    sd2 = reference_state_dict(TorchFCN(pristine))
    merged, trained = szn_params_from_reference_state_dict(sd2, target)
    assert trained is False and "seenmask_upscore" not in merged


def test_shape_mismatch_rejected():
    """A checkpoint from a different embed_dim/arch fails with a clear
    message instead of a reshape crash downstream."""
    _, params_a = init_params(0, n=5)
    sd = reference_state_dict(TorchFCN(params_a))
    with pytest.raises(ValueError, match="score_fr.kernel"):
        szn_params_from_reference_state_dict(sd, init_params(1, n=9)[1])


def test_cli_test_all_from_reference_checkpoint(tmp_path):
    """End-to-end: ``load_fcn_path`` pointing at a reference torch FILE runs
    test_all through the import (VERDICT r4 missing #3 — the egress-day
    cross-validation route), with the stage-2 upscore_trained flag threading
    into the eval gate."""
    from test_training import tiny_cfg, run_tiny

    _, params = init_params(0, drift_upscore=True, scale=1 / 32, n=20)
    path = str(tmp_path / "ref_best")
    save_reference_checkpoint(path, params)

    cfg = tiny_cfg(mode="test_all", fcn_epochs=0, load_fcn_path=path)
    out = run_tiny(tmp_path, cfg, log_name="ref_test")
    assert np.isfinite(out["mean_iu"])


class _NoReadbackLeaf:
    """Stand-in for a device-resident param leaf: shape/dtype attributes
    work, but ANY host materialization (np.asarray / __array__) fails the
    test — on the axon tunnel a single readback of any size permanently
    collapses H2D bandwidth (CLAUDE.md trigger 1)."""

    def __init__(self, arr):
        self._arr = arr

    @property
    def shape(self):
        return self._arr.shape

    @property
    def dtype(self):
        return self._arr.dtype

    def __array__(self, *a, **k):
        raise AssertionError("ref_import read a target leaf back to host")


def test_import_never_reads_back_target_leaves():
    """cli/train passes jit-initialized DEVICE params as the merge target;
    the import must derive dtypes/shapes from attributes only (merged
    modules) and keep absent-in-dict leaves by reference (never np.asarray
    them) — regression for the H2D-collapse readback path."""
    _, params_a = init_params(0, drift_upscore=True)
    sd = reference_state_dict(TorchFCN(params_a))
    del sd["fc7.bias"]  # exercise the keep-current-bias path too

    _, host_target = init_params(1)
    target = {mod: {k: _NoReadbackLeaf(v) for k, v in leaves.items()}
              for mod, leaves in host_target.items()}
    merged, upscore_trained = szn_params_from_reference_state_dict(sd, target)
    assert upscore_trained is True
    np.testing.assert_array_equal(merged["conv1_1"]["kernel"],
                                  params_a["conv1_1"]["kernel"])
    np.testing.assert_array_equal(merged["seenmask_upscore"]["kernel"],
                                  params_a["seenmask_upscore"]["kernel"])
    # the leaf absent from the state dict stays the ORIGINAL (device) object
    assert merged["fc7"]["bias"] is target["fc7"]["bias"]
