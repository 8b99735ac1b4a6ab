"""FCN-32s: geometry, torch-oracle numerical parity, VGG16 import surgery."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zeroshotsemanticsegmentation_tpu.models import (
    FCN32s, load_vgg16_into_params)
from zeroshotsemanticsegmentation_tpu.models.fcn32s import min_input_size
from zeroshotsemanticsegmentation_tpu.ops import bilinear_upsampling_kernel

# small embed dim keeps the upscore/oracle cheap; backbone widths are real
EMBED_DIM = 4


def init_model(rng, h=64, w=64):
    model = FCN32s(num_classes=EMBED_DIM)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)),
                           mode="fcn")
    return model, variables


def torch_oracle_forward(params, x_nhwc, mode="fcn"):
    """Independent torch implementation of the reference forward semantics.

    Consumes the Flax param tree (HWIO) directly; exists only as a numerical
    oracle for tests.
    """
    import torch
    import torch.nn.functional as F

    def w(name):
        k = np.asarray(params[name]["kernel"])  # HWIO
        return torch.from_numpy(k.transpose(3, 2, 0, 1).copy())  # OIHW

    def b(name):
        return torch.from_numpy(np.asarray(params[name]["bias"]))

    h = torch.from_numpy(np.asarray(x_nhwc).transpose(0, 3, 1, 2).copy())
    blocks = [["conv1_1", "conv1_2"],
              ["conv2_1", "conv2_2"],
              ["conv3_1", "conv3_2", "conv3_3"],
              ["conv4_1", "conv4_2", "conv4_3"],
              ["conv5_1", "conv5_2", "conv5_3"]]
    with torch.no_grad():
        for bi, block in enumerate(blocks):
            for ci, name in enumerate(block):
                pad = 100 if (bi == 0 and ci == 0) else 1
                h = F.relu(F.conv2d(h, w(name), b(name), padding=pad))
            h = F.max_pool2d(h, 2, stride=2, ceil_mode=True)
        h = F.relu(F.conv2d(h, w("fc6"), b("fc6")))
        h = F.relu(F.conv2d(h, w("fc7"), b("fc7")))

        def head(name, channels):
            s = F.conv2d(h, w(name), b(name))
            up_k = bilinear_upsampling_kernel(channels, 64, np.float32)
            up_w = torch.from_numpy(up_k.transpose(2, 3, 0, 1).copy())  # IOHW
            f = F.conv_transpose2d(s, up_w, stride=32)
            hh, ww = x_nhwc.shape[1], x_nhwc.shape[2]
            return f[:, :, 19:19 + hh, 19:19 + ww]

        if mode == "fcn":
            out = head("score_fr", EMBED_DIM)
        else:
            out = head("seenmask_score", 2)
    return out.numpy().transpose(0, 2, 3, 1)


@pytest.mark.parametrize("h,w", [(64, 64), (97, 113)])
def test_output_matches_input_spatial_dims(h, w):
    model, variables = init_model(None, h, w)
    x = jnp.zeros((1, h, w, 3))
    f, s = model.apply(variables, x, mode="both")
    assert f.shape == (1, h, w, EMBED_DIM)
    assert s.shape == (1, h, w, 2)


def test_parity_with_torch_oracle(rng):
    model, variables = init_model(rng)
    x = rng.randn(1, 64, 64, 3).astype(np.float32)
    got_f = np.asarray(model.apply(variables, jnp.asarray(x), mode="fcn"))
    got_s = np.asarray(model.apply(variables, jnp.asarray(x), mode="seenmask"))
    want_f = torch_oracle_forward(variables["params"], x, "fcn")
    want_s = torch_oracle_forward(variables["params"], x, "seenmask")
    np.testing.assert_allclose(got_f, want_f, rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(got_s, want_s, rtol=1e-3, atol=2e-4)


def test_vgg16_import_surgery(rng):
    model, variables = init_model(rng)
    params = variables["params"]
    # torchvision-shaped random state dict (conv OIHW + fc linear weights)
    shapes = {
        "features.0": (64, 3), "features.2": (64, 64),
        "features.5": (128, 64), "features.7": (128, 128),
        "features.10": (256, 128), "features.12": (256, 256),
        "features.14": (256, 256),
        "features.17": (512, 256), "features.19": (512, 512),
        "features.21": (512, 512),
        "features.24": (512, 512), "features.26": (512, 512),
        "features.28": (512, 512),
    }
    sd = {}
    for key, (o, i) in shapes.items():
        sd[f"{key}.weight"] = rng.randn(o, i, 3, 3).astype(np.float32) * 0.01
        sd[f"{key}.bias"] = rng.randn(o).astype(np.float32) * 0.01
    sd["classifier.0.weight"] = rng.randn(4096, 25088).astype(np.float32) * 0.001
    sd["classifier.0.bias"] = rng.randn(4096).astype(np.float32) * 0.01
    sd["classifier.3.weight"] = rng.randn(4096, 4096).astype(np.float32) * 0.001
    sd["classifier.3.bias"] = rng.randn(4096).astype(np.float32) * 0.01

    new_params = load_vgg16_into_params(dict(params), sd)
    # conv kernel mapping: OIHW -> HWIO
    np.testing.assert_array_equal(
        np.asarray(new_params["conv3_2"]["kernel"]),
        sd["features.12.weight"].transpose(2, 3, 1, 0))
    # fc6 surgery: (4096, 25088) -> view (4096,512,7,7) -> HWIO
    np.testing.assert_array_equal(
        np.asarray(new_params["fc6"]["kernel"]),
        sd["classifier.0.weight"].reshape(4096, 512, 7, 7).transpose(2, 3, 1, 0))
    # heads untouched
    np.testing.assert_array_equal(np.asarray(new_params["score_fr"]["kernel"]),
                                  np.asarray(params["score_fr"]["kernel"]))
    # imported params still run and agree with the torch oracle
    x = rng.randn(1, 64, 64, 3).astype(np.float32)
    got = np.asarray(model.apply({"params": new_params}, jnp.asarray(x),
                                 mode="fcn"))
    want = torch_oracle_forward(new_params, x, "fcn")
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def test_dropout_active_only_in_train_mode(rng):
    model, variables = init_model(rng)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    eval1 = model.apply(variables, x, mode="fcn")
    eval2 = model.apply(variables, x, mode="fcn")
    np.testing.assert_array_equal(np.asarray(eval1), np.asarray(eval2))
    tr1 = model.apply(variables, x, mode="fcn", train=True,
                      rngs={"dropout": jax.random.PRNGKey(1)})
    tr2 = model.apply(variables, x, mode="fcn", train=True,
                      rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(tr1), np.asarray(tr2))


def test_min_input_size():
    m = min_input_size()
    assert 1 <= m <= 64
    model = FCN32s(num_classes=EMBED_DIM)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, m, m, 3)),
                           mode="fcn")
    out = model.apply(variables, jnp.zeros((1, m, m, 3)), mode="fcn")
    assert out.shape == (1, m, m, EMBED_DIM)


def test_bad_mode_raises():
    model = FCN32s(num_classes=EMBED_DIM)
    with pytest.raises(ValueError):
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                   mode="bogus")


def test_fcn8s_geometry_and_zero_skip_init(rng):
    from zeroshotsemanticsegmentation_tpu.models import FCN8s
    model = FCN8s(num_classes=EMBED_DIM, channel_scale=1 / 16)
    x = jnp.asarray(rng.randn(1, 97, 113, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, mode="fcn")
    f, s = model.apply(variables, x, mode="both")
    assert f.shape == (1, 97, 113, EMBED_DIM)
    assert s.shape == (1, 97, 113, 2)
    p = variables["params"]
    # skip scores zero-initialized; all four heads + skips exist
    assert np.all(np.asarray(p["score_pool3"]["kernel"]) == 0)
    assert np.all(np.asarray(p["score_pool4"]["kernel"]) == 0)
    assert set(p) >= {"score_fr", "seenmask_score", "score_pool3",
                      "score_pool4", "fc6", "fc7"}
    # seenmask-only mode runs with the same variables (params all created)
    sm = model.apply(variables, x, mode="seenmask")
    assert sm.shape == (1, 97, 113, 2)


def test_fcn8s_trains_end_to_end(tmp_path, rng):
    from zeroshotsemanticsegmentation_tpu.cli.train import run_experiment
    from zeroshotsemanticsegmentation_tpu.configs import Config
    cfg = Config(mode="train", dataset="pascal", embed_dim=20, fcn_epochs=1,
                 fcn_lr=1e-3, fcn_loss="cos", fcn_optim="adam",
                 train_unseen=(1, 13), val_unseen=(6, 7), arch="fcn8s",
                 batch_size=2, eval_batch_size=2, bucket=(64, 64),
                 compute_dtype="float32", channel_scale=1 / 32, num_viz=1)
    out = run_experiment(cfg, preset=0, data_dir=str(tmp_path),
                         log_dir=str(tmp_path / "fcn8s"), synthetic=True,
                         verbose=False)
    assert np.isfinite(out["best_mean_iu"])


def test_remat_preserves_params_and_outputs(rng):
    """remat=True: identical param tree and forward outputs, grads finite."""
    from zeroshotsemanticsegmentation_tpu.models import FCN8s
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    for cls in (FCN32s, FCN8s):
        base = cls(num_classes=EMBED_DIM, channel_scale=1 / 16)
        rem = cls(num_classes=EMBED_DIM, channel_scale=1 / 16, remat=True)
        vb = base.init(jax.random.PRNGKey(0), x, mode="both")
        vr = rem.init(jax.random.PRNGKey(0), x, mode="both")
        assert (jax.tree_util.tree_structure(vb) ==
                jax.tree_util.tree_structure(vr))
        fb, _ = base.apply(vb, x, mode="both")
        fr, _ = rem.apply(vb, x, mode="both")  # same params through remat
        np.testing.assert_allclose(np.asarray(fb), np.asarray(fr),
                                   rtol=1e-5, atol=1e-5)

        def loss(p):
            out = rem.apply({"params": p}, x, mode="fcn")
            return jnp.sum(out ** 2)

        g = jax.grad(loss)(vb["params"])
        assert all(np.isfinite(np.asarray(l)).all()
                   for l in jax.tree_util.tree_leaves(g))
