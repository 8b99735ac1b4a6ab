"""Optimizer factories with the reference's parameter-group rules.

Reference grouping (train.py:126-133, 302-331):
  * conv kernels: base lr; with SGD also weight_decay 5e-4
  * conv biases : 2x lr, never weight-decayed
  * upscore ConvTranspose weights: excluded from optimization entirely — in
    this framework the bilinear upscore is a fixed function, so there is
    nothing to exclude
  * seenmask stage (train.py:164-175): every parameter frozen except the
    seenmask head

Implemented as optax.multi_transform over a label tree derived from param
names; torch SGD (momentum into buffer, lr applied after) and torch Adam
(eps outside sqrt, bias-corrected) update rules match optax's sgd/adam.
"""

from __future__ import annotations

import jax
import optax


def _label_tree(params, stage: str):
    """Label each leaf: fcn stage -> weight/bias; seenmask stage -> seenmask/frozen."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    labels = {}

    def put(path, value):
        d = labels
        for k in path[:-1]:
            d = d.setdefault(k.key, {})
        d[path[-1].key] = value

    for path, _ in flat:
        module = path[0].key
        leaf = path[-1].key
        if stage == "seenmask":
            # stage-2 Adam gets the head AND the seenmask upscore kernel
            # (reference train.py:168-171 requires_grad, 304-307 yields both)
            put(path, "seenmask" if module in ("seenmask_score",
                                               "seenmask_upscore")
                else "frozen")
        elif module in ("seenmask_score", "seenmask_upscore"):
            # reference get_parameters skips the seenmask head in stage 1
            # (train.py:316-318) and every ConvTranspose weight (324-327):
            # without this, SGD's weight-decay term would move them despite
            # their zero gradients
            put(path, "frozen")
        else:
            put(path, "bias" if leaf == "bias" else "weight")
    return labels


def make_fcn_optimizer(params, *, optim: str, lr: float,
                       momentum: float = 0.99,
                       weight_decay: float = 5e-4) -> optax.GradientTransformation:
    """Stage-1 optimizer (reference train.py:126-133)."""
    if optim == "sgd":
        transforms = {
            "weight": optax.chain(optax.add_decayed_weights(weight_decay),
                                  optax.sgd(lr, momentum=momentum)),
            "bias": optax.sgd(lr * 2.0, momentum=momentum),
            "frozen": optax.set_to_zero(),
        }
    elif optim == "adam":
        transforms = {
            "weight": optax.adam(lr),
            "bias": optax.adam(lr * 2.0),
            "frozen": optax.set_to_zero(),
        }
    else:
        raise ValueError(f"unknown optimizer {optim!r}")
    return optax.multi_transform(transforms, _label_tree(params, "fcn"))


def make_seenmask_optimizer(params, *, lr: float) -> optax.GradientTransformation:
    """Stage-2 optimizer: Adam on the seenmask head + seenmask upscore
    (train.py:174-175, 304-307)."""
    transforms = {
        "seenmask": optax.adam(lr),
        "frozen": optax.set_to_zero(),
    }
    return optax.multi_transform(transforms, _label_tree(params, "seenmask"))
