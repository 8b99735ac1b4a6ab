"""Checkpoint-export CLI: this framework's checkpoint → reference format.

Writes a ``torch.save`` file the reference codebase resumes from directly
(``train.py:110-136``: load_state_dict(strict=False) +
optim.load_state_dict), enabling the our-train/their-eval half of the
egress-day cross-validation (models/ref_export.py has the full story):

    python -m zeroshotsemanticsegmentation_tpu.cli.export \
        <run_dir>/best -o exported_best [--fcn_optim sgd --fcn_lr 1e-10]

``--fcn_optim/--fcn_lr`` default from the run's ``config.yaml``; they must
match the config the reference will resume under (its loader swaps the
saved group hyperparameters in wholesale).
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    from zeroshotsemanticsegmentation_tpu.models.ref_export import (
        export_checkpoint)

    p = argparse.ArgumentParser(
        description="Export an orbax checkpoint as a reference torch file")
    p.add_argument("checkpoint",
                   help="orbax checkpoint dir (<run_dir>/best or /checkpoint)")
    p.add_argument("-o", "--out", required=True,
                   help="output path for the torch.save file")
    p.add_argument("--fcn_optim", choices=["sgd", "adam"], default=None,
                   help="optimizer the reference will resume with "
                        "(default: the run's config.yaml)")
    p.add_argument("--fcn_lr", type=float, default=None,
                   help="lr for the exported optimizer groups "
                        "(default: the run's config.yaml)")
    args = p.parse_args(argv)

    blob = export_checkpoint(args.checkpoint, args.out,
                             fcn_optim=args.fcn_optim, fcn_lr=args.fcn_lr)
    n_tensors = len(blob["model_state_dict"])
    print(f"exported {args.checkpoint} -> {args.out} "
          f"(epoch {blob['epoch']}, iteration {blob['iteration']}, "
          f"best_mean_iu {blob['best_mean_iu']:.4f}, {n_tensors} tensors; "
          "round-trip verified)")


if __name__ == "__main__":
    sys.exit(main())
