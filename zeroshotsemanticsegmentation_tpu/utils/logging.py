"""Observability triple: stdout, CSV logs, TensorBoard.

Mirrors the reference's channels and tag names (trainer_fcn.py:66-81,167-178,
226-267; train.py:54,288-300): per-iteration train CSVs + scalars, per-epoch
val CSVs + scalars with seen/unseen breakdowns, config YAML dump, elapsed
wall-clock column (US/Eastern epoch start, trainer_fcn.py:43).

TensorBoard via tensorboardX when importable; silently disabled otherwise
(air-gapped test environments).
"""

from __future__ import annotations

import datetime
import os
import os.path as osp
from zoneinfo import ZoneInfo

_TZ = ZoneInfo("America/New_York")


class RunLogger:
    def __init__(self, log_dir: str, *, tb_dir: str | None = None,
                 tensorboard: bool = True, verbose: bool = True):
        self.log_dir = log_dir
        self.verbose = verbose
        os.makedirs(log_dir, exist_ok=True)
        self.timestamp_start = datetime.datetime.now(_TZ)
        self._tb = None
        if tensorboard:
            try:
                from tensorboardX import SummaryWriter
                self._tb = SummaryWriter(tb_dir or osp.join(log_dir, "tb"))
            except Exception:
                self._tb = None

    @property
    def elapsed_seconds(self) -> float:
        return (datetime.datetime.now(_TZ) - self.timestamp_start).total_seconds()

    # -- channels ----------------------------------------------------------

    def stdout(self, msg: str) -> None:
        if self.verbose:
            print(msg, flush=True)

    def csv_append(self, fname: str, headers: list[str], row: list) -> None:
        path = osp.join(self.log_dir, fname)
        if not osp.exists(path):
            with open(path, "w") as f:
                f.write(",".join(headers) + "\n")
        with open(path, "a") as f:
            f.write(",".join(str(x) for x in row) + "\n")

    def scalar(self, tag: str, value, step: int) -> None:
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), int(step))

    def scalars(self, prefix: str, names: list[str], values, step: int) -> None:
        for n, v in zip(names, values):
            self.scalar(f"{prefix}/{n}", v, step)

    def image(self, tag: str, img, step: int) -> None:
        if self._tb is not None:
            self._tb.add_image(tag, img, int(step), dataformats="HWC")

    def text(self, tag: str, s: str) -> None:
        if self._tb is not None:
            self._tb.add_text(tag, s)

    def dump_config(self, cfg_dict: dict) -> None:
        """config.yaml + stdout + TB text (reference train.py:288-300)."""
        import yaml
        for k, v in cfg_dict.items():
            self.stdout(f"{k} {v}")
        with open(osp.join(self.log_dir, "config.yaml"), "w") as f:
            yaml.safe_dump(cfg_dict, f, default_flow_style=False)
        self.text("cfg", "\n".join(f"{k}: {v}" for k, v in cfg_dict.items()))

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
