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
        self._csv_files: dict[str, object] = {}
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
        """Line-buffered persistent handles: at real-dataset scale this runs
        8.5k times/epoch — reopening the file per row costs more than the
        write. Rows stay readable immediately (flush per line) so tailing a
        live run and mid-run crashes both see every logged row."""
        f = self._csv_files.get(fname)
        if f is None:
            path = osp.join(self.log_dir, fname)
            fresh = not osp.exists(path)
            f = open(path, "a")
            self._csv_files[fname] = f
            if fresh:
                f.write(",".join(headers) + "\n")
        f.write(",".join(str(x) for x in row) + "\n")
        f.flush()

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
        for f in self._csv_files.values():
            f.close()
        self._csv_files.clear()
        if self._tb is not None:
            self._tb.close()
