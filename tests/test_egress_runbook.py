"""scripts/egress_runbook.py --dry: the air-gapped rehearsal must stay green
so the first egress-enabled round can execute immediately (VERDICT r3 item 8).

Runs the real dry_run() in-process: synthetic torchvision-shaped .pth ->
torch load -> fc->conv surgery -> Flax forward vs the independent torch
oracle, plus the egress-day entry-point imports. This is the test that
catches wiring rot (it already caught the bf16-matmul-precision fidelity
bug the first time it ran).
"""

import importlib.util
import os.path as osp
import sys

_REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def _load_runbook():
    spec = importlib.util.spec_from_file_location(
        "zss_egress_runbook", osp.join(_REPO, "scripts", "egress_runbook.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_dry_run_green(capsys):
    rb = _load_runbook()
    rb.dry_run()  # asserts internally (fidelity gate < 1e-3)
    out = capsys.readouterr().out
    assert "dry run OK" in out
    assert "PASS: .pth load + surgery + oracle compare wired" in out
    assert "PASS: reference-checkpoint importer round-trips exactly" in out
    assert "step 4: reference-checkpoint cross-eval" in out
