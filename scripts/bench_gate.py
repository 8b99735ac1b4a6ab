#!/usr/bin/env python
"""Perf ratchet: fail loudly when a fresh bench run regresses >20% vs the
last committed record (VERDICT r3 item 4 — the round-3 serving collapse
shipped because a hot-path rewrite was never re-benchmarked).

Usage:
    python scripts/bench_gate.py [--train] [--update]

Steps:
  1. scripts/platform_health.py — if the platform control itself is sick
     (<20 TFLOP/s on a trivial conv chain), REFUSE to gate: a degraded
     tunnel indicts nothing. Exit 3 with the evidence.
  2. bench.py (or bench.py --train) — fresh number.
  3. Compare against the committed record (BENCH_r*.json best / committed
     bench baseline for serving, BENCH_TRAIN.json for train):
     fresh < 0.8 * record  ->  exit 1 (regression), print both numbers.
  4. --update: on pass, rewrite the record file with the fresh result.

Run this after ANY change under ops/ or models/, and at end of round
(CLAUDE.md). Exit codes: 0 ok, 1 regression, 3 platform sick.
"""

import json
import os.path as osp
import subprocess
import sys

_REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
_RECORD = {
    "serving": osp.join(_REPO, "BENCH_RECORD.json"),
    "train": osp.join(_REPO, "BENCH_TRAIN.json"),
}


def _run_json(cmd):
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=_REPO)
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if out.returncode not in (0, 1) or not lines:
        print(out.stdout + out.stderr, file=sys.stderr)
        raise RuntimeError(f"{cmd} failed rc={out.returncode}")
    return json.loads(lines[-1]), out.returncode


def main(argv):
    kind = "train" if "--train" in argv else "serving"
    update = "--update" in argv

    health, rc = _run_json([sys.executable,
                            osp.join(_REPO, "scripts/platform_health.py")])
    print(f"platform: {json.dumps(health)}")
    if not health.get("healthy"):
        print("PLATFORM SICK — refusing to gate (a degraded tunnel indicts "
              "nothing; retry later). Evidence above.", file=sys.stderr)
        return 3

    bench_cmd = [sys.executable, osp.join(_REPO, "bench.py")]
    if kind == "train":
        bench_cmd.append("--train")
    fresh, _ = _run_json(bench_cmd)
    print(f"fresh: {json.dumps(fresh)}")

    rec_path = _RECORD[kind]
    if not osp.exists(rec_path):
        print(f"no record at {rec_path}; writing fresh result as the record")
        with open(rec_path, "w") as f:
            json.dump(fresh, f)
        return 0
    with open(rec_path) as f:
        record = json.load(f)
    print(f"record: {json.dumps(record)}")

    if fresh["value"] < 0.8 * record["value"]:
        print(f"REGRESSION: {fresh['value']} < 0.8 * {record['value']} "
              f"({fresh['unit']}) — bisect before committing.",
              file=sys.stderr)
        return 1
    if update and fresh["value"] > record["value"]:
        with open(rec_path, "w") as f:
            json.dump(fresh, f)
        print(f"record updated: {record['value']} -> {fresh['value']}")
    print("gate: OK")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
