#!/usr/bin/env python
"""Assert the production programs capture NO device arrays as constants.

Why: on this platform ANY device->host readback permanently collapses
host->device bandwidth for the process (~1.3 GB/s -> ~15-40 MB/s;
probe_h2d.py d2h_only — an 84-byte np.asarray readback with no compute
suffices). A jitted program that closes over a jax.Array hits this at
LOWERING time: the device const is read back to inline its literal
(closure_tiny / closure_conv collapsed; closure_np was clean). Host numpy
constants never round-trip. This is a second trigger independent of the
XLA-dot one that scripts/audit_dots.py guards. The rule for hot programs:

  * arrays reaching a jitted program must be explicit call arguments, OR
  * small host np constants (inlined literals; keep them tiny — multi-MB
    literals bloat the StableHLO and stall the remote compile helper).

This audit traces each production program (no compile; backend-agnostic)
and walks the jaxpr tree collecting every constant that is a jax.Array.
It also flags big (>1 MB) np literal consts as warnings. Exits nonzero on
any device-array const.

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/audit_consts.py [prog ...]

progs: train eval seenmask serving (default: all).
"""

import json
import os.path as osp
import sys

_REPO_ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

BIG_LITERAL_BYTES = 1 << 20


def _walk_consts(closed_jaxpr, out, seen):
    """Collect consts from a ClosedJaxpr and every nested closed jaxpr."""
    if id(closed_jaxpr) in seen:
        return
    seen.add(id(closed_jaxpr))
    for c in closed_jaxpr.consts:
        out.append(c)
    for eqn in closed_jaxpr.jaxpr.eqns:
        for v in eqn.params.values():
            for cj in _nested_jaxprs(v):
                _walk_consts(cj, out, seen)


def _nested_jaxprs(v):
    from jax.extend.core import ClosedJaxpr
    if isinstance(v, ClosedJaxpr):
        yield v
    elif isinstance(v, (list, tuple)):
        for x in v:
            yield from _nested_jaxprs(x)
    elif isinstance(v, dict):
        for x in v.values():
            yield from _nested_jaxprs(x)


def audit(name: str, fn, args) -> dict:
    import jax
    import numpy as np
    traced = fn.trace(*args)
    consts = []
    _walk_consts(traced.jaxpr, consts, set())
    device, big_np = [], []
    for c in consts:
        if isinstance(c, jax.Array):
            device.append(f"{c.dtype}{list(c.shape)}")
        elif isinstance(c, np.ndarray) and c.nbytes > BIG_LITERAL_BYTES:
            big_np.append(f"{c.dtype}{list(c.shape)}={c.nbytes >> 20}MB")
    print(f"== {name}: {len(consts)} consts, "
          f"{len(device)} device arrays, {len(big_np)} big np literals ==")
    for d in device:
        print(f"  DEVICE {d}")
    for b in big_np:
        print(f"  big-literal {b}")
    return {"consts": len(consts), "device": device, "big_np": big_np}


def main(argv):
    from audit_dots import BUILDERS
    progs = argv or ["train", "eval", "seenmask", "serving"]
    out = {}
    for p in progs:
        fn, args = BUILDERS[p]()
        out[p] = audit(p, fn, args)
    print(json.dumps({k: len(v["device"]) for k, v in out.items()}))
    with open("/tmp/audit_consts.json", "w") as f:
        json.dump(out, f, indent=1)
    return 1 if any(v["device"] for v in out.values()) else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
