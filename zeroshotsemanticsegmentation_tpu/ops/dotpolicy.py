"""Dot-free programs are a MODE, not an identity.

This workspace's axon tunnel permanently collapses host->device bandwidth
when any XLA executable containing a `dot`/`dot_general` is compiled or
loaded (bisected in scripts/probe_h2d.py; full story in CLAUDE.md). Round 3
therefore rewrote every production contraction into dot-free forms
(ops/dotless multiply-reduce, ops/bilinear tap blend, Pallas matmul twins).
Those forms are oracle-tested and exact — but on a clean TPU without the
tunnel they are at best neutral and plausibly slower than the MXU einsum
forms XLA was already lowering well. Per CLAUDE.md's own rule ("keep
production paths clean but don't contort the architecture around it"), the
choice is a policy, resolved once per process:

    SZN_DOT_FREE=auto   (default) dot-free only when the axon tunnel is
                        detected (PALLAS_AXON_POOL_IPS / JAX_PLATFORMS=axon)
    SZN_DOT_FREE=1      always dot-free
    SZN_DOT_FREE=0      always MXU einsum/dot forms

Both paths are oracle-tested (tests/test_dotless.py runs the suite under
each forced mode). The policy is read at TRACE time: ops that are jitted
directly thread it as a static argument; everything else is traced inside
the caller's jit, so a process-level pin (the default) is always coherent.
Tests that flip the mode via `set_dot_free` must build fresh jits (the
leaf helpers here are not themselves cached).
"""

from __future__ import annotations

import os

_VALID = ("auto", "0", "1")
_cached: bool | None = None


def axon_tunnel_detected() -> bool:
    """True when running through the axon remote-TPU tunnel (this
    workspace), the platform whose H2D collapse motivates dot-free mode."""
    return bool(os.environ.get("PALLAS_AXON_POOL_IPS")) or (
        "axon" in os.environ.get("JAX_PLATFORMS", ""))


def dot_free() -> bool:
    """Resolve the process-level dot policy (cached after first read)."""
    global _cached
    if _cached is None:
        mode = os.environ.get("SZN_DOT_FREE", "auto").strip().lower()
        if mode not in _VALID:
            raise ValueError(
                f"SZN_DOT_FREE must be one of {_VALID}, got {mode!r}")
        _cached = axon_tunnel_detected() if mode == "auto" else mode == "1"
    return _cached


def set_dot_free(value: bool | None) -> None:
    """Force (True/False) or reset (None -> re-read env) the policy.

    Test hook. Callers must not reuse jit caches built under the other
    mode — the jitted entry points thread the policy as a static arg, but
    ad-hoc jits around the leaf helpers would go stale.
    """
    global _cached
    _cached = value
