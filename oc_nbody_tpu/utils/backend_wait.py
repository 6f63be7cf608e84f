"""Ride out transient TPU-grant outages at entry points.

This environment's TPU backend (a remote relay) has exhibited extended
init outages: PJRT init hangs for many minutes, then fails UNAVAILABLE;
a later attempt succeeds once the grant clears. Entry points that MUST
produce a result on TPU (bench.py, __graft_entry__.entry) probe the
backend in a SUBPROCESS — so a hung init can never wedge the calling
process — and retry within a bounded budget before handing over to the
real (possibly failing) init.
"""
from __future__ import annotations

import os
import subprocess
import sys
import time


def _cpu_pinned() -> bool:
    """True when this process is already configured for the CPU backend —
    then the TPU relay is never touched and waiting on it would be a pure
    stall (measured: the test suite's entry-point test blocked ~30 min
    during a grant outage on a probe its CPU run could never need).
    Reading jax.config does NOT initialise backends."""
    try:
        import jax
        plats = getattr(jax.config, "jax_platforms", None) or ""
        return plats.split(",")[0].strip() == "cpu"
    except Exception:
        return False


def wait_for_backend(budget_s: float = 1800.0, probe_s: float = 150.0,
                     sleep_s: float = 120.0) -> None:
    """Block until a `jax.devices()` probe succeeds, or the budget is spent
    (then return anyway and let the caller's init produce the genuine
    error). No-op cost when the backend is healthy: one fast subprocess.
    Skipped entirely for CPU-pinned processes and under
    OCN_SKIP_BACKEND_WAIT=1."""
    if os.environ.get("OCN_SKIP_BACKEND_WAIT") == "1" or _cpu_pinned():
        return
    deadline = time.monotonic() + budget_s
    while True:
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; jax.devices(); print('ok')"],
                capture_output=True, timeout=probe_s, text=True)
            if r.returncode == 0 and "ok" in r.stdout:
                return
        except subprocess.TimeoutExpired:
            pass  # init hang — treat as a failed probe
        if time.monotonic() > deadline:
            return
        time.sleep(sleep_s)
