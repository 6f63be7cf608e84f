"""wait_for_backend must never stall CPU-pinned processes (the test
suite, --platform cpu runs): during a TPU-grant outage the subprocess
probe hangs ~minutes per attempt, and a CPU run never needs the relay."""
import time

from oc_nbody_tpu.utils import backend_wait


def test_cpu_pinned_detected():
    # conftest pins the test process to the CPU platform
    assert backend_wait._cpu_pinned() is True


def test_wait_is_noop_when_cpu_pinned():
    t0 = time.monotonic()
    backend_wait.wait_for_backend(budget_s=5.0, probe_s=1.0, sleep_s=0.1)
    assert time.monotonic() - t0 < 0.5


def test_env_escape_hatch(monkeypatch):
    monkeypatch.setenv("OCN_SKIP_BACKEND_WAIT", "1")
    monkeypatch.setattr(backend_wait, "_cpu_pinned", lambda: False)
    t0 = time.monotonic()
    backend_wait.wait_for_backend(budget_s=5.0, probe_s=1.0, sleep_s=0.1)
    assert time.monotonic() - t0 < 0.5
