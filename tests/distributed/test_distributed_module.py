"""Single-process coverage for the multi-host shim (VERDICT round-1 W7).

A single host cannot exercise real cross-host DCN, but the shim's contract
— argument forwarding, already-initialised tolerance, and the single-process
degenerate values — is testable here, so none of its lines are dead.
"""
import jax
import pytest

from oc_nbody_tpu.parallel import distributed as dist


def test_single_process_degenerates():
    assert dist.is_multihost() is False
    devs = dist.global_mesh_devices()
    assert list(devs) == list(jax.devices())


def test_initialize_forwards_kwargs(monkeypatch):
    seen = {}

    def fake_init(**kwargs):
        seen.update(kwargs)

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    dist.initialize_multihost("10.0.0.1:1234", num_processes=4, process_id=2)
    assert seen == {"coordinator_address": "10.0.0.1:1234",
                    "num_processes": 4, "process_id": 2}
    # no-arg autodetect passes nothing through
    seen.clear()
    dist.initialize_multihost()
    assert seen == {}


def test_initialize_tolerates_reinit(monkeypatch):
    def raise_already(**kwargs):
        raise RuntimeError("jax.distributed is already initialized")

    monkeypatch.setattr(jax.distributed, "initialize", raise_already)
    dist.initialize_multihost()  # must not raise

    def raise_other(**kwargs):
        raise RuntimeError("coordinator unreachable")

    monkeypatch.setattr(jax.distributed, "initialize", raise_other)
    with pytest.raises(RuntimeError, match="unreachable"):
        dist.initialize_multihost()
