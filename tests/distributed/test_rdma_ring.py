"""RDMA ring force kernel (ops/pallas_ring.py) on the emulated 8-device mesh.

Runs the whole-ring-inside-one-Pallas-kernel path through the TPU
interpreter (pltpu.InterpretParams — the generic interpret=True cannot
emulate remote DMAs/semaphores) and asserts:

  * rdma-ring accel ≡ single-device f64 oracle,
  * the free-slot semaphore handshake is race-free under the interpreter's
    vector-clock race detector (SURVEY.md §5 "race detection" — this is
    the one place the engine has true asynchronous shared-memory writes),
  * a full KDK trajectory through ShardedForce(mode="rdma") matches the
    single-device reference.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import oc_nbody_tpu.ops.pallas_ring as pr
from oc_nbody_tpu.ops import gravity
from oc_nbody_tpu.parallel import make_mesh, make_sharded_force

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (emulated) devices"
)


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("OCN_PALLAS_INTERPRET", "1")
    jitted = (pr.accel_ring, pr.accel_potential_ring, pr.accel_jerk_ring)
    for fn in jitted:
        fn.clear_cache()
    yield
    for fn in jitted:
        fn.clear_cache()


def _cluster(n=120, seed=3):
    key = jax.random.PRNGKey(seed)
    kp, km = jax.random.split(key)
    pos = jax.random.normal(kp, (n, 3), jnp.float64)
    mass = jax.random.uniform(km, (n,), jnp.float64, 0.5, 1.5) / n
    return pos, mass


def test_rdma_ring_accel_matches_oracle():
    pos, mass = _cluster(n=120)  # not divisible by 8: exercises padding
    sf = make_sharded_force(eps=0.05, mesh=make_mesh(8), mode="rdma",
                            backend="pallas")
    out = jax.jit(sf.accel)(pos, mass)
    ref = gravity.accel(pos, mass, eps=0.05)
    scale = float(jnp.max(jnp.linalg.norm(ref, axis=1)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-6 * scale)


def test_rdma_ring_jerk_matches_oracle():
    """The accel+jerk RDMA ring (Hermite at scale): pos+vel+gm slab."""
    pos, mass = _cluster(n=112)
    vel = 0.3 * jax.random.normal(jax.random.PRNGKey(9), pos.shape,
                                  jnp.float64)
    sf = make_sharded_force(eps=0.05, mesh=make_mesh(8), mode="rdma",
                            backend="pallas")
    acc, jerk = jax.jit(sf.accel_jerk)(pos, vel, mass)
    acc_ref, jerk_ref = gravity.accel_jerk(pos, vel, mass, eps=0.05)
    ascale = float(jnp.max(jnp.linalg.norm(acc_ref, axis=1)))
    jscale = float(jnp.max(jnp.linalg.norm(jerk_ref, axis=1)))
    np.testing.assert_allclose(np.asarray(acc), np.asarray(acc_ref),
                               atol=5e-6 * ascale)
    np.testing.assert_allclose(np.asarray(jerk), np.asarray(jerk_ref),
                               atol=5e-5 * jscale)


def test_rdma_ring_potential_matches_oracle():
    """The accel+potential RDMA ring (sharded diagnostics path)."""
    pos, mass = _cluster(n=104)
    sf = make_sharded_force(eps=0.05, mesh=make_mesh(8), mode="rdma",
                            backend="pallas")
    acc, phi, phi_ext = jax.jit(sf.accel_potential)(pos, mass)
    acc_ref, phi_ref = gravity.accel_potential(pos, mass, eps=0.05)
    ascale = float(jnp.max(jnp.linalg.norm(acc_ref, axis=1)))
    np.testing.assert_allclose(np.asarray(acc), np.asarray(acc_ref),
                               atol=5e-6 * ascale)
    np.testing.assert_allclose(np.asarray(phi), np.asarray(phi_ref),
                               rtol=3e-5)
    assert float(jnp.max(jnp.abs(phi_ext))) == 0.0


def test_rdma_hermite_trajectory():
    """Hermite-4 with the RDMA jerk ring ≡ single-device jnp."""
    from oc_nbody_tpu.forces import make_force_model
    from oc_nbody_tpu.integrators.hermite import Hermite4
    from oc_nbody_tpu.models.plummer import plummer

    state = plummer(96, jax.random.PRNGKey(13))
    sf = make_sharded_force(eps=1.0 / 64, mesh=make_mesh(8), mode="rdma",
                            backend="pallas")
    fm = make_force_model(eps=1.0 / 64, backend="jnp")

    def advance(st, f):
        stepper = Hermite4(force=f, eta=0.02)
        carry = stepper.init(st)
        step = jax.jit(stepper.step)
        for _ in range(4):
            carry = step(carry)
        return carry

    c_sh = advance(state, sf)
    c_ref = advance(state, fm)
    np.testing.assert_allclose(np.asarray(c_sh.state.pos),
                               np.asarray(c_ref.state.pos), atol=1e-5)


def test_rdma_ring_race_free(monkeypatch, capsys):
    """The slot handshake under the interpreter's vector-clock race
    detector: any send overwriting a slot still being swept (or any
    missing semaphore edge) prints 'RACE DETECTED' and sets races_found."""
    monkeypatch.setenv("OCN_PALLAS_DETECT_RACES", "1")
    pr.accel_ring.clear_cache()
    pos, mass = _cluster(n=96)
    sf = make_sharded_force(eps=0.05, mesh=make_mesh(8), mode="rdma",
                            backend="pallas")
    out = jax.jit(sf.accel)(pos, mass)
    ref = gravity.accel(pos, mass, eps=0.05)
    scale = float(jnp.max(jnp.linalg.norm(ref, axis=1)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-6 * scale)
    captured = capsys.readouterr()
    assert "RACE" not in captured.out + captured.err
    from jax._src.pallas.mosaic.interpret import interpret_pallas_call as ipc
    assert ipc.races is None or not ipc.races.races_found
    pr.accel_ring.clear_cache()


def test_rdma_single_device_degenerates():
    """d=1 mesh: no RDMA is issued, pure local sweep."""
    pos, mass = _cluster(n=64)
    sf = make_sharded_force(eps=0.05, mesh=make_mesh(1), mode="rdma",
                            backend="pallas")
    out = jax.jit(sf.accel)(pos, mass)
    ref = gravity.accel(pos, mass, eps=0.05)
    scale = float(jnp.max(jnp.linalg.norm(ref, axis=1)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-6 * scale)


def test_rdma_kdk_trajectory():
    """Short KDK trajectory with the RDMA force ≡ single-device jnp
    (the external-field and stepper plumbing all ride on .accel)."""
    from oc_nbody_tpu.forces import make_force_model
    from oc_nbody_tpu.integrators.leapfrog import LeapfrogKDK
    from oc_nbody_tpu.models.plummer import plummer

    state = plummer(128, jax.random.PRNGKey(31))
    sf = make_sharded_force(eps=1.0 / 64, mesh=make_mesh(8), mode="rdma",
                            backend="pallas")
    fm = make_force_model(eps=1.0 / 64, backend="jnp")

    def advance(st, f):
        stepper = LeapfrogKDK(force=f, dt=1.0 / 256)
        return jax.jit(stepper.advance, static_argnums=1)(stepper.init(st), 8)

    c_sh = advance(state, sf)
    c_ref = advance(state, fm)
    np.testing.assert_allclose(np.asarray(c_sh.state.pos),
                               np.asarray(c_ref.state.pos), atol=1e-5)
