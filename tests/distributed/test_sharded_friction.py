"""Dynamical friction on the mesh (round-4 seam): the rigid CoM drag is
an O(1) add on the global state outside shard_map, so a sharded inspiral
must match the single-device one — kernel-level (ShardedForce vs the
ForceModel oracle) and driver-level (run() on the 8-device emulated
mesh), for the shared-dt and block integrators."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oc_nbody_tpu.config import SimConfig
from oc_nbody_tpu.forces import make_force_model
from oc_nbody_tpu.models.friction import ChandrasekharFriction
from oc_nbody_tpu.models.potentials import Hernquist
from oc_nbody_tpu.parallel import make_mesh, make_sharded_force
from oc_nbody_tpu.run import run

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (emulated) devices"
)


def _setup(n=96, seed=2):
    key = jax.random.PRNGKey(seed)
    pos = jax.random.normal(key, (n, 3), jnp.float64) * 0.3
    pos = pos + jnp.asarray([120.0, 0.0, 0.0])       # off-centre: v, rho > 0
    vel = jax.random.normal(jax.random.fold_in(key, 1), (n, 3),
                            jnp.float64) * 0.1
    vel = vel + jnp.asarray([0.0, 0.8, 0.0])
    mass = jnp.full((n,), 1.0 / n, jnp.float32)
    host = Hernquist(GM=jnp.asarray(4000.0), a=jnp.asarray(700.0))
    fr = ChandrasekharFriction(host=host, G=jnp.asarray(1.0),
                               ln_lambda=jnp.asarray(6.0),
                               sigma=jnp.asarray(0.0))
    return pos, vel, mass, host, fr


@pytest.mark.parametrize("mode", ["allgather", "ring", "halfring"])
def test_sharded_accel_with_friction_matches_oracle(mode):
    pos, vel, mass, host, fr = _setup()
    oracle = make_force_model(eps=1.0 / 16, external=host, backend="jnp",
                              friction=fr)
    sf = make_sharded_force(eps=1.0 / 16, external=host, backend="jnp",
                            mesh=make_mesh(8), mode=mode, friction=fr)
    ref = np.asarray(oracle.accel(pos, mass, vel=vel))
    scale = np.abs(ref).max()
    # scale-relative f32 summation-order tolerance (test_sharded_force.py)
    np.testing.assert_allclose(np.asarray(sf.accel(pos, mass, vel=vel)),
                               ref, atol=3e-6 * scale)
    a, j = sf.accel_jerk(pos, vel, mass)
    a1, j1 = oracle.accel_jerk(pos, vel, mass)
    np.testing.assert_allclose(np.asarray(a), np.asarray(a1),
                               atol=3e-6 * scale)
    jscale = np.abs(np.asarray(j1)).max()
    np.testing.assert_allclose(np.asarray(j), np.asarray(j1),
                               atol=3e-5 * jscale)
    # the drag is non-trivial in this setup (not comparing zero to zero)
    bare = make_sharded_force(eps=1.0 / 16, external=host, backend="jnp",
                              mesh=make_mesh(8), mode=mode)
    diff = np.abs(np.asarray(sf.accel(pos, mass, vel=vel))
                  - np.asarray(bare.accel(pos, mass)))
    assert diff.max() > 1e-12


def test_sharded_accel_with_friction_requires_vel():
    pos, vel, mass, host, fr = _setup()
    sf = make_sharded_force(eps=1.0 / 16, external=host, backend="jnp",
                            mesh=make_mesh(8), friction=fr)
    with pytest.raises(ValueError, match="vel"):
        sf.accel(pos, mass)


def _cfg(tmp_path, name, kind="kdk", n_devices=8):
    cfg = SimConfig.from_dict({
        "units": {"kind": "henon", "mass_msun": 2e4, "length_pc": 10.0},
        "ic": {"kind": "plummer", "n": 96, "seed": 5},
        "potential": {"kind": "milky_way"},
        "orbit": {"kind": "circular", "R0_pc": 300.0},
        "friction": {"kind": "chandrasekhar", "ln_lambda": 6.0},
        "integrator": {"kind": kind, "dt": 1.0 / 128, "eps": 1.0 / 16,
                       "dt_max": 1.0 / 16},
        "output": {"out_dir": str(tmp_path / name), "t_end": 0.25,
                   "diag_every": 0.125, "stdout": False},
    })
    cfg.backend = "jnp"
    cfg.mesh.n_devices = n_devices
    return cfg


@pytest.mark.parametrize("kind", ["kdk", "hermite", "block"])
def test_driver_friction_on_mesh_matches_single_device(tmp_path, kind):
    res8 = run(_cfg(tmp_path, f"m8_{kind}", kind=kind))
    res1 = run(_cfg(tmp_path, f"m1_{kind}", kind=kind, n_devices=1))
    np.testing.assert_allclose(np.asarray(res8.state.pos),
                               np.asarray(res1.state.pos), atol=1e-5)
    np.testing.assert_allclose(res8.diagnostics["a_df"],
                               res1.diagnostics["a_df"], rtol=1e-7)
    assert np.all(np.asarray(res8.diagnostics["a_df"]) > 0)
