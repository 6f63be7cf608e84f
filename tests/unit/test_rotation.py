"""models/rotation.py — the Lynden-Bell sign-flip must add net Lz while
leaving every particle's energy and L² untouched (equilibrium preserved)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oc_nbody_tpu.config import SimConfig
from oc_nbody_tpu.models.plummer import plummer
from oc_nbody_tpu.models.rotation import add_rotation
from oc_nbody_tpu.scene import build_scene


def _lz(state):
    return np.sum(np.asarray(state.mass, np.float64)
                  * (np.asarray(state.pos[:, 0]) * np.asarray(state.vel[:, 1])
                     - np.asarray(state.pos[:, 1]) * np.asarray(state.vel[:, 0])))


def _l2_per_particle(state):
    L = np.cross(np.asarray(state.pos), np.asarray(state.vel))
    return np.sum(L * L, axis=1)


def test_full_rotation_aligns_every_star():
    state = plummer(512, jax.random.PRNGKey(0))
    rot = add_rotation(state, jax.random.PRNGKey(1), 1.0)
    # positions, masses untouched; |v| (hence each particle's energy in
    # any spherical potential) and L² exactly preserved
    np.testing.assert_array_equal(np.asarray(rot.pos), np.asarray(state.pos))
    np.testing.assert_array_equal(np.asarray(rot.mass),
                                  np.asarray(state.mass))
    v2_old = np.sum(np.asarray(state.vel) ** 2, axis=1)
    v2_new = np.sum(np.asarray(rot.vel) ** 2, axis=1)
    np.testing.assert_allclose(v2_new, v2_old, rtol=1e-12)
    np.testing.assert_allclose(_l2_per_particle(rot),
                               _l2_per_particle(state), rtol=1e-9)
    # every star prograde: per-star Lz >= 0 (within rounding of on-plane
    # geometry), and the net Lz is large
    lz_i = (np.asarray(rot.pos[:, 0]) * np.asarray(rot.vel[:, 1])
            - np.asarray(rot.pos[:, 1]) * np.asarray(rot.vel[:, 0]))
    assert np.all(lz_i > -1e-12)
    assert _lz(rot) > 10.0 * abs(_lz(state))


def test_partial_rotation_interpolates_and_zero_is_noop():
    state = plummer(2048, jax.random.PRNGKey(2))
    assert add_rotation(state, jax.random.PRNGKey(3), 0.0) is state
    lz_half = _lz(add_rotation(state, jax.random.PRNGKey(3), 0.5))
    lz_full = _lz(add_rotation(state, jax.random.PRNGKey(3), 1.0))
    assert 0.3 * lz_full < lz_half < 0.7 * lz_full

    with pytest.raises(ValueError):
        add_rotation(state, jax.random.PRNGKey(3), 1.5)


def test_config_surface_and_virial_equilibrium():
    """ic.rotation through build_scene: the rotating model must report the
    same virial ratio as the non-rotating one (energies untouched)."""
    def scene_for(rot):
        cfg = SimConfig.from_dict({
            "ic": {"n": 1024, "seed": 4, "rotation": rot},
            "integrator": {"dt": 1.0 / 64, "eps": 1.0 / 32},
            "output": {"out_dir": "/tmp/ignored", "stdout": False},
        })
        cfg.backend = "jnp"
        return build_scene(cfg)

    s0 = scene_for(0.0)
    s1 = scene_for(1.0)
    np.testing.assert_array_equal(np.asarray(s0.state.pos),
                                  np.asarray(s1.state.pos))
    ke0 = float(jnp.sum(0.5 * s0.state.mass
                        * jnp.sum(s0.state.vel ** 2, axis=1)))
    ke1 = float(jnp.sum(0.5 * s1.state.mass
                        * jnp.sum(s1.state.vel ** 2, axis=1)))
    np.testing.assert_allclose(ke1, ke0, rtol=1e-12)
    assert _lz(s1.state) > 10.0 * abs(_lz(s0.state))


def test_rotating_model_stays_in_equilibrium():
    """The Lynden-Bell flip claims the model remains a stationary
    solution. Integrate a maximally rotating Plummer for ~4 crossing
    times: Lagrangian radii must hold within N-body noise of the
    non-rotating control, and Lz must be conserved."""
    from oc_nbody_tpu.run import run

    def res_for(rot, out):
        cfg = SimConfig.from_dict({
            "ic": {"n": 1024, "seed": 5, "rotation": rot},
            "integrator": {"dt": 1.0 / 128, "eps": 1.0 / 32},
            "output": {"out_dir": out, "t_end": 12.0, "diag_every": 3.0,
                       "snap_every": 12.0, "stdout": False},
        })
        cfg.backend = "jnp"
        return run(cfg)

    import tempfile
    with tempfile.TemporaryDirectory() as td:
        r1 = res_for(1.0, td + "/rot")
        r0 = res_for(0.0, td + "/norot")
    d1, d0 = r1.diagnostics, r0.diagnostics
    # Lz conserved through the integration
    np.testing.assert_allclose(d1["Lz"][-1], d1["Lz"][0], rtol=1e-3)
    assert d1["Lz"][0] > 10 * abs(d0["Lz"][0])
    # structural stability: half-mass radius drifts no more than the
    # non-rotating control's own relaxation drift (+50% slack)
    def drift(d):
        return abs(d["r_lagr_50"][-1] / d["r_lagr_50"][0] - 1.0)
    assert drift(d1) < max(1.5 * drift(d0), 0.08), (
        f"rotating model drifted {drift(d1):.3f} vs control {drift(d0):.3f}")
