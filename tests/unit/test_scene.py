"""Scene building: orbit placement physics, unit wiring (SURVEY.md §2.8)."""
import jax.numpy as jnp
import numpy as np
import pytest

from oc_nbody_tpu.config import SimConfig
from oc_nbody_tpu.models.potentials import milky_way
from oc_nbody_tpu.scene import (build_scene, build_units,
                                eccentric_orbit_ic, place_on_orbit)
from oc_nbody_tpu.utils.units import G_PC_MYR_MSUN


def _mw():
    return milky_way(G=G_PC_MYR_MSUN)


def test_circular_orbit_placement():
    cfg = SimConfig()
    cfg.units.kind = "physical"
    cfg.ic.n = 32
    cfg.potential.kind = "milky_way"
    cfg.orbit.kind = "circular"
    cfg.orbit.R0_pc = 8000.0
    scene = build_scene(cfg)
    com = np.asarray(scene.state.com())
    np.testing.assert_allclose(com, [8000.0, 0.0, 0.0], atol=1.0)
    vc = float(_mw().vcirc(8000.0))
    np.testing.assert_allclose(np.asarray(scene.state.com_vel()),
                               [0.0, vc, 0.0], atol=0.5)


def test_eccentric_orbit_turning_points():
    """The (r_apo, r_peri) phase-space point conserves E and L with the
    correct turning radii: check vis-viva consistency at both."""
    mw = _mw()
    r_apo, r_peri = 8000.0, 4000.0
    pos0, vel0 = eccentric_orbit_ic(mw, r_apo, r_peri)
    E = 0.5 * float(jnp.sum(vel0**2)) + float(mw.phi(pos0))
    L = float(jnp.linalg.norm(jnp.cross(pos0, vel0)))
    # at pericentre the same E, L must give a purely tangential speed
    v_peri = L / r_peri
    E_peri = 0.5 * v_peri**2 + float(mw.phi_R(jnp.asarray(r_peri)))
    assert E == pytest.approx(E_peri, rel=1e-10)
    # radial velocity at apo is zero by construction
    assert float(pos0[1]) == 0.0 and float(vel0[0]) == 0.0


def test_inclined_orbit():
    cfg = SimConfig()
    cfg.units.kind = "physical"
    cfg.ic.n = 16
    cfg.potential.kind = "milky_way"
    cfg.orbit.kind = "eccentric"
    cfg.orbit.r_apo_pc = 8000.0
    cfg.orbit.r_peri_pc = 4000.0
    cfg.orbit.inclination_deg = 30.0
    scene = build_scene(cfg)
    v = np.asarray(scene.state.com_vel())
    # velocity has a z-component = v_t * sin(30 deg)
    assert abs(v[2]) > 0.4 * np.linalg.norm(v) * 0.5


def test_henon_units_scaling():
    cfg = SimConfig()
    us = build_units(cfg)
    assert us.G == pytest.approx(1.0)
    # MW potential converted into code units gives the same physical v_c
    from oc_nbody_tpu.scene import build_external_potential
    cfg.potential.kind = "milky_way"
    pot = build_external_potential(cfg, us)
    vc_code = float(pot.vcirc(8000.0 / us.length_pc))
    vc_kms = vc_code * us.velocity_kms
    assert 200 < vc_kms < 260


def test_orbit_requires_potential():
    cfg = SimConfig()
    cfg.orbit.kind = "circular"
    with pytest.raises(ValueError):
        build_scene(cfg)
