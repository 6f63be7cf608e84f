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


# ---------------------------------------------------------------------------
# Time-dependent additions: [potential.perturber] / [potential.bar] wiring
# (SURVEY.md §2.4 extension; models/potentials.py time-dependent section)
# ---------------------------------------------------------------------------

from oc_nbody_tpu.models import potentials as pot_mod
from oc_nbody_tpu.utils.units import KMS_IN_PC_PER_MYR


def _perturber_cfg():
    cfg = SimConfig()
    cfg.ic.n = 32
    cfg.potential.kind = "milky_way"
    cfg.orbit.kind = "circular"
    cfg.orbit.R0_pc = 8000.0
    cfg.potential.perturber.kind = "plummer"
    cfg.potential.perturber.mass_msun = 5.0e5
    cfg.potential.perturber.scale_pc = 15.0
    cfg.potential.perturber.trajectory = "linear"
    cfg.potential.perturber.x0_pc = (8030.0, -500.0, 0.0)
    cfg.potential.perturber.v0_kms = (0.0, 280.0, 0.0)
    return cfg


def test_perturber_wiring_units_and_structure():
    """[potential.perturber] builds a MovingCenter composed with the host,
    with mass/length/velocity correctly converted to code units."""
    cfg = _perturber_cfg()
    scene = build_scene(cfg)
    us = scene.units
    ext = scene.force.external
    assert isinstance(ext, pot_mod.Composite)
    movers = [c for c in ext.components
              if isinstance(c, pot_mod.MovingCenter)]
    assert len(movers) == 1
    mc = movers[0]
    assert isinstance(mc.base, pot_mod.PlummerSphere)
    assert float(mc.base.GM) == pytest.approx(
        us.G * 5.0e5 / us.mass_msun, rel=1e-12)
    assert float(mc.base.b) == pytest.approx(15.0 / us.length_pc, rel=1e-12)
    # trajectory position at t=0 is the configured start, in code units
    x0 = np.asarray(mc.trajectory(jnp.asarray(0.0)))
    np.testing.assert_allclose(
        x0, np.array([8030.0, -500.0, 0.0]) / us.length_pc, rtol=1e-12)
    # velocity: after one code time unit it has moved v0 (code units)
    x1 = np.asarray(mc.trajectory(jnp.asarray(1.0)))
    v_code = np.array([us.to_code(v, "velocity") for v in (0.0, 280.0, 0.0)])
    np.testing.assert_allclose(x1 - x0, v_code, rtol=1e-10)


def test_perturber_orbit_placement_uses_host_only():
    """The cluster's circular speed must balance the HOST potential alone —
    a transient perturber is not part of the orbit's centrifugal balance."""
    cfg = _perturber_cfg()
    v_with = np.asarray(build_scene(cfg).state.com_vel())
    cfg2 = _perturber_cfg()
    cfg2.potential.perturber.kind = "none"
    v_without = np.asarray(build_scene(cfg2).state.com_vel())
    np.testing.assert_allclose(v_with, v_without, rtol=1e-12)


def test_perturber_circular_rate_derived_from_host():
    cfg = _perturber_cfg()
    cfg.potential.perturber.trajectory = "circular"
    cfg.potential.perturber.radius_pc = 6000.0
    cfg.potential.perturber.period_myr = 0.0
    scene = build_scene(cfg)
    us = scene.units
    mc = [c for c in scene.force.external.components
          if isinstance(c, pot_mod.MovingCenter)][0]
    R = 6000.0 / us.length_pc
    from oc_nbody_tpu.scene import build_external_potential
    host = build_external_potential(cfg, us)
    assert float(mc.trajectory.omega) == pytest.approx(
        float(host.vcirc(R)) / R, rel=1e-6)


def test_perturber_circular_requires_host_or_period():
    cfg = _perturber_cfg()
    cfg.potential.kind = "none"
    cfg.orbit.kind = "none"
    cfg.potential.perturber.trajectory = "circular"
    cfg.potential.perturber.period_myr = 0.0
    with pytest.raises(ValueError, match="period_myr"):
        build_scene(cfg)


def test_bar_wiring_ramped_rotating():
    """[potential.bar] with grow_myr > 0 builds Ramped(Rotating(bar)) with
    the pattern speed converted km/s/kpc → code angular rate."""
    cfg = SimConfig()
    cfg.ic.n = 32
    cfg.potential.kind = "milky_way"
    cfg.orbit.kind = "circular"
    cfg.orbit.R0_pc = 4000.0
    cfg.potential.bar.kind = "long_murali"
    cfg.potential.bar.pattern_speed_kms_kpc = 39.0
    cfg.potential.bar.grow_myr = 100.0
    scene = build_scene(cfg)
    us = scene.units
    ramped = [c for c in scene.force.external.components
              if isinstance(c, pot_mod.Ramped)]
    assert len(ramped) == 1
    rot = ramped[0].base
    assert isinstance(rot, pot_mod.Rotating)
    assert isinstance(rot.base, pot_mod.LongMuraliBar)
    omega_myr = 39.0 * KMS_IN_PC_PER_MYR / 1000.0
    assert float(rot.omega_p) == pytest.approx(omega_myr * us.time_myr,
                                               rel=1e-12)
    assert float(ramped[0].t1) == pytest.approx(us.to_code(100.0, "time"),
                                                rel=1e-12)
    # no growth window → plain Rotating at top level
    cfg.potential.bar.grow_myr = 0.0
    scene2 = build_scene(cfg)
    assert any(isinstance(c, pot_mod.Rotating)
               for c in scene2.force.external.components)


def test_nested_config_section_unknown_key_is_loud():
    with pytest.raises(KeyError, match="potential.perturber.bogus"):
        SimConfig.from_dict(
            {"potential": {"perturber": {"bogus": 1.0}}})


def test_nested_config_roundtrip_from_dict():
    cfg = SimConfig.from_dict({
        "potential": {"kind": "milky_way",
                      "bar": {"kind": "long_murali",
                              "pattern_speed_kms_kpc": 33.0}}})
    assert cfg.potential.bar.kind == "long_murali"
    assert cfg.potential.bar.pattern_speed_kms_kpc == 33.0
    # sibling defaults untouched
    assert cfg.potential.perturber.kind == "none"


def test_config_section_scalar_is_loud():
    """A scalar where a nested section is expected fails at parse time,
    not as a distant AttributeError (round-3 review fix)."""
    with pytest.raises(TypeError, match="potential.perturber"):
        SimConfig.from_dict({"potential": {"perturber": 3}})
    from oc_nbody_tpu.config import apply_overrides
    with pytest.raises(TypeError, match="config section"):
        apply_overrides(SimConfig(), ["potential.perturber=x"])
