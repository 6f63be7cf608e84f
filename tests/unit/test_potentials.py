"""External potential unit tests: ∇Φ vs autodiff, v_circ, composition
(SURVEY.md §4.1)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oc_nbody_tpu.models import potentials as P
from oc_nbody_tpu.utils.units import G_PC_MYR_MSUN, KMS_IN_PC_PER_MYR


def _components():
    return [
        P.PointMass(GM=jnp.asarray(3.0)),
        P.Hernquist(GM=jnp.asarray(2.0), a=jnp.asarray(0.7)),
        P.MiyamotoNagai(GM=jnp.asarray(1.5), a=jnp.asarray(1.2), b=jnp.asarray(0.3)),
        P.NFW(GMs=jnp.asarray(4.0), rs=jnp.asarray(2.0)),
        P.LogHalo(v0=jnp.asarray(1.3), rc=jnp.asarray(0.8)),
    ]


@pytest.mark.parametrize("pot_idx", range(5))
def test_accel_is_minus_grad_phi(pot_idx):
    pot = _components()[pot_idx]
    key = jax.random.PRNGKey(pot_idx)
    xyz = jax.random.uniform(key, (16, 3), jnp.float64, -3.0, 3.0)
    a_auto = -jax.vmap(jax.grad(pot.phi))(xyz)
    a_hand = pot.accel(xyz)
    np.testing.assert_allclose(a_hand, a_auto, rtol=1e-10, atol=1e-12)


def test_point_mass_vcirc():
    pot = P.PointMass(GM=jnp.asarray(5.0))
    R = 2.5
    assert float(pot.vcirc(R)) == pytest.approx(np.sqrt(5.0 / R), rel=1e-10)


def test_composite_is_sum():
    comps = _components()
    comp = P.composite(comps)
    xyz = jnp.array([[1.0, -2.0, 0.5]])
    phi_sum = sum(float(c.phi(xyz)[0]) for c in comps)
    assert float(comp.phi(xyz)[0]) == pytest.approx(phi_sum, rel=1e-12)
    a_sum = sum(np.asarray(c.accel(xyz)) for c in comps)
    np.testing.assert_allclose(np.asarray(comp.accel(xyz)), a_sum, rtol=1e-12)


def test_milky_way_rotation_curve():
    """v_c(8 kpc) in the 220-250 km/s ballpark (physical units: pc/Myr/Msun)."""
    mw = P.milky_way(G=G_PC_MYR_MSUN)
    vc = float(mw.vcirc(8000.0)) / KMS_IN_PC_PER_MYR  # pc/Myr -> km/s
    assert 200.0 < vc < 260.0, vc


def test_milky_way_tidal_coefficient_positive():
    mw = P.milky_way(G=G_PC_MYR_MSUN)
    lam = float(mw.tidal_coefficient(8000.0))
    assert lam > 0
    # sanity: r_t for a 1e4 Msun cluster at 8 kpc is tens of pc
    rt = (G_PC_MYR_MSUN * 1e4 / lam) ** (1 / 3)
    assert 10.0 < rt < 100.0, rt


def test_nfw_finite_at_origin():
    pot = P.NFW(GMs=jnp.asarray(4.0), rs=jnp.asarray(2.0))
    phi0 = float(pot.phi(jnp.zeros((1, 3)))[0])
    assert phi0 == pytest.approx(-2.0, rel=1e-10)  # -GMs/rs
    a0 = np.asarray(pot.accel(jnp.zeros((1, 3))))
    assert np.all(np.isfinite(a0))


def test_second_radial_derivative_vs_fd():
    mw = P.milky_way(G=G_PC_MYR_MSUN)
    R = 8000.0
    h = 1.0
    fd = (float(mw.dphi_dR(R + h)) - float(mw.dphi_dR(R - h))) / (2 * h)
    assert float(mw.d2phi_dR2(R)) == pytest.approx(fd, rel=1e-6)


def test_log_halo_flat_rotation_curve():
    pot = P.LogHalo(v0=jnp.asarray(1.7), rc=jnp.asarray(0.5))
    # v_c -> v0 well outside the core; softened toward the centre
    assert float(pot.vcirc(100.0)) == pytest.approx(1.7, rel=1e-3)
    assert float(pot.vcirc(0.1)) < 0.5
    # config surface: v0_kms converts through the unit system
    from oc_nbody_tpu.config import SimConfig
    from oc_nbody_tpu.scene import build_external_potential
    from oc_nbody_tpu.utils.units import UnitSystem
    cfg = SimConfig.from_dict({
        "units": {"kind": "henon", "mass_msun": 1000.0, "length_pc": 10.0},
        "potential": {"kind": "log_halo", "v0_kms": 220.0, "rc_pc": 500.0},
    })
    us = UnitSystem.henon(mass_msun=1000.0, length_pc=10.0)
    pot = build_external_potential(cfg, us)
    v_phys = float(pot.vcirc(5000.0 / 10.0)) / us.to_code(1.0, "velocity")
    assert v_phys == pytest.approx(220.0, rel=1e-2)
