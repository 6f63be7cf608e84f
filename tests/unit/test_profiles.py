"""analysis/profiles.py vs closed-form Plummer structure (SURVEY.md §4.1
IC statistics + §2.14 analysis scripts).

For an isotropic Plummer sphere with scale a and total mass M (G=1):
  rho(r)     = 3M/(4 pi a^3) (1 + r^2/a^2)^(-5/2)
  sigma_1d^2 = M / (6 sqrt(r^2 + a^2))   (per-component dispersion)
  beta       = 0 (isotropic)
The Henon-rescaled sampler in models/plummer.py produces a = 3 pi / 16
in N-body units (virial radius 1).
"""
import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..",
                                "analysis"))
import profiles  # noqa: E402

from oc_nbody_tpu.models.plummer import plummer  # noqa: E402


@pytest.fixture(scope="module")
def cluster():
    state = plummer(30000, jax.random.PRNGKey(11))
    return (np.asarray(state.pos, np.float64),
            np.asarray(state.vel, np.float64),
            np.asarray(state.mass, np.float64))


def test_density_profile_matches_plummer(cluster):
    pos, vel, mass = cluster
    a = 3.0 * np.pi / 16.0
    p = profiles.radial_profiles(pos, vel, mass, bins=24)
    ok = (p["count"] > 500) & (p["r_mid"] < 3.0 * a)
    rho_analytic = (3.0 / (4.0 * np.pi * a ** 3)
                    * (1.0 + (p["r_mid"] / a) ** 2) ** -2.5)
    rel = np.abs(p["rho"][ok] / rho_analytic[ok] - 1.0)
    assert np.median(rel) < 0.1, rel

    # Plummer half-mass radius = a / sqrt(2^(2/3) - 1) ~= 1.3048 a
    assert p["r_half"] == pytest.approx(1.3048 * a, rel=0.05)


def test_dispersion_isotropic_and_matches(cluster):
    pos, vel, mass = cluster
    a = 3.0 * np.pi / 16.0
    p = profiles.radial_profiles(pos, vel, mass, bins=24)
    ok = (p["count"] > 800) & (p["r_mid"] < 2.0 * a)
    sig_analytic = np.sqrt(1.0 / (6.0 * np.sqrt(p["r_mid"] ** 2 + a ** 2)))
    rel = np.abs(p["sigma_r"][ok] / sig_analytic[ok] - 1.0)
    assert np.median(rel) < 0.1, rel
    # isotropy: |beta| small where statistics are good
    assert np.all(np.abs(p["beta"][ok]) < 0.15), p["beta"][ok]


def test_mass_function_none_for_equal_masses(cluster):
    pos, vel, mass = cluster
    r = np.linalg.norm(pos, axis=1)
    assert profiles.mass_function(mass, r < 1.0) is None


def test_core_radius_casertano_hut(cluster):
    """CH85 density-weighted core radius on Plummer: literature puts the
    rho-weighted <|x - x_d|> at ~0.7a and the rho-weighted mean density
    at ~0.5 rho_0 (both broad-tolerance: kNN density at finite N)."""
    pos, vel, mass = cluster
    a = 3.0 * np.pi / 16.0
    r_c, rho_c, c_d = profiles.core_radius(pos, mass)
    assert 0.4 * a < r_c < 1.1 * a, r_c
    rho0 = 3.0 / (4.0 * np.pi * a**3)
    assert 0.25 * rho0 < rho_c < 1.0 * rho0, rho_c
    assert np.linalg.norm(c_d) < 0.2 * a


def test_projected_profiles_plummer(cluster):
    """Projected Plummer closed forms: Sigma(R) = M a^2/pi (R^2+a^2)^-2,
    R_eff = a (projected half-mass radius = scale radius exactly), and
    sigma_LOS(0) = sqrt(3 pi M / 64 a) (central LOS dispersion)."""
    pos, vel, mass = cluster
    a = 3.0 * np.pi / 16.0
    pp = profiles.projected_profiles(pos, vel, mass, bins=24)
    # R_eff == a for Plummer (in projection the half-mass radius IS a)
    assert 0.9 * a < pp["r_eff"] < 1.1 * a, pp["r_eff"]
    # surface density against the closed form, inner/mid bins
    ok = pp["count"] > 300
    R = pp["R_mid"][ok]
    sig_th = a**2 / np.pi / (R**2 + a**2) ** 2  # M = 1
    ratio = pp["Sigma"][ok] / sig_th
    assert np.all((ratio > 0.8) & (ratio < 1.2)), ratio
    # central LOS dispersion
    s0_th = np.sqrt(3.0 * np.pi / (64.0 * a))
    inner = pp["sigma_los"][ok][:3]
    assert np.all((inner > 0.85 * s0_th) & (inner < 1.1 * s0_th)), (
        inner, s0_th)
