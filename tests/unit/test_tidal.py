"""Tidal machinery against the closed-form Jacobi radius.

For a point-mass galaxy, Ω² − ∂²Φ/∂R² = 3GM/R³, so the King tidal radius
reduces to the classical Jacobi radius r_J = R (m / 3M)^{1/3}."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oc_nbody_tpu import diagnostics
from oc_nbody_tpu.forces import make_force_model
from oc_nbody_tpu.models import potentials as P
from oc_nbody_tpu.models.plummer import plummer


def test_point_mass_tidal_coefficient():
    GM = 7.3
    pot = P.PointMass(GM=jnp.asarray(GM))
    R = 4.2
    lam = float(pot.tidal_coefficient(R))
    assert lam == pytest.approx(3.0 * GM / R**3, rel=1e-8)


def test_jacobi_radius():
    m_cl, M_gal, R = 1.0, 1.0e5, 50.0
    pot = P.PointMass(GM=jnp.asarray(M_gal))  # G = 1
    lam = float(pot.tidal_coefficient(R))
    r_t = float(diagnostics.tidal_radius(m_cl, lam, 1.0))
    r_jacobi = R * (m_cl / (3.0 * M_gal)) ** (1.0 / 3.0)
    assert r_t == pytest.approx(r_jacobi, rel=1e-10)


def test_bound_mass_tidal_point_mass_galaxy():
    """A compact cluster deep inside its Jacobi radius is fully bound; the
    fixpoint reports r_t ≈ r_Jacobi."""
    state = plummer(512, jax.random.PRNGKey(71))
    M_gal, R = 1.0e6, 200.0
    pot = P.PointMass(GM=jnp.asarray(M_gal))
    state = state.shifted(dpos=jnp.array([R, 0.0, 0.0]),
                          dvel=jnp.array([0.0, float(pot.vcirc(R)), 0.0]))
    force = make_force_model(eps=1.0 / 64, G=1.0, external=pot, backend="jnp")
    m_b, n_b, r_t, mask = diagnostics.bound_mass_tidal(state, force)
    # the sampled Plummer tail extends past r_J, so some mass is stripped;
    # the fixpoint must satisfy the Jacobi identity for the BOUND mass
    # (discrete particle masses: the fixpoint lands within one mass
    # quantum of the identity, not exactly on it)
    r_expected = R * (float(m_b) / (3.0 * M_gal)) ** (1.0 / 3.0)
    assert float(r_t) == pytest.approx(r_expected, rel=1e-2)
    assert 0.5 < float(m_b) < 0.95
    assert int(n_b) == int(np.asarray(mask).sum())


def test_tidal_tensor_point_mass():
    """Closed form: T = GM (3 r̂r̂ − I)/r³ → eigenvalues (2, −1, −1)·GM/r³."""
    GM, R = 7.3, 4.2
    pot = P.PointMass(GM=jnp.asarray(GM))
    T = np.asarray(pot.tidal_tensor(jnp.array([R, 0.0, 0.0])))
    expect = GM / R**3 * np.diag([2.0, -1.0, -1.0])
    np.testing.assert_allclose(T, expect, rtol=1e-10, atol=1e-12)


def test_tensor_coefficient_reduces_to_midplane_on_circular_orbit():
    """On a circular z=0 orbit λ_max(T) + Ω² must equal the classic
    Ω² − ∂²Φ/∂R² — for the point mass AND the full MW composite."""
    for pot, R in ((P.PointMass(GM=jnp.asarray(1.0e6)), 200.0),
                   (P.milky_way(G=4.498e-3), 8000.0)):
        omega2 = float(pot.omega2(R))
        lam_mid = float(pot.tidal_coefficient(R))
        lam_3d = float(pot.tidal_coefficient_at(
            jnp.array([R, 0.0, 0.0]), omega2))
        assert lam_3d == pytest.approx(lam_mid, rel=1e-8)


def test_tensor_coefficient_inclination_invariant_for_spherical_host():
    """For a spherical host the tidal coefficient cannot depend on orbit
    inclination; the midplane formula breaks off-plane (VERDICT W3), the
    tensor one must not."""
    import math
    GM, R = 1.0e6, 200.0
    pot = P.PointMass(GM=jnp.asarray(GM))
    omega2 = GM / R**3
    lam0 = float(pot.tidal_coefficient_at(jnp.array([R, 0.0, 0.0]), omega2))
    for inc_deg in (30.0, 60.0, 90.0):
        a = math.radians(inc_deg)
        posn = jnp.array([R * math.cos(a), 0.0, R * math.sin(a)])
        lam = float(pot.tidal_coefficient_at(posn, omega2))
        assert lam == pytest.approx(lam0, rel=1e-10)
        assert lam == pytest.approx(3.0 * GM / R**3, rel=1e-8)


def test_bound_mass_tidal_tensor_matches_midplane_in_plane():
    """With the cluster on an in-plane circular orbit, methods agree."""
    state = plummer(512, jax.random.PRNGKey(71))
    M_gal, R = 1.0e6, 200.0
    pot = P.PointMass(GM=jnp.asarray(M_gal))
    state = state.shifted(dpos=jnp.array([R, 0.0, 0.0]),
                          dvel=jnp.array([0.0, float(pot.vcirc(R)), 0.0]))
    force = make_force_model(eps=1.0 / 64, G=1.0, external=pot, backend="jnp")
    m_t, _, rt_t, _ = diagnostics.bound_mass_tidal(state, force, method="tensor")
    m_m, _, rt_m, _ = diagnostics.bound_mass_tidal(state, force,
                                                   method="midplane")
    assert float(m_t) == pytest.approx(float(m_m), rel=2e-2)
    assert float(rt_t) == pytest.approx(float(rt_m), rel=2e-2)


def test_bound_mass_tidal_tensor_inclined_orbit():
    """Same cluster on a 60°-inclined circular orbit around the spherical
    host: the tensor method must reproduce the in-plane answer (the
    midplane method sees the wrong R_gal here)."""
    import math
    state0 = plummer(512, jax.random.PRNGKey(71))
    M_gal, R = 1.0e6, 200.0
    pot = P.PointMass(GM=jnp.asarray(M_gal))
    vc = float(pot.vcirc(R))
    force = make_force_model(eps=1.0 / 64, G=1.0, external=pot, backend="jnp")

    in_plane = state0.shifted(dpos=jnp.array([R, 0.0, 0.0]),
                              dvel=jnp.array([0.0, vc, 0.0]))
    a = math.radians(60.0)
    inclined = state0.shifted(
        dpos=jnp.array([R * math.cos(a), 0.0, R * math.sin(a)]),
        dvel=jnp.array([0.0, vc, 0.0]))

    m_ref, _, rt_ref, _ = diagnostics.bound_mass_tidal(in_plane, force,
                                                       method="tensor")
    m_inc, _, rt_inc, _ = diagnostics.bound_mass_tidal(inclined, force,
                                                       method="tensor")
    assert float(rt_inc) == pytest.approx(float(rt_ref), rel=2e-2)
    assert float(m_inc) == pytest.approx(float(m_ref), rel=2e-2)


def test_new_potentials_grad_consistency():
    for pot in (P.PlummerSphere(GM=jnp.asarray(2.0), b=jnp.asarray(0.5)),
                P.LogarithmicHalo(v0=jnp.asarray(1.3), rc=jnp.asarray(0.7),
                                  q=jnp.asarray(0.9))):
        xyz = jax.random.uniform(jax.random.PRNGKey(1), (8, 3),
                                 jnp.float64, -2.0, 2.0)
        a_auto = -jax.vmap(jax.grad(pot.phi))(xyz)
        np.testing.assert_allclose(np.asarray(pot.accel(xyz)),
                                   np.asarray(a_auto), rtol=1e-10, atol=1e-12)


def test_log_halo_flat_rotation_curve():
    pot = P.LogarithmicHalo(v0=jnp.asarray(2.2), rc=jnp.asarray(0.1))
    for R in (5.0, 20.0, 100.0):
        assert float(pot.vcirc(R)) == pytest.approx(2.2, rel=1e-3)
