"""Cluster-level physics: config-1 acceptance (energy drift), conservation
laws, IC statistics (SURVEY.md §4.1-4.2)."""
import jax
import jax.numpy as jnp
import numpy as np

from oc_nbody_tpu import diagnostics
from oc_nbody_tpu.forces import make_force_model
from oc_nbody_tpu.integrators.leapfrog import LeapfrogKDK
from oc_nbody_tpu.models.plummer import plummer, HALF_MASS_RADIUS_OVER_A


T_CROSS_HENON = 2.0 * np.sqrt(2.0)  # crossing time in Hénon units (E=-1/4)


def test_plummer_statistics():
    key = jax.random.PRNGKey(7)
    n = 8192
    state = plummer(n, key)
    # centre of mass removed exactly
    np.testing.assert_allclose(np.asarray(state.com()), 0.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(state.com_vel()), 0.0, atol=1e-12)
    # half-mass radius = 1.30477 a, a = 3 pi/16 (finite-N + cutoff: ~2% tol)
    r = jnp.sort(jnp.linalg.norm(state.pos, axis=1))
    r_h = float(r[n // 2])
    a = 3.0 * np.pi / 16.0
    assert abs(r_h - float(HALF_MASS_RADIUS_OVER_A) * a) < 0.03 * r_h
    # virial ratio -KE/PE ~ 0.5 within a few percent
    force = make_force_model(eps=0.0, backend="jnp")
    e = diagnostics.energies(state, force)
    q = float(-e["KE"] / e["PE_pair"])
    assert 0.45 < q < 0.55, q
    # total energy ~ -1/4 in Hénon units
    assert abs(float(e["E_tot"]) + 0.25) < 0.02


def test_config1_energy_drift():
    """Config 1 (BASELINE.json:7), scaled down for CI: Plummer + KDK fixed
    dt, isolated; |dE/E| bounded over 2 crossing times."""
    state = plummer(256, jax.random.PRNGKey(3))
    force = make_force_model(eps=1.0 / 64, backend="jnp")
    stepper = LeapfrogKDK(force=force, dt=1.0 / 2048)
    carry = stepper.init(state)
    e0 = float(diagnostics.energies(state, force)["E_tot"])
    worst = 0.0
    for _ in range(4):  # 4 half-crossings
        carry = stepper.advance(carry, int(T_CROSS_HENON / 2 * 2048))
        e = float(diagnostics.energies(carry.state, force)["E_tot"])
        worst = max(worst, abs(e - e0) / abs(e0))
    assert worst < 2e-6, worst


def test_isolated_conservation():
    """Isolated cluster: momentum and angular momentum conserved."""
    state = plummer(128, jax.random.PRNGKey(11))
    force = make_force_model(eps=1.0 / 64, backend="jnp")
    stepper = LeapfrogKDK(force=force, dt=1.0 / 1024)
    carry = stepper.init(state)
    L0 = np.asarray(diagnostics.angular_momentum(state))
    carry = stepper.advance(carry, 2048)
    L1 = np.asarray(diagnostics.angular_momentum(carry.state))
    p1 = np.asarray(carry.state.com_vel())
    np.testing.assert_allclose(L1, L0, atol=1e-6)
    np.testing.assert_allclose(p1, 0.0, atol=1e-9)


def test_lagrangian_radii_ordering():
    state = plummer(1024, jax.random.PRNGKey(5))
    rl = np.asarray(diagnostics.lagrangian_radii(state))
    assert np.all(np.diff(rl) > 0)
    # r_50 approximates the half-mass radius
    a = 3.0 * np.pi / 16.0
    assert abs(rl[2] - float(HALF_MASS_RADIUS_OVER_A) * a) < 0.1


def test_density_center_recovers_offset():
    state = plummer(2048, jax.random.PRNGKey(9))
    shifted = state.shifted(dpos=jnp.array([5.0, -3.0, 2.0]))
    c = np.asarray(diagnostics.density_center(shifted))
    np.testing.assert_allclose(c, [5.0, -3.0, 2.0], atol=0.15)


def test_bound_mass_energy_isolated():
    state = plummer(512, jax.random.PRNGKey(13))
    force = make_force_model(eps=0.0, backend="jnp")
    m_b, n_b, mask = diagnostics.bound_mass_energy(state, force)
    # a virialised Plummer sphere is almost entirely bound
    assert float(m_b) > 0.95
    assert int(n_b) > 0.95 * 512
