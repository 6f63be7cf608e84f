"""Unit tests for models/stellar_evolution.py (lifetimes, IFMR, update)."""
import jax
import jax.numpy as jnp
import numpy as np

from oc_nbody_tpu.config import SEVConfig
from oc_nbody_tpu.models.stellar_evolution import (
    make_stellar_evolution, ms_lifetime_myr, remnant_mass_msun)
from oc_nbody_tpu.state import make_state
from oc_nbody_tpu.utils.units import UnitSystem


def test_lifetime_calibration_points():
    # the classic solar-metallicity MS-lifetime interpolation
    assert abs(ms_lifetime_myr(1.0) - 8502.0) / 8502.0 < 0.01
    assert abs(ms_lifetime_myr(10.0) - 22.4) / 22.4 < 0.02
    assert abs(ms_lifetime_myr(100.0) - 3.1) / 3.1 < 0.05
    # asymptotic floor for very massive stars: 1/0.346 ≈ 2.9 Myr
    assert 2.8 < ms_lifetime_myr(1000.0) < 3.0


def test_lifetime_monotone_decreasing():
    m = np.logspace(np.log10(0.08), np.log10(300.0), 400)
    t = np.asarray(ms_lifetime_myr(m))
    assert np.all(np.diff(t) < 0)
    assert np.all(np.isfinite(t)) and np.all(t > 0)


def test_lifetime_works_on_jax_arrays():
    t = ms_lifetime_myr(jnp.asarray([1.0, 10.0]))
    assert isinstance(t, jax.Array)
    np.testing.assert_allclose(np.asarray(t), ms_lifetime_myr(
        np.array([1.0, 10.0])), rtol=1e-12)


def test_ifmr_classes():
    m = np.array([0.8, 3.0, 7.9, 8.0, 19.9, 20.0, 100.0])
    r = np.asarray(remnant_mass_msun(m))
    # WDs: Kalirai linear relation, always below Chandrasekhar
    np.testing.assert_allclose(r[:3], 0.109 * m[:3] + 0.394, rtol=1e-12)
    assert np.all(r[:3] < 1.44)
    # NS plateau
    np.testing.assert_allclose(r[3:5], 1.4, rtol=1e-12)
    # BHs: 0.1 m + 1
    np.testing.assert_allclose(r[5:], [3.0, 11.0], rtol=1e-12)
    # remnants lighter than progenitors over the whole stellar range
    m_all = np.logspace(np.log10(0.5), np.log10(150.0), 200)
    assert np.all(np.asarray(remnant_mass_msun(m_all)) < m_all)


def _toy_setup(n=8, kick_ns=0.0, kick_bh=0.0, epoch0=0.0):
    # unit system: 1 code mass unit = 1 Msun, so masses are direct
    us = UnitSystem.henon(mass_msun=1.0, length_pc=1.0)
    key = jax.random.PRNGKey(3)
    pos = jax.random.normal(key, (n, 3), jnp.float64)
    vel = jnp.zeros((n, 3), jnp.float64)
    # masses 1..8 Msun-equivalents scaled: make a spread of death times
    mass = jnp.asarray(np.linspace(1.0, 40.0, n), jnp.float32)
    state = make_state(pos, vel, mass)
    cfg = SEVConfig(kind="simple", epoch0_myr=epoch0,
                    kick_sigma_ns_kms=kick_ns, kick_sigma_bh_kms=kick_bh)
    sev = make_stellar_evolution(cfg, us, state, jax.random.PRNGKey(7))
    return us, state, sev


def test_update_is_idempotent():
    us, state, sev = _toy_setup()
    # advance time past the death of the heaviest few stars
    t = us.to_code(float(ms_lifetime_myr(20.0)), "time")
    state_t = state.replace(time=jnp.asarray(t, jnp.float64))
    assert int(sev.count_pending(state_t)) > 0
    s1 = sev.update(state_t)
    assert int(sev.count_pending(s1)) == 0
    s2 = sev.update(s1)
    np.testing.assert_array_equal(np.asarray(s1.mass), np.asarray(s2.mass))
    np.testing.assert_array_equal(np.asarray(s1.vel), np.asarray(s2.vel))
    # dead stars hold their remnant mass; alive ones are untouched
    m_init = np.asarray(state.mass, np.float64)
    dead = float(s1.time) >= np.asarray(sev.tables.t_death)
    assert dead.sum() > 0 and (~dead).sum() > 0
    np.testing.assert_array_equal(np.asarray(s1.mass)[~dead], m_init[~dead])
    assert np.all(np.asarray(s1.mass)[dead] < m_init[dead])
    # bookkeeping helpers agree
    assert sev.n_dead(s1) == int(dead.sum())
    assert abs(sev.mass_lost(s1)
               - float((m_init - np.asarray(s1.mass, np.float64))[dead].sum())
               ) < 1e-6


def test_kicks_applied_exactly_once_to_newly_dead():
    us, state, sev = _toy_setup(kick_ns=50.0, kick_bh=10.0)
    t = us.to_code(float(ms_lifetime_myr(10.0)), "time")  # kills m >= 10
    state_t = state.replace(time=jnp.asarray(t, jnp.float64))
    s1 = sev.update(state_t)
    dead = np.asarray(state_t.time) >= np.asarray(sev.tables.t_death)
    dv = np.asarray(s1.vel) - np.asarray(state.vel)
    assert np.all(np.linalg.norm(dv[dead], axis=1) > 0)
    np.testing.assert_array_equal(dv[~dead], 0.0)
    # idempotence: a second update must NOT kick again
    s2 = sev.update(s1)
    np.testing.assert_array_equal(np.asarray(s2.vel), np.asarray(s1.vel))
    # kick magnitudes follow the per-class sigma (NS sigma > BH sigma here)
    m = np.asarray(state.mass, np.float64) * us.mass_msun
    ns = dead & (m >= 8.0) & (m < 20.0)
    bh = dead & (m >= 20.0)
    if ns.sum() and bh.sum():
        # 50 km/s sigma vs 10 km/s sigma: per-star draws vary, but the
        # class scale difference is 5x — compare medians loosely
        assert np.median(np.linalg.norm(dv[ns], axis=1)) > \
            np.median(np.linalg.norm(dv[bh], axis=1)) * 0.5


def test_zero_sigma_means_zero_kicks():
    us, state, sev = _toy_setup()
    assert np.all(np.asarray(sev.tables.kicks) == 0.0)


def test_epoch0_kills_at_start():
    us, state, sev = _toy_setup(epoch0=float(ms_lifetime_myr(15.0)))
    # at t=0, stars heavier than 15 Msun are already past t_death
    assert int(sev.count_pending(state)) == int(
        np.sum(np.asarray(state.mass, np.float64) > 15.0))


def test_remnant_never_heavier_than_progenitor_in_tables():
    # pathological unit system: code mass unit = 0.1 Msun so the fixed-NS
    # branch would exceed light progenitors without the clamp
    us = UnitSystem.henon(mass_msun=1.0, length_pc=1.0)
    state = make_state(jnp.zeros((3, 3)), jnp.zeros((3, 3)),
                       jnp.asarray([0.3, 1.0, 9.0], jnp.float32))
    cfg = SEVConfig(kind="simple")
    sev = make_stellar_evolution(cfg, us, state, jax.random.PRNGKey(0))
    assert np.all(np.asarray(sev.tables.m_rem)
                  <= np.asarray(state.mass) * (1 + 1e-6))


def _wind_setup(wind_fraction, wind_time_frac=0.5, kick_ns=0.0):
    us = UnitSystem.henon(mass_msun=1.0, length_pc=1.0)
    pos = jax.random.normal(jax.random.PRNGKey(3), (6, 3), jnp.float64)
    mass = jnp.asarray(np.linspace(5.0, 40.0, 6), jnp.float32)
    state = make_state(pos, jnp.zeros((6, 3), jnp.float64), mass)
    cfg = SEVConfig(kind="simple", wind_fraction=wind_fraction,
                    wind_time_frac=wind_time_frac, kick_sigma_ns_kms=kick_ns)
    sev = make_stellar_evolution(cfg, us, state, jax.random.PRNGKey(7))
    return us, state, sev


def test_wind_mass_monotone_and_lands_on_remnant():
    """wind_fraction=0.6: masses erode smoothly through the wind phase
    (strictly between m_init and m_pre), drop to m_rem at collapse, and
    the min() update is idempotent at every epoch."""
    us, state, sev = _wind_setup(0.6)
    m_init = np.asarray(state.mass, np.float64)
    t_death = np.asarray(sev.tables.t_death)
    t_wind = np.asarray(sev.tables.t_wind)
    assert np.all(t_wind < t_death)

    # sweep a star (index 5, heaviest, dies first) through its phases
    i = 5
    prev = m_init.copy()
    seen_partial = False
    for frac in (0.25, 0.5, 0.75, 1.0001):
        t = t_wind[i] + frac * (t_death[i] - t_wind[i])
        s = sev.update(state.replace(time=jnp.asarray(t, jnp.float64)))
        m = np.asarray(s.mass, np.float64)
        assert np.all(m <= prev + 1e-12), "mass must never increase"
        if frac < 1.0:
            pre = float(np.asarray(sev.tables.m_pre)[i])
            assert pre < m[i] < m_init[i], "mid-wind mass strictly between"
            seen_partial = True
        else:
            np.testing.assert_allclose(
                m[i], float(np.asarray(sev.tables.m_rem)[i]), rtol=1e-6)
        # idempotence at this epoch
        s2 = sev.update(s)
        np.testing.assert_array_equal(np.asarray(s.mass), np.asarray(s2.mass))
        prev = np.maximum.reduce([m])  # continue from the updated masses
        state = s


def test_wind_kick_still_fires_exactly_once():
    us, state, sev = _wind_setup(0.5, kick_ns=30.0)
    i = 2  # 19 Msun — the NS class (only kick_sigma_ns is configured)
    t_death = float(np.asarray(sev.tables.t_death)[i])
    # boundary mid-wind (no kick), then past death (kick), then again (none)
    s = sev.update(state.replace(
        time=jnp.asarray(0.5 * (float(np.asarray(sev.tables.t_wind)[i])
                                + t_death), jnp.float64)))
    np.testing.assert_array_equal(np.asarray(s.vel), np.asarray(state.vel))
    s2 = sev.update(s.replace(time=jnp.asarray(t_death * 1.001, jnp.float64)))
    dv = np.linalg.norm(np.asarray(s2.vel) - np.asarray(s.vel), axis=1)
    assert dv[i] > 0
    s3 = sev.update(s2)
    np.testing.assert_array_equal(np.asarray(s3.vel), np.asarray(s2.vel))


def test_wind_fraction_one_with_kicks_rejected():
    import pytest
    with pytest.raises(ValueError, match="wind_fraction"):
        _wind_setup(1.0, kick_ns=30.0)
    # without kicks, pure winds are fine and land on m_rem
    us, state, sev = _wind_setup(1.0)
    t = float(np.asarray(sev.tables.t_death)[5]) * 1.001
    s = sev.update(state.replace(time=jnp.asarray(t, jnp.float64)))
    np.testing.assert_allclose(float(np.asarray(s.mass)[5]),
                               float(np.asarray(sev.tables.m_rem)[5]),
                               rtol=1e-6)
