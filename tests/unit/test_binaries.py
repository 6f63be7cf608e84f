"""Primordial binary population: sampling, elements, conservation.

Covers models/binaries.py (capability extension over SURVEY.md §2.5-2.7)
and the ic.binary_* config surface.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oc_nbody_tpu.models.binaries import (
    BinaryPopulation, add_binaries, kepler_orbit_phase, orbital_elements,
    solve_kepler)
from oc_nbody_tpu.models.plummer import plummer


def test_kepler_solver_exact():
    m = jnp.linspace(0.0, 2.0 * jnp.pi, 97)[None, :]
    e = jnp.linspace(0.0, 0.95, 20)[:, None]
    ea = solve_kepler(m, jnp.broadcast_to(e, (20, 97)))
    resid = ea - e * jnp.sin(ea) - m
    assert float(jnp.max(jnp.abs(resid))) < 1e-12


def test_orbit_phase_elements_roundtrip():
    key = jax.random.PRNGKey(3)
    ka, ke, km, kg = jax.random.split(key, 4)
    a = jnp.exp(jax.random.uniform(ka, (256,), jnp.float64,
                                   jnp.log(1e-3), jnp.log(10.0)))
    e = jax.random.uniform(ke, (256,), jnp.float64, 0.0, 0.95)
    m_anom = jax.random.uniform(km, (256,), jnp.float64, 0.0, 2 * jnp.pi)
    gm = jnp.exp(jax.random.uniform(kg, (256,), jnp.float64,
                                    jnp.log(0.1), jnp.log(10.0)))
    r_rel, v_rel = kepler_orbit_phase(a, e, m_anom, gm)
    a2, e2 = orbital_elements(r_rel, v_rel, gm)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(a), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(e2), np.asarray(e), atol=1e-10)


def test_vis_viva_energy():
    # two-body energy at any phase equals -gm/(2a)
    gm = 2.5
    a = 0.01
    for m_anom in (0.0, 1.0, 3.0, 5.5):
        r, v = kepler_orbit_phase(a, 0.7, m_anom, gm)
        eps_orb = 0.5 * float(jnp.sum(v * v)) - gm / float(
            jnp.linalg.norm(r))
        assert eps_orb == pytest.approx(-gm / (2 * a), rel=1e-12)


def test_add_binaries_preserves_bulk():
    state = plummer(512, jax.random.PRNGKey(1))
    pop = add_binaries(state, jax.random.PRNGKey(2), fraction=0.25,
                       a_min=1e-4, a_max=1e-2)
    new = pop.state
    assert new.n == 512 + 128
    assert pop.a.shape == (128,)
    # total mass exactly preserved (f32 components sum within rounding)
    np.testing.assert_allclose(float(new.total_mass),
                               float(state.total_mass), rtol=1e-6)
    # momentum and CoM preserved (pair CoMs sit exactly on the parents in
    # the stored masses; the only drift left is the <= 1 f32-ulp gap
    # between m1+m2 and the parent mass, ~1e-10 absolute here)
    np.testing.assert_allclose(np.asarray(new.com()),
                               np.asarray(state.com()), atol=3e-9)
    p_old = np.asarray((state.vel * state.mass[:, None].astype(
        jnp.float64)).sum(0))
    p_new = np.asarray((new.vel * new.mass[:, None].astype(
        jnp.float64)).sum(0))
    np.testing.assert_allclose(p_new, p_old, atol=3e-9)
    # ids unique, originals kept
    ids = np.asarray(new.ids)
    assert len(np.unique(ids)) == new.n
    assert set(np.asarray(state.ids)) <= set(ids)


def test_pair_coms_and_elements_match_bookkeeping():
    state = plummer(256, jax.random.PRNGKey(4))
    pop = add_binaries(state, jax.random.PRNGKey(5), fraction=0.5,
                       a_min=1e-4, a_max=1e-2, q_min=0.3)
    s = pop.state
    i, j = np.asarray(pop.primary_idx), np.asarray(pop.secondary_idx)
    m1 = np.asarray(s.mass, np.float64)[i]
    m2 = np.asarray(s.mass, np.float64)[j]
    pos = np.asarray(s.pos)
    vel = np.asarray(s.vel)
    com = (pos[i] * m1[:, None] + pos[j] * m2[:, None]) / (m1 + m2)[:, None]
    np.testing.assert_allclose(com, np.asarray(state.pos)[i], atol=1e-9)
    # recovered elements match the sampled ones (f32 mass rounding only)
    a, e = orbital_elements(pos[i] - pos[j], vel[i] - vel[j],
                            1.0 * (m1 + m2))
    np.testing.assert_allclose(np.asarray(a), np.asarray(pop.a), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(e), np.asarray(pop.e), atol=1e-5)
    # q bounds respected (q = lighter/heavier in [q_min, 1])
    q = m2 / m1
    q = np.minimum(q, 1.0 / q)
    assert q.min() >= 0.3 - 1e-6


def test_distributions():
    state = plummer(4096, jax.random.PRNGKey(6))
    pop = add_binaries(state, jax.random.PRNGKey(7), fraction=1.0,
                       a_min=1e-4, a_max=1e-1, e_max=0.9)
    a = np.asarray(pop.a)
    e = np.asarray(pop.e)
    # log-uniform a: mean of log a ~ midpoint, spread ~ range/sqrt(12)
    la = np.log(a)
    assert abs(la.mean() - np.log(1e-4 * 1e-1) / 2) < 0.1
    # thermal e truncated at 0.9: E[e] = (2/3) e_max
    assert abs(e.mean() - 2.0 / 3.0 * 0.9) < 0.02
    assert e.max() <= 0.9 + 1e-12


def test_zero_fraction_noop():
    state = plummer(64, jax.random.PRNGKey(8))
    pop = add_binaries(state, jax.random.PRNGKey(9), fraction=0.0,
                       a_min=1e-3, a_max=1e-2)
    assert pop.state is state
    assert pop.a.shape == (0,)


def test_validation_errors():
    state = plummer(64, jax.random.PRNGKey(8))
    with pytest.raises(ValueError, match="fraction"):
        add_binaries(state, jax.random.PRNGKey(0), fraction=1.5,
                     a_min=1e-3, a_max=1e-2)
    with pytest.raises(ValueError, match="a_min"):
        add_binaries(state, jax.random.PRNGKey(0), fraction=0.5,
                     a_min=0.0, a_max=1e-2)
    with pytest.raises(ValueError, match="q_min"):
        add_binaries(state, jax.random.PRNGKey(0), fraction=0.5,
                     a_min=1e-3, a_max=1e-2, q_min=0.0)


def test_config_surface_build_ic():
    from oc_nbody_tpu.config import SimConfig
    from oc_nbody_tpu.scene import build_ic, build_units

    cfg = SimConfig.from_dict({
        "ic": {"kind": "plummer", "n": 128, "binary_fraction": 0.25,
               "binary_a_min": 1e-3, "binary_a_max": 1e-2},
        "integrator": {"eps": 1e-4},
    })
    us = build_units(cfg)
    state = build_ic(cfg, us)
    assert state.n == 128 + 32

    # a_min below 2 eps is refused with a clear message
    bad = SimConfig.from_dict({
        "ic": {"kind": "plummer", "n": 128, "binary_fraction": 0.25,
               "binary_a_min": 1e-3, "binary_a_max": 1e-2},
        "integrator": {"eps": 1e-2},
    })
    with pytest.raises(ValueError, match="softened away"):
        build_ic(bad, us)
    # missing bounds refused
    nob = SimConfig.from_dict({
        "ic": {"kind": "plummer", "n": 128, "binary_fraction": 0.25}})
    with pytest.raises(ValueError, match="binary_a_min"):
        build_ic(nob, build_units(nob))


def test_census_recovers_injected_binaries():
    # hard binaries injected into a sparse cluster are found by the
    # mutual-NN census with their sampled elements
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "analysis"))
    from binaries import census

    state = plummer(256, jax.random.PRNGKey(11))
    # galactocentric offset: the NN sweep must centre before its f32 cast
    # or binary-scale separations vanish in cancellation (regression)
    state = state.shifted(dpos=jnp.asarray([2666.0, 0.0, 0.0]))
    pop = add_binaries(state, jax.random.PRNGKey(12), fraction=0.2,
                       a_min=1e-5, a_max=1e-4)  # far below ~0.5 spacing
    s = pop.state
    c = census(np.asarray(s.pos), np.asarray(s.vel),
               np.asarray(s.mass, np.float64), G=1.0, chunk=64)
    found = {tuple(sorted(p)) for p in zip(c["i"], c["j"])}
    injected = {tuple(sorted(p)) for p in zip(
        np.asarray(pop.primary_idx), np.asarray(pop.secondary_idx))}
    assert injected <= found
    # all injected pairs are hard at these separations
    inj_mask = np.array([tuple(sorted(p)) in injected
                         for p in zip(c["i"], c["j"])])
    assert bool(c["hard"][inj_mask].all())
