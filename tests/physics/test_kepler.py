"""Two-body Kepler problems against closed-form solutions (SURVEY.md §4.2)."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from oc_nbody_tpu.forces import make_force_model
from oc_nbody_tpu.integrators.hermite import Hermite4
from oc_nbody_tpu.integrators.leapfrog import LeapfrogKDK
from oc_nbody_tpu.state import make_state


def _circular_binary():
    """Equal-mass binary, separation 1, G=1, M=1 -> period 2*pi."""
    pos = jnp.array([[-0.5, 0.0, 0.0], [0.5, 0.0, 0.0]])
    vel = jnp.array([[0.0, -0.5, 0.0], [0.0, 0.5, 0.0]])
    mass = jnp.array([0.5, 0.5])
    return make_state(pos, vel, mass)


def test_kdk_circular_orbit():
    state = _circular_binary()
    force = make_force_model(eps=0.0, backend="jnp")
    dt = 2 * jnp.pi / 2048
    stepper = LeapfrogKDK(force=force, dt=float(dt))
    carry = stepper.init(state)
    carry = stepper.advance(carry, 2048)  # one period
    np.testing.assert_allclose(carry.state.pos, state.pos, atol=2e-4)
    np.testing.assert_allclose(carry.state.vel, state.vel, atol=2e-4)


def test_hermite_circular_orbit():
    state = _circular_binary()
    force = make_force_model(eps=0.0, backend="jnp")
    stepper = Hermite4(force=force, eta=0.005)
    carry = stepper.init(state)
    carry = stepper.advance_to(carry, 2 * jnp.pi)
    np.testing.assert_allclose(float(carry.state.time), float(2 * jnp.pi), rtol=1e-12)
    np.testing.assert_allclose(carry.state.pos, state.pos, atol=2e-4)


def _eccentric_binary():
    """e ~ 0.6 binary: start at apocentre of a = 1 orbit."""
    e = 0.6
    r_apo = 1.0 + e
    v_apo = jnp.sqrt((1.0 - e) / (1.0 + e))  # G M = 1, a = 1
    pos = jnp.array([[-r_apo / 2, 0.0, 0.0], [r_apo / 2, 0.0, 0.0]])
    vel = jnp.array([[0.0, -v_apo / 2, 0.0], [0.0, v_apo / 2, 0.0]])
    mass = jnp.array([0.5, 0.5])
    return make_state(pos, vel, mass)


def _energy(state, force):
    from oc_nbody_tpu.diagnostics import energies
    return float(energies(state, force)["E_tot"])


def _kdk_energy_error(n_steps: int):
    """Max |dE/E| sampled through one period (KDK is symplectic: the error
    oscillates and nearly cancels at the full period, so sample inside)."""
    state = _eccentric_binary()
    force = make_force_model(eps=0.0, backend="jnp")
    period = 2 * np.pi
    stepper = LeapfrogKDK(force=force, dt=period / n_steps)
    carry = stepper.init(state)
    e0 = _energy(state, force)
    worst = 0.0
    for _ in range(16):
        carry = stepper.advance(carry, n_steps // 16)
        worst = max(worst, abs(_energy(carry.state, force) - e0) / abs(e0))
    return worst


def test_kdk_second_order_convergence():
    """Peak energy error over one period scales ~ dt^2."""
    err1 = _kdk_energy_error(512)
    err2 = _kdk_energy_error(1024)
    assert err1 > 1e-8  # truncation, not f32 noise floor
    ratio = err1 / max(err2, 1e-16)
    assert 2.5 < ratio < 6.5, (err1, err2, ratio)


def _hermite_energy_error(n_steps: int, pec2: bool = False):
    """Max |dE/E| through one period at fixed dt (eta huge -> dt = dt_max)."""
    state = _eccentric_binary()
    force = make_force_model(eps=0.0, backend="jnp")
    h = 2 * np.pi / n_steps
    stepper = Hermite4(force=force, eta=1e12, dt_max=h, pec2=pec2)
    carry = stepper.init(state)
    carry = dataclasses.replace(carry, dt=jnp.asarray(h, jnp.float64))
    e0 = _energy(state, force)
    worst = 0.0
    for _ in range(16):
        carry = stepper.advance(carry, n_steps // 16)
        worst = max(worst, abs(_energy(carry.state, force) - e0) / abs(e0))
    return worst


def test_hermite_fourth_order_convergence():
    """Peak energy error over one period scales ~ dt^4."""
    err1 = _hermite_energy_error(256)
    err2 = _hermite_energy_error(512)
    assert err1 > 1e-8  # truncation, not f32 noise floor
    ratio = err1 / max(err2, 1e-18)
    assert 8 < ratio < 34, (err1, err2, ratio)


def test_hermite_pec2_smaller_error_constant():
    """PEC² iterates the corrector once more: same 4th order, measurably
    smaller error constant at the same fixed dt (VERDICT round-1 item 7)."""
    err_pec = _hermite_energy_error(256, pec2=False)
    err_pec2 = _hermite_energy_error(256, pec2=True)
    assert err_pec2 > 1e-12  # still truncation-dominated
    assert err_pec2 < 0.5 * err_pec, (err_pec, err_pec2)
    # and PEC² remains ~4th order
    ratio = err_pec2 / max(_hermite_energy_error(512, pec2=True), 1e-18)
    assert 8 < ratio < 40, ratio


def test_hermite_adaptive_eccentric_energy():
    """Adaptive shared dt holds energy over a full eccentric period."""
    state = _eccentric_binary()
    force = make_force_model(eps=0.0, backend="jnp")
    stepper = Hermite4(force=force, eta=0.002)
    carry = stepper.init(state)
    e0 = _energy(state, force)
    carry = stepper.advance_to(carry, 2 * np.pi)
    assert abs(_energy(carry.state, force) - e0) / abs(e0) < 5e-7
    # adaptive: resolves the pericentre passage with many steps
    assert int(carry.n_steps) > 150
