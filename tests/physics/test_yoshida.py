"""Yoshida 4th-order symplectic integrator: closed-form Kepler oracle,
dt⁴ convergence, and equivalence/cost contracts vs KDK.
(integrators/leapfrog.py Yoshida4 — SURVEY.md §4.2 test pattern.)"""
import jax.numpy as jnp
import numpy as np

from oc_nbody_tpu.forces import make_force_model
from oc_nbody_tpu.integrators.leapfrog import LeapfrogKDK, Yoshida4
from oc_nbody_tpu.state import make_state


def _circular_binary():
    pos = jnp.array([[-0.5, 0.0, 0.0], [0.5, 0.0, 0.0]])
    vel = jnp.array([[0.0, -0.5, 0.0], [0.0, 0.5, 0.0]])
    mass = jnp.array([0.5, 0.5])
    return make_state(pos, vel, mass)


def _eccentric_binary():
    e = 0.6
    r_apo = 1.0 + e
    v_apo = jnp.sqrt((1.0 - e) / (1.0 + e))
    pos = jnp.array([[-r_apo / 2, 0.0, 0.0], [r_apo / 2, 0.0, 0.0]])
    vel = jnp.array([[0.0, -v_apo / 2, 0.0], [0.0, v_apo / 2, 0.0]])
    mass = jnp.array([0.5, 0.5])
    return make_state(pos, vel, mass)


def _energy(state, force):
    from oc_nbody_tpu.diagnostics import energies
    return float(energies(state, force)["E_tot"])


def test_yoshida_circular_orbit():
    state = _circular_binary()
    force = make_force_model(eps=0.0, backend="jnp")
    n = 512
    stepper = Yoshida4(force=force, dt=2 * np.pi / n)
    carry = stepper.advance(stepper.init(state), n)  # one period
    # 4x fewer steps than the KDK test, 25x tighter tolerance
    np.testing.assert_allclose(carry.state.pos, state.pos, atol=1e-8)
    np.testing.assert_allclose(carry.state.vel, state.vel, atol=1e-8)
    np.testing.assert_allclose(float(carry.state.time), 2 * np.pi,
                               rtol=1e-13)


def _yoshida_energy_error(n_steps: int):
    state = _eccentric_binary()
    # df32 forces: the dt⁴ truncation error dives under the f32 force
    # noise floor (~1e-7) already at ~1024 steps/period — the convergence
    # measurement needs the quieter tier (measured floor there ~1e-10)
    force = make_force_model(eps=0.0, backend="jnp", precision="df32")
    stepper = Yoshida4(force=force, dt=2 * np.pi / n_steps)
    carry = stepper.init(state)
    e0 = _energy(state, force)
    worst = 0.0
    for _ in range(16):
        carry = stepper.advance(carry, n_steps // 16)
        worst = max(worst, abs(_energy(carry.state, force) - e0) / abs(e0))
    return worst


def test_yoshida_fourth_order_convergence():
    """Peak energy error over one eccentric period scales ~ dt⁴
    (measured ratios 15.96 / 15.99 per halving at 512→1024→2048)."""
    err1 = _yoshida_energy_error(512)
    err2 = _yoshida_energy_error(1024)
    assert err1 > 1e-9  # truncation, not the df32 noise floor
    ratio = err1 / max(err2, 1e-18)
    assert 12.0 < ratio < 20.0, (err1, err2, ratio)  # ~16 for dt⁴


def test_yoshida_beats_kdk_at_equal_dt():
    """At the same dt, the composed step's energy error is orders below
    KDK's (the whole point of paying 3 force evals)."""
    state = _eccentric_binary()
    force = make_force_model(eps=0.0, backend="jnp")
    n = 1024
    e0 = _energy(state, force)

    def worst(stepper):
        carry = stepper.init(state)
        w = 0.0
        for _ in range(8):
            carry = stepper.advance(carry, n // 8)
            w = max(w, abs(_energy(carry.state, force) - e0) / abs(e0))
        return w

    w_kdk = worst(LeapfrogKDK(force=force, dt=2 * np.pi / n))
    w_y4 = worst(Yoshida4(force=force, dt=2 * np.pi / n))
    assert w_y4 < w_kdk / 100, (w_kdk, w_y4)


def test_yoshida_long_term_symplectic():
    """No secular energy drift over 50 periods (symplectic composition:
    the error oscillates instead of accumulating)."""
    state = _eccentric_binary()
    force = make_force_model(eps=0.0, backend="jnp")
    n = 256
    stepper = Yoshida4(force=force, dt=2 * np.pi / n)
    carry = stepper.init(state)
    e0 = _energy(state, force)
    errs = []
    for _ in range(50):
        carry = stepper.advance(carry, n)
        errs.append(abs(_energy(carry.state, force) - e0) / abs(e0))
    # late-time error no worse than a small multiple of early-time error
    assert max(errs[40:]) < 5 * max(errs[:10]) + 1e-14, (errs[:3], errs[-3:])
