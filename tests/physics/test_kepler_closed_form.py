"""Eccentric two-body orbit against the closed-form Kepler solution
(position via Kepler's equation, not just conserved quantities)."""
import jax.numpy as jnp
import numpy as np

from oc_nbody_tpu.forces import make_force_model
from oc_nbody_tpu.integrators.hermite import Hermite4
from oc_nbody_tpu.state import make_state


def _kepler_position(t, a, e, mu):
    """Relative-orbit position at time t from apocentre (2D, closed form)."""
    n = np.sqrt(mu / a**3)
    M = n * t + np.pi  # mean anomaly; starts at apocentre (E = pi)
    E = M
    for _ in range(60):
        E = E - (E - e * np.sin(E) - M) / (1 - e * np.cos(E))
    x = a * (np.cos(E) - e)
    y = a * np.sqrt(1 - e**2) * np.sin(E)
    return np.array([x, y, 0.0])


def test_hermite_tracks_closed_form():
    e, a, mu = 0.5, 1.0, 1.0  # G(m1+m2) = 1
    r_apo = a * (1 + e)
    v_apo = np.sqrt(mu * (1 - e) / (a * (1 + e)))
    pos = jnp.array([[-r_apo / 2, 0.0, 0.0], [r_apo / 2, 0.0, 0.0]])
    vel = jnp.array([[0.0, -v_apo / 2, 0.0], [0.0, v_apo / 2, 0.0]])
    state = make_state(pos, vel, jnp.array([0.5, 0.5]))

    force = make_force_model(eps=0.0, backend="jnp")
    stepper = Hermite4(force=force, eta=0.002)
    carry = stepper.init(state)

    period = 2 * np.pi * a**1.5 / np.sqrt(mu)
    for frac in (0.25, 0.5, 0.75, 1.0):
        carry = stepper.advance_to(carry, frac * period)
        rel = np.asarray(carry.state.pos[1] - carry.state.pos[0])
        # the IC frame is the closed-form frame rotated by 180 degrees
        ref = -_kepler_position(frac * period, a, e, mu)
        np.testing.assert_allclose(rel, ref, atol=2e-5, err_msg=str(frac))
