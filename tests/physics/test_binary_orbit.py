"""A sampled primordial binary is a correct Kepler orbit dynamically.

Integrates one add_binaries pair with the Hermite-4 stepper (eps=0,
unsoftened two-body) for a full period and checks the orbital elements
and the phase-space return point — i.e. the IC sampler and the dynamics
agree on what orbit was sampled.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from oc_nbody_tpu.forces import make_force_model
from oc_nbody_tpu.integrators.hermite import Hermite4
from oc_nbody_tpu.models.binaries import add_binaries, orbital_elements
from oc_nbody_tpu.state import make_state


def test_binary_completes_kepler_orbit():
    # one parent star at rest at the origin -> one binary
    parent = make_state(pos=jnp.zeros((1, 3)), vel=jnp.zeros((1, 3)),
                        mass=jnp.ones((1,)))
    pop = add_binaries(parent, jax.random.PRNGKey(42), fraction=1.0,
                       a_min=0.5, a_max=0.5, e_max=0.6)
    s = pop.state
    assert s.n == 2
    a0, e0 = float(pop.a[0]), float(pop.e[0])
    gm = float(s.mass[0] + s.mass[1])
    period = 2.0 * np.pi * np.sqrt(a0 ** 3 / gm)

    force = make_force_model(eps=0.0, G=1.0, backend="jnp")
    stepper = Hermite4(force=force, eta=0.01, dt_max=period / 64)
    carry = stepper.init(s)

    t = 0.0
    while t < period:
        carry = jax.jit(stepper.step)(carry)
        t = float(carry.state.time)

    st = carry.state
    a1, e1 = orbital_elements(st.pos[0] - st.pos[1], st.vel[0] - st.vel[1],
                              gm)
    # tolerance is the Hermite truncation at eta=0.01, dt=P/64 (measured
    # ~1.6e-6 relative on a); the test pins dynamical consistency, not
    # integrator order (tests/physics/test_kepler.py does that)
    np.testing.assert_allclose(float(a1), a0, rtol=2e-5)
    np.testing.assert_allclose(float(e1), e0, atol=2e-5)
    # pair CoM stays put (no external field, momentum zero) up to the
    # integrated f32 force-rounding asymmetry (the pairwise kernel rounds
    # each row independently; measured ~1.3e-8 over this orbit)
    m = np.asarray(st.mass, np.float64)
    com = (np.asarray(st.pos) * m[:, None]).sum(0) / m.sum()
    np.testing.assert_allclose(com, 0.0, atol=1e-6)
