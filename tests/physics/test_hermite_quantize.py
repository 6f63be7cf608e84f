"""Hermite shared-dt power-of-two quantization (SURVEY.md §2.9b)."""
import math

import jax
import numpy as np

from oc_nbody_tpu.forces import make_force_model
from oc_nbody_tpu.integrators.hermite import Hermite4
from oc_nbody_tpu.models.plummer import plummer


def test_quantized_dt_is_power_of_two_fraction():
    state = plummer(64, jax.random.PRNGKey(51))
    force = make_force_model(eps=1.0 / 32, backend="jnp")
    dt_max = 1.0 / 8
    stepper = Hermite4(force=force, eta=0.02, dt_max=dt_max, quantize=True)
    carry = stepper.init(state)
    for _ in range(5):
        carry = jax.jit(stepper.step)(carry)
        dt = float(carry.dt)
        ratio = dt_max / dt
        assert abs(ratio - round(ratio)) < 1e-12
        assert abs(math.log2(round(ratio)) - round(math.log2(round(ratio)))) < 1e-12
        assert 0 < dt <= dt_max


def test_advance_to_lands_exactly():
    state = plummer(32, jax.random.PRNGKey(53))
    force = make_force_model(eps=1.0 / 32, backend="jnp")
    stepper = Hermite4(force=force, eta=0.02)
    carry = stepper.init(state)
    t_end = 0.3125
    carry = jax.jit(stepper.advance_to)(carry, t_end)
    np.testing.assert_allclose(float(carry.state.time), t_end, rtol=1e-14)
