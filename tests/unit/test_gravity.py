import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oc_nbody_tpu.ops import gravity


def _random_cluster(key, n, dtype=jnp.float64):
    kp, kv, km = jax.random.split(key, 3)
    pos = jax.random.normal(kp, (n, 3), dtype)
    vel = 0.3 * jax.random.normal(kv, (n, 3), dtype)
    mass = jax.random.uniform(km, (n,), dtype, 0.5, 1.5) / n
    return pos, vel, mass


def test_two_body_analytic():
    pos = jnp.array([[0.0, 0.0, 0.0], [2.0, 0.0, 0.0]])
    mass = jnp.array([3.0, 5.0])
    acc = gravity.accel_direct(pos, mass, eps=0.0, G=2.0)
    # a_0 = G m_1 / d^2 toward +x
    np.testing.assert_allclose(acc[0], [2.0 * 5.0 / 4.0, 0, 0], rtol=1e-12)
    np.testing.assert_allclose(acc[1], [-2.0 * 3.0 / 4.0, 0, 0], rtol=1e-12)


def test_softened_two_body():
    pos = jnp.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    mass = jnp.array([1.0, 1.0])
    eps = 0.5
    acc = gravity.accel_direct(pos, mass, eps=eps, G=1.0)
    expected = 1.0 / (1.0 + eps**2) ** 1.5
    np.testing.assert_allclose(acc[0, 0], expected, rtol=1e-12)


def test_newtons_third_law(key):
    pos, _, mass = _random_cluster(key, 64)
    acc = gravity.accel_direct(pos, mass, eps=0.01)
    total_force = jnp.sum(mass[:, None] * acc, axis=0)
    np.testing.assert_allclose(total_force, 0.0, atol=1e-13)


def test_single_particle():
    pos = jnp.zeros((1, 3))
    mass = jnp.ones((1,))
    acc, phi = gravity.accel_potential_direct(pos, mass, eps=0.1)
    np.testing.assert_allclose(acc, 0.0, atol=1e-12)
    np.testing.assert_allclose(phi, 0.0, atol=1e-12)
    acc0 = gravity.accel_direct(pos, mass, eps=0.0)
    assert bool(jnp.all(jnp.isfinite(acc0)))


def test_blocked_matches_direct(key):
    n = 100  # deliberately not a multiple of the chunk
    pos, _, mass = _random_cluster(key, n)
    ref = gravity.accel_direct(pos, mass, eps=0.05)
    out = gravity.accel(pos, mass, eps=0.05, chunk=32)
    scale = jnp.max(jnp.linalg.norm(ref, axis=1))
    np.testing.assert_allclose(out, ref, atol=2e-5 * float(scale))


def test_blocked_potential_matches_direct(key):
    n = 77
    pos, _, mass = _random_cluster(key, n)
    acc_ref, phi_ref = gravity.accel_potential_direct(pos, mass, eps=0.02, G=1.3)
    acc, phi = gravity.accel_potential(pos, mass, eps=0.02, G=1.3, chunk=32)
    np.testing.assert_allclose(phi, phi_ref, rtol=2e-4)
    scale = jnp.max(jnp.linalg.norm(acc_ref, axis=1))
    np.testing.assert_allclose(acc, acc_ref, atol=2e-5 * float(scale))


def test_pairwise_energy_consistency(key):
    """PE = 0.5 sum_i m_i phi_i equals the explicit i<j pair sum."""
    n = 32
    pos, _, mass = _random_cluster(key, n)
    eps = 0.03
    _, phi = gravity.accel_potential_direct(pos, mass, eps=eps)
    pe = 0.5 * jnp.sum(mass * phi)
    pe_ref = 0.0
    posn, massn = np.asarray(pos), np.asarray(mass)
    for i in range(n):
        for j in range(i + 1, n):
            r = np.linalg.norm(posn[i] - posn[j])
            pe_ref -= massn[i] * massn[j] / np.sqrt(r**2 + eps**2)
    np.testing.assert_allclose(float(pe), pe_ref, rtol=1e-10)


def test_jerk_finite_difference(key):
    """jerk == d(accel)/dt along ballistic trajectories."""
    n = 24
    pos, vel, mass = _random_cluster(key, n)
    eps = 0.1
    _, jerk = gravity.accel_jerk_direct(pos, vel, mass, eps=eps)
    h = 1e-6
    a_plus = gravity.accel_direct(pos + h * vel, mass, eps=eps)
    a_minus = gravity.accel_direct(pos - h * vel, mass, eps=eps)
    jerk_fd = (a_plus - a_minus) / (2 * h)
    scale = jnp.max(jnp.linalg.norm(jerk, axis=1))
    np.testing.assert_allclose(jerk, jerk_fd, atol=1e-6 * float(scale))


def test_blocked_jerk_matches_direct(key):
    n = 90
    pos, vel, mass = _random_cluster(key, n)
    acc_ref, jerk_ref = gravity.accel_jerk_direct(pos, vel, mass, eps=0.05)
    acc, jerk = gravity.accel_jerk(pos, vel, mass, eps=0.05, chunk=32)
    ascale = jnp.max(jnp.linalg.norm(acc_ref, axis=1))
    jscale = jnp.max(jnp.linalg.norm(jerk_ref, axis=1))
    np.testing.assert_allclose(acc, acc_ref, atol=2e-5 * float(ascale))
    np.testing.assert_allclose(jerk, jerk_ref, atol=2e-5 * float(jscale))


def test_centering_invariance(key):
    """f32 blocked path survives an 8 kpc galactocentric offset."""
    n = 64
    pos, _, mass = _random_cluster(key, n)
    base = gravity.accel(pos, mass, eps=0.05, chunk=32)
    shifted = gravity.accel(pos + jnp.array([8000.0, 0.0, 0.0]), mass,
                            eps=0.05, chunk=32)
    scale = jnp.max(jnp.linalg.norm(base, axis=1))
    np.testing.assert_allclose(shifted, base, atol=3e-5 * float(scale))


def test_state_dtype_preserved(key):
    pos, _, mass = _random_cluster(key, 16)
    out = gravity.accel(pos, mass, eps=0.1)
    assert out.dtype == jnp.float64
