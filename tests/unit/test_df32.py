"""df32 arithmetic and the extended/df32 force tiers vs the f64 oracle
(SURVEY.md §7 hard part #1 — the pairwise-precision lever beyond f32;
ROADMAP round-2: "the only accuracy lever left is wider (f64/two-float)
pairwise math").

The EFT exactness tests run UNDER JIT deliberately: XLA's algebraic
simplifier broke both the Dekker split (`c - (c - a)` -> `a`) and
quick_two_sum (`b - (s - a)` -> residual deleted) inside fused graphs
while passing in eager/isolated form — these tests pin the fixed
behaviour (bitmask split + optimization_barrier)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oc_nbody_tpu.ops import df32, gravity


def _vals(n=4096):
    a = jax.random.normal(jax.random.PRNGKey(0), (n,), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(1), (n,), jnp.float32) * 1e3
    return a, b


def test_two_sum_exact_under_jit():
    a, b = _vals()
    s, e = jax.jit(df32.two_sum)(a, b)
    exact = np.asarray(a, np.float64) + np.asarray(b, np.float64)
    got = np.asarray(s, np.float64) + np.asarray(e, np.float64)
    np.testing.assert_array_equal(got, exact)


def test_two_prod_exact_under_jit():
    a, b = _vals()
    p, e = jax.jit(df32.two_prod)(a, b)
    exact = np.asarray(a, np.float64) * np.asarray(b, np.float64)
    got = np.asarray(p, np.float64) + np.asarray(e, np.float64)
    np.testing.assert_array_equal(got, exact)


def test_eft_exact_inside_fused_graph():
    """The regression that motivated the bitmask split + barrier: EFTs
    embedded in a larger jitted computation (rsqrt feeding df ops) must
    stay exact — the plain Dekker/quick_two_sum forms measured 1-ulp
    errors here while passing the isolated tests above."""
    x = jnp.geomspace(1e-6, 1e3, 4096).astype(jnp.float32)

    @jax.jit
    def f(x):
        y = df32.df_rsqrt((x, jnp.zeros_like(x)))
        return y

    h, l = f(x)
    got = np.asarray(h, np.float64) + np.asarray(l, np.float64)
    ref = np.asarray(x, np.float64) ** -0.5
    assert np.max(np.abs(got - ref) / ref) < 1e-12


def _cluster(n=768, close=True):
    key = jax.random.PRNGKey(0)
    kp, kv, km = jax.random.split(key, 3)
    pos = jax.random.normal(kp, (n, 3), jnp.float64)
    if close:
        # close pairs at 1e-5 of the coordinate scale: these expose the
        # f32 input-quantisation error (measured 6.5e-3 max-rel for the
        # f32 kernels on this configuration)
        pos = pos.at[50:100].set(
            pos[:50] + 1e-5 * jax.random.normal(km, (50, 3), jnp.float64))
    vel = 0.3 * jax.random.normal(kv, (n, 3), jnp.float64)
    mass = jax.random.uniform(km, (n,), jnp.float64, 0.5, 1.5) / n
    return pos, vel, mass


def test_accel_tiers_vs_oracle():
    pos, _, mass = _cluster()
    eps = 1e-4
    ref = gravity.accel_direct(pos, mass, eps=eps)
    scale = float(jnp.max(jnp.linalg.norm(ref, axis=1)))

    aext = df32.accel_extended(pos, mass, eps, chunk=256)
    eext = float(jnp.max(jnp.linalg.norm(aext - ref, axis=1))) / scale
    assert eext < 2e-5, eext          # measured 4.0e-6 incl. close pairs

    adf = df32.accel_df(pos, mass, eps, chunk=256)
    edf = float(jnp.max(jnp.linalg.norm(adf - ref, axis=1))) / scale
    assert edf < 1e-8, edf            # measured 2.4e-10

    # the tiers must actually beat f32 on the close-pair configuration
    a32 = gravity.accel(pos, mass, eps, chunk=256)
    e32 = float(jnp.max(jnp.linalg.norm(a32 - ref, axis=1))) / scale
    assert e32 > 10 * eext > 1e4 * edf, (e32, eext, edf)


def test_potential_tiers_vs_oracle():
    pos, _, mass = _cluster(close=False)
    eps = 0.05
    _, phi_ref = gravity.accel_potential_direct(pos, mass, eps=eps, G=1.3)
    # f64 self term: an f32 one caps the df-tier comparison at ~7e-9
    self_term = gravity.self_phi(mass, jnp.float64(eps), jnp.float64(1.3))

    for fn, tol in ((df32.accel_potential_extended, 1e-6),
                    (df32.accel_potential_df, 1e-10)):
        _, phi = fn(pos, mass, eps, 1.3, chunk=256)
        phi = phi + self_term
        err = float(jnp.max(jnp.abs(phi - phi_ref))
                    / jnp.max(jnp.abs(phi_ref)))
        assert err < tol, (fn.__name__, err)


def test_jerk_tiers_vs_oracle():
    pos, vel, mass = _cluster()
    eps = 1e-4
    _, jref = gravity.accel_jerk_direct(pos, vel, mass, eps=eps)
    jscale = float(jnp.max(jnp.linalg.norm(jref, axis=1)))

    _, jext = df32.accel_jerk_extended(pos, vel, mass, eps, chunk=256)
    eext = float(jnp.max(jnp.linalg.norm(jext - jref, axis=1))) / jscale
    assert eext < 5e-5, eext          # measured 3.8e-6

    _, jdf = df32.accel_jerk_df(pos, vel, mass, eps, chunk=256)
    edf = float(jnp.max(jnp.linalg.norm(jdf - jref, axis=1))) / jscale
    assert edf < 1e-8, edf            # measured 2.7e-11
