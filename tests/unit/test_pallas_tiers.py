"""Pallas extended/df32 accel kernels vs the f64 oracle, on CPU via the
Pallas interpreter (same pattern as test_pallas_interpret.py). The jnp
tiers in ops/df32.py are the reference implementations; real-hardware
numbers live in docs/PERFORMANCE.md."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import oc_nbody_tpu.ops.pallas_df as pd
import oc_nbody_tpu.ops.pallas_gravity as pg
from oc_nbody_tpu.ops import gravity


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    # read at CALL time by the shared _call in ops/pallas_pair.py — one
    # knob covers pallas_gravity, pallas_df, and the generated families
    monkeypatch.setenv("OCN_PALLAS_INTERPRET", "1")
    jitted = (pg.accel_x, pg.accel_potential_x, pg.accel_jerk_rows_x,
              pd.accel_df_pallas, pd.accel_jerk_df_pallas)
    for fn in jitted:
        fn.clear_cache()
    yield
    for fn in jitted:
        fn.clear_cache()


def _cluster(n=600):
    key = jax.random.PRNGKey(7)
    kp, km = jax.random.split(key)
    pos = jax.random.normal(kp, (n, 3), jnp.float64)
    # close pairs at 1e-5 of the coordinate scale (f32 kernels: ~6e-3
    # max-rel force error here — the tiers must crush this)
    pos = pos.at[50:100].set(
        pos[:50] + 1e-5 * jax.random.normal(km, (50, 3), jnp.float64))
    mass = jax.random.uniform(km, (n,), jnp.float64, 0.5, 1.5) / n
    return pos, mass


def test_pallas_extended_matches_oracle():
    pos, mass = _cluster()
    eps = 1e-4
    ref = gravity.accel_direct(pos, mass, eps=eps)
    scale = float(jnp.max(jnp.linalg.norm(ref, axis=1)))
    out = pg.accel_x(pos, mass, eps)
    err = float(jnp.max(jnp.linalg.norm(out - ref, axis=1))) / scale
    assert err < 2e-5, err            # hardware-measured 4.3e-6


def test_pallas_df_matches_oracle():
    pos, mass = _cluster()
    eps = 1e-4
    ref = gravity.accel_direct(pos, mass, eps=eps)
    scale = float(jnp.max(jnp.linalg.norm(ref, axis=1)))
    out = pd.accel_df_pallas(pos, mass, eps)
    err = float(jnp.max(jnp.linalg.norm(out - ref, axis=1))) / scale
    # interpret mode executes the kernel body through XLA CPU, whose
    # algebraic simplifier partially degrades the barrier-free EFTs to
    # ~1e-7 (still 4 decades under f32). On hardware Mosaic compiles the
    # EFT patterns verbatim and the kernel measures 2.05e-10 max-rel
    # (bench/validate_pallas.py asserts the hardware number).
    assert err < 5e-7, err


def test_pallas_df_jerk_matches_oracle():
    pos, mass = _cluster(512)
    key = jax.random.PRNGKey(4)
    vel = 0.3 * jax.random.normal(key, pos.shape, jnp.float64)
    eps = 1e-4
    aref, jref = gravity.accel_jerk_direct(pos, vel, mass, eps=eps)
    acc, jerk = pd.accel_jerk_df_pallas(pos, vel, mass, eps)
    ascale = float(jnp.max(jnp.linalg.norm(aref, axis=1)))
    jscale = float(jnp.max(jnp.linalg.norm(jref, axis=1)))
    aerr = float(jnp.max(jnp.linalg.norm(acc - aref, axis=1))) / ascale
    jerr = float(jnp.max(jnp.linalg.norm(jerk - jref, axis=1))) / jscale
    # interpret-limited (XLA CPU simplifier); hardware is df32-exact
    assert aerr < 5e-7, aerr
    assert jerr < 5e-6, jerr


def test_pallas_extended_potential_matches_oracle():
    pos, mass = _cluster()
    eps = 1e-4
    _, phi_ref = gravity.accel_potential_direct(pos, mass, eps=eps, G=1.3)
    _, phi = pg.accel_potential_x(pos, mass, eps, 1.3)
    phi = phi + gravity.self_phi(mass, jnp.float64(eps), jnp.float64(1.3))
    err = float(jnp.max(jnp.abs(phi - phi_ref))
                / jnp.max(jnp.abs(phi_ref)))
    # at eps=1e-4 the included-then-cancelled softened self term -G m/eps
    # dominates each row's sum; its f32 rounding bounds the comparison at
    # ~1e-6 (the f32 kernels share the same contract and bound)
    assert err < 5e-6, err


def test_pallas_extended_jerk_matches_oracle():
    pos, mass = _cluster()
    key = jax.random.PRNGKey(3)
    vel = 0.3 * jax.random.normal(key, pos.shape, jnp.float64)
    eps = 1e-4
    _, jref = gravity.accel_jerk_direct(pos, vel, mass, eps=eps)
    jscale = float(jnp.max(jnp.linalg.norm(jref, axis=1)))
    acc, jerk = pg.accel_jerk_x(pos, vel, mass, eps)
    jerr = float(jnp.max(jnp.linalg.norm(jerk - jref, axis=1))) / jscale
    assert jerr < 5e-5, jerr

    aref = gravity.accel_direct(pos, mass, eps=eps)
    ascale = float(jnp.max(jnp.linalg.norm(aref, axis=1)))
    aerr = float(jnp.max(jnp.linalg.norm(acc - aref, axis=1))) / ascale
    assert aerr < 2e-5, aerr


def test_extended_rows_path_matches_oracle():
    """The block-timestep active-row evaluation at the extended tier
    (ForceModel.accel_jerk_on_rows -> accel_jerk_rows_x)."""
    from oc_nbody_tpu.forces import make_force_model

    pos, mass = _cluster(512)
    key = jax.random.PRNGKey(5)
    vel = 0.3 * jax.random.normal(key, pos.shape, jnp.float64)
    rows = slice(0, 120)
    fm = make_force_model(eps=0.05, backend="pallas", precision="extended")
    acc, jerk = fm.accel_jerk_on_rows(pos[rows], vel[rows], pos, vel, mass)
    acc_ref, jerk_ref = gravity.accel_jerk_rows(pos[rows], vel[rows], pos,
                                                vel, mass, eps=0.05)
    ascale = float(jnp.max(jnp.linalg.norm(acc_ref, axis=1)))
    jscale = float(jnp.max(jnp.linalg.norm(jerk_ref, axis=1)))
    np.testing.assert_allclose(np.asarray(acc), np.asarray(acc_ref),
                               atol=2e-5 * ascale)
    np.testing.assert_allclose(np.asarray(jerk), np.asarray(jerk_ref),
                               atol=5e-5 * jscale)


def test_forcemodel_routes_tiers_to_pallas(monkeypatch):
    """backend='pallas' + precision tiers must dispatch to the Pallas
    kernels (interpret here), matching the jnp tier."""
    from oc_nbody_tpu.forces import make_force_model

    pos, mass = _cluster(320)
    ref = gravity.accel_direct(pos, mass, eps=0.05)
    scale = float(jnp.max(jnp.linalg.norm(ref, axis=1)))
    # df32 tolerance is interpret-limited (see test_pallas_df_matches_oracle)
    for prec, tol in (("extended", 2e-5), ("df32", 5e-7)):
        fm = make_force_model(eps=0.05, backend="pallas", precision=prec)
        out = fm.accel(pos, mass)
        err = float(jnp.max(jnp.linalg.norm(out - ref, axis=1))) / scale
        assert err < tol, (prec, err)
