"""The carry-merge policy at out-of-band boundaries (run._merge_reinit_carry).

Round-4 flagship attribution (bench/flagship_attrib.json): the 1.1e-3
ledger residual was the post-death transient integrating on eta_init
startup rungs one level COARSER than the running Aarseth rungs (halving
eta_init dropped the jump to 7.6e-6; eta, kicks, diag_f64 moved
nothing). The fix: at SEV boundaries (keep_steps=False) the re-derived
startup steps are CAPPED by the pre-jump ones via elementwise min; at
escape-pruning re-partitions (keep_steps=True) the old steps are kept
outright (re-deriving them tripled the block drift — round-3 note)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from oc_nbody_tpu.forces import make_force_model
from oc_nbody_tpu.integrators.block import BlockHermite
from oc_nbody_tpu.integrators.hermite import Hermite4
from oc_nbody_tpu.models.plummer import plummer
from oc_nbody_tpu.run import _merge_reinit_carry


def _state(n=64, seed=0):
    return plummer(n, jax.random.PRNGKey(seed))


def test_block_sev_boundary_caps_rungs_by_prejump():
    force = make_force_model(eps=1.0 / 32, backend="jnp")
    st = BlockHermite(force=force, dt_max=1.0 / 16, n_levels=6)
    state = _state()
    old = st.init(state)
    # pre-jump rungs one level FINER than the startup rule would re-derive
    old = old.replace(dt_i=jnp.maximum(old.dt_i // 2, 1),
                      n_steps=jnp.asarray(7, jnp.int64),
                      n_active_sum=jnp.asarray(123, jnp.int64))
    fresh = st.init(state)
    merged = _merge_reinit_carry(fresh, old, keep_steps=False)
    # capped at the pre-jump rungs everywhere the startup rule is coarser
    np.testing.assert_array_equal(
        np.asarray(merged.dt_i),
        np.minimum(np.asarray(fresh.dt_i), np.asarray(old.dt_i)))
    assert (np.asarray(merged.dt_i) <= np.asarray(old.dt_i)).all()
    # still valid power-of-two rungs
    d = np.asarray(merged.dt_i)
    assert ((d & (d - 1)) == 0).all() and (d >= 1).all()
    # run counters survive; the re-derived acc is the fresh one
    assert int(merged.n_steps) == 7
    assert int(merged.n_active_sum) == 123
    np.testing.assert_array_equal(np.asarray(merged.acc),
                                  np.asarray(fresh.acc))


def test_block_sev_boundary_keeps_fresh_rungs_where_finer():
    """A kicked star's startup rung can be FINER than its stale pre-jump
    one — min() must keep the fresh (finer) value there."""
    force = make_force_model(eps=1.0 / 32, backend="jnp")
    st = BlockHermite(force=force, dt_max=1.0 / 16, n_levels=6)
    state = _state()
    fresh = st.init(state)
    old = fresh.replace(dt_i=jnp.full_like(fresh.dt_i, st._dt_int_max))
    merged = _merge_reinit_carry(fresh, old, keep_steps=False)
    np.testing.assert_array_equal(np.asarray(merged.dt_i),
                                  np.asarray(fresh.dt_i))


def test_block_repartition_keeps_steps_outright():
    force = make_force_model(eps=1.0 / 32, backend="jnp")
    st = BlockHermite(force=force, dt_max=1.0 / 16, n_levels=6)
    state = _state()
    old = st.init(state)
    old = old.replace(dt_i=jnp.full_like(old.dt_i, st._dt_int_max))
    fresh = st.init(state)
    merged = _merge_reinit_carry(fresh, old, keep_steps=True)
    # keep_steps: the (coarser) pre-boundary rungs survive unchanged
    np.testing.assert_array_equal(np.asarray(merged.dt_i),
                                  np.asarray(old.dt_i))


def test_hermite_shared_dt_capped():
    force = make_force_model(eps=1.0 / 32, backend="jnp")
    st = Hermite4(force=force, dt_max=1.0 / 16)
    state = _state()
    fresh = st.init(state)
    old_dt = jnp.asarray(float(fresh.dt) / 4, fresh.dt.dtype)
    old = dataclasses.replace(fresh, dt=old_dt)
    merged = _merge_reinit_carry(fresh, old, keep_steps=False)
    assert float(merged.dt) == float(old_dt)
    # and where the fresh shared dt is already finer, it wins
    old2 = dataclasses.replace(fresh, dt=jnp.asarray(1e9, fresh.dt.dtype))
    merged2 = _merge_reinit_carry(fresh, old2, keep_steps=False)
    assert float(merged2.dt) == float(fresh.dt)
