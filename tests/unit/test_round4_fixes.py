"""Regression tests for the round-4 ADVICE/VERDICT fixes.

Covers (ADVICE round-3 + VERDICT round-3 W6):
  * ensemble cadence: diag_every not a multiple of dt must use the
    REALIZED cadence k*dt for n_diag (the old code ended 20% early for
    diag_every=0.025, dt=0.01) and warn (ADVICE medium).
  * pruned block-path on-rows eval: the three-way lax.switch (all-cluster /
    all-tail / mixed) must agree with the two-sweep oracle on every branch,
    and 0.5 "don't-care" fill rows must not force the mixed branch or
    corrupt valid rows (ADVICE low #3 + integrators/block.py fill marking).
  * escape pruning in a non-stripping potential prints the one-time
    infinite-r_t notice instead of silently doing nothing (VERDICT W6).
"""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from oc_nbody_tpu.config import SimConfig
from oc_nbody_tpu import escape
from oc_nbody_tpu.forces import make_force_model
import jax

from oc_nbody_tpu.models.plummer import plummer
from oc_nbody_tpu.ensemble import run_ensemble
from oc_nbody_tpu.run import run

EPS = 1.0 / 64


# --------------------------------------------------------------------------
# pruned on-rows lax.switch branches
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def pruned_rows():
    state = plummer(256, jax.random.PRNGKey(11))
    mask = np.zeros(256, bool)
    mask[:64] = True                    # indices 0..63 cluster, rest tail
    idx, wgt, _ = escape.build_sources(mask, 16)
    base = make_force_model(eps=EPS, backend="jnp")
    pruned = base.with_sources(jnp.asarray(idx), jnp.asarray(wgt),
                               state.mass)
    return state, mask, base, pruned


def _oracle_rows(state, mask, base, rows):
    """Two-sweep reference: cluster rows x all sources, tail rows x the
    cluster-mass-only source set (tail sources zeroed)."""
    a_all, j_all = base.accel_jerk_on_rows(
        state.pos[rows], state.vel[rows], state.pos, state.vel, state.mass)
    m_cl = state.mass * jnp.asarray(mask)
    a_cl, j_cl = base.accel_jerk_on_rows(
        state.pos[rows], state.vel[rows], state.pos, state.vel, m_cl)
    mb = mask[np.asarray(rows)][:, None]
    return (np.where(mb, np.asarray(a_all), np.asarray(a_cl)),
            np.where(mb, np.asarray(j_all), np.asarray(j_cl)))


@pytest.mark.parametrize("which", ["cluster", "tail", "mixed"])
def test_pruned_rows_switch_branches(pruned_rows, which):
    state, mask, base, pruned = pruned_rows
    rows = {"cluster": np.arange(32),            # all members
            "tail": np.arange(128, 160),         # all tail
            "mixed": np.arange(48, 80)}[which]   # 16 members + 16 tail
    rmask = jnp.asarray(mask[rows].astype(np.float64))
    a, j = pruned.accel_jerk_on_rows(state.pos[rows], state.vel[rows],
                                     state.pos, state.vel, state.mass,
                                     rows_mask=rmask)
    a_o, j_o = _oracle_rows(state, mask, base, rows)
    assert np.abs(np.asarray(a) - a_o).max() / np.abs(a_o).max() < 2e-6
    assert np.abs(np.asarray(j) - j_o).max() / np.abs(j_o).max() < 5e-6


def test_pruned_rows_fill_dont_care(pruned_rows):
    """Fill rows marked 0.5 (block-stepper padding) must leave the valid
    rows' results on the single-sweep branch result — identical to the
    same rows evaluated without any fill present."""
    state, mask, base, pruned = pruned_rows
    valid = np.arange(16)                        # all cluster members
    rows = np.concatenate([valid, np.arange(200, 208)])   # 8 fill slots
    rmask = jnp.asarray(np.concatenate([np.ones(16), np.full(8, 0.5)]))
    a_f, j_f = pruned.accel_jerk_on_rows(state.pos[rows], state.vel[rows],
                                         state.pos, state.vel, state.mass,
                                         rows_mask=rmask)
    a_v, j_v = pruned.accel_jerk_on_rows(
        state.pos[valid], state.vel[valid], state.pos, state.vel,
        state.mass, rows_mask=jnp.ones(16))
    np.testing.assert_array_equal(np.asarray(a_f)[:16], np.asarray(a_v))
    np.testing.assert_array_equal(np.asarray(j_f)[:16], np.asarray(j_v))


# --------------------------------------------------------------------------
# ensemble realized cadence
# --------------------------------------------------------------------------

def test_ensemble_non_multiple_cadence_reaches_t_end(tmp_path, capsys):
    cfg = SimConfig.from_dict({
        "units": {"kind": "henon", "mass_msun": 1000.0, "length_pc": 2.0},
        "ic": {"kind": "plummer", "n": 32, "seed": 0},
        "potential": {"kind": "milky_way"},
        "orbit": {"kind": "circular", "R0_pc": 4000.0},
        "integrator": {"kind": "kdk", "dt": 0.01, "eps": 1.0 / 32},
        # diag_every=0.025, dt=0.01: k=round(2.5)=2, realized 0.02 — the
        # ADVICE round-3 case that used to end at 0.4 instead of 0.5
        "output": {"t_end": 0.5, "diag_every": 0.025, "stdout": False,
                   "out_dir": str(tmp_path)},
    })
    cfg.backend = "jnp"
    res = run_ensemble(cfg, [1, 2])
    assert "realized cadence" in capsys.readouterr().out
    t_final = res.n_steps * cfg.integrator.dt
    assert t_final >= 0.5 - 1e-9, f"ended early at t={t_final}"
    assert t_final <= 0.5 + 0.02 + 1e-9, "overshot by more than one interval"


# --------------------------------------------------------------------------
# infinite-r_t notice (VERDICT W6)
# --------------------------------------------------------------------------

def test_prune_infinite_rt_notice(tmp_path, capsys):
    """A cluster at rest deep inside a cored (harmonic) halo has
    lambda = lambda_max(-d2Phi) + Omega^2 < 0: r_t = inf, pruning can
    never activate, and the driver must SAY so once."""
    cfg = SimConfig.from_dict({
        "units": {"kind": "henon", "mass_msun": 500.0, "length_pc": 8.0},
        "ic": {"kind": "plummer", "n": 256, "seed": 3},
        "potential": {"kind": "log_halo", "v0_kms": 50.0, "rc_pc": 800.0},
        "orbit": {"kind": "none"},
        "escape": {"prune": True, "r_cut": 1.5, "min_bucket": 32},
        "integrator": {"kind": "kdk", "dt": 1.0 / 64, "eps": 1.0 / 64},
        "output": {"out_dir": str(tmp_path), "t_end": 0.25,
                   "diag_every": 0.125, "stdout": False},
    })
    cfg.backend = "jnp"
    res = run(cfg)
    out = capsys.readouterr().out
    assert out.count("tidal radius is infinite") == 1
    assert res.diagnostics["N_cluster"].min() == 256, \
        "pruning must stay inactive with r_t = inf"
