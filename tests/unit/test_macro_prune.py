"""Escape pruning x the macro (oversized-N, host-stepped) path — VERDICT
round-3 Missing #1: the pruned two-sweep force evaluation split into
bounded batched dispatches (ForceModel._pruned_batched_eval), and the
run() driver threading the source set through the host-stepped stepper.

Kernel-level: the Pallas pruned batched evals (interpret mode) must agree
with the jnp pruned ForceModel, which is itself f64-oracle-pinned in
tests/unit/test_escape_prune.py. Driver-level: a macro_batches run with
an ACTIVE partition conserves through the ledger and resumes bitwise.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oc_nbody_tpu import escape
from oc_nbody_tpu.config import SimConfig
from oc_nbody_tpu.forces import make_force_model
from oc_nbody_tpu.models.plummer import plummer
from oc_nbody_tpu.run import run

N, EPS = 256, 1.0 / 64


@pytest.fixture
def interpret(monkeypatch):
    monkeypatch.setenv("OCN_PALLAS_INTERPRET", "1")
    yield


def _pruned_pair(backend, precision="f32"):
    state = plummer(N, jax.random.PRNGKey(0))
    r = np.linalg.norm(np.asarray(state.pos), axis=1)
    mask = r <= np.quantile(r, 0.2)
    idx, wgt, _ = escape.build_sources(mask, 16)
    force = make_force_model(eps=EPS, backend=backend, precision=precision)
    return state, force.with_sources(jnp.asarray(idx), jnp.asarray(wgt),
                                     jnp.asarray(mask.astype(np.float64)))


@pytest.mark.parametrize("precision,tol", [("f32", 2e-6), ("extended", 5e-7)])
def test_pruned_batched_evals_match_unbatched(interpret, precision, tol):
    """accel/phi/jerk through the batched dispatch splitting (n_batches=3
    — deliberately NOT dividing N, exercising the chunk padding) must
    match the single-dispatch jnp pruned force at the tier's accuracy."""
    state, ref = _pruned_pair("jnp", precision)
    _, pal = _pruned_pair("pallas", precision)

    a_ref = np.asarray(ref.accel(state.pos, state.mass))
    a = np.asarray(pal.accel_batched(state.pos, state.mass, n_batches=3))
    assert np.abs(a - a_ref).max() / np.abs(a_ref).max() < tol

    _, p_ref, _ = ref.accel_potential(state.pos, state.mass)
    _, p, _ = pal.accel_potential_batched(state.pos, state.mass,
                                          n_batches=3)
    p_ref, p = np.asarray(p_ref), np.asarray(p)
    assert np.abs(p - p_ref).max() / np.abs(p_ref).max() < tol

    aj_ref, j_ref = ref.accel_jerk(state.pos, state.vel, state.mass)
    aj, j = pal.accel_jerk_batched(state.pos, state.vel, state.mass,
                                   n_batches=3)
    j_ref, j = np.asarray(j_ref), np.asarray(j)
    assert (np.abs(np.asarray(aj) - np.asarray(aj_ref)).max()
            / np.abs(aj_ref).max() < tol)
    assert np.abs(j - j_ref).max() / np.abs(j_ref).max() < 4 * tol


@pytest.mark.parametrize("precision,tol", [("f32", 2e-6), ("extended", 5e-7)])
def test_pruned_batched_row_cap(interpret, monkeypatch, precision, tol):
    """Row chunks past pallas_gravity.RT_MAX_ROWS must split into more,
    capped dispatches (and the extended hilo entries must route capped
    rows to the row-gridded streamed kernels) and still match — the
    resident kernels' scoped-VMEM envelope: a 1M/4-row chunk measured a
    compile-time OOM (16.14M vs the 16.00M limit) on the chip."""
    from oc_nbody_tpu.ops import pallas_gravity as pg
    monkeypatch.setattr(pg, "RT_MAX_ROWS", 64)
    state, ref = _pruned_pair("jnp", precision)
    _, pal = _pruned_pair("pallas", precision)
    a_ref = np.asarray(ref.accel(state.pos, state.mass))
    # n_batches=1: uncapped cs would be N=256 rows in one dispatch; the
    # cap must force 4 dispatches of 64 and reproduce the oracle
    a = np.asarray(pal.accel_batched(state.pos, state.mass, n_batches=1))
    assert np.abs(a - a_ref).max() / np.abs(a_ref).max() < tol
    aj_ref, j_ref = ref.accel_jerk(state.pos, state.vel, state.mass)
    aj, j = pal.accel_jerk_batched(state.pos, state.vel, state.mass,
                                   n_batches=1)
    assert (np.abs(np.asarray(aj) - np.asarray(aj_ref)).max()
            / np.abs(np.asarray(aj_ref)).max() < tol)
    assert (np.abs(np.asarray(j) - np.asarray(j_ref)).max()
            / np.abs(np.asarray(j_ref)).max() < 4 * tol)


def _macro_cfg(out_dir, t_end):
    """Over-tidal scenario with r_cut=0.5 so the partition is ACTIVE from
    t=0 (33 members -> bucket 64 at n=256, measured in the test design);
    macro steps are interpret-mode slow, so the run is a few steps only."""
    return SimConfig.from_dict({
        "units": {"kind": "henon", "mass_msun": 500.0, "length_pc": 8.0},
        "ic": {"kind": "plummer", "n": 256, "seed": 3},
        "potential": {"kind": "milky_way"},
        "orbit": {"kind": "circular", "R0_pc": 4000.0},
        "escape": {"prune": True, "r_cut": 0.5, "min_bucket": 32},
        "integrator": {"kind": "kdk", "dt": 1.0 / 64, "eps": 1.0 / 64,
                       "macro_batches": 2},
        "backend": "pallas",
        "output": {"out_dir": str(out_dir), "t_end": t_end,
                   "diag_every": 4.0 / 64, "snap_every": 4.0 / 64,
                   "stdout": False},
    })


def test_macro_driver_with_active_pruning(interpret, tmp_path):
    res = run(_macro_cfg(tmp_path / "full", 8.0 / 64))
    d = res.diagnostics
    assert d["N_cluster"].max() < N, "partition must be active from t=0"
    assert np.isfinite(d["E_tot"]).all()
    # ledgered conservation: this deliberately violent scenario (r_cut=0.5
    # slices through the cluster, E_prune_cum jumps ~0.012/interval)
    # measures -1.297e-3 through the IN-JIT jnp pruned driver too — the
    # macro batched path reproduces the established path's number to 4
    # digits; the bound is the scenario's truncation class, not the gap
    assert np.abs(d["dE_cons_over_E_int"]).max() < 5e-3
    # resume from the mid-run snapshot is bitwise (history-free partition
    # recomputed on restore, batched dispatch deterministic)
    run(_macro_cfg(tmp_path / "legs", 4.0 / 64))
    res_b = run(_macro_cfg(tmp_path / "legs", 8.0 / 64), resume=True)
    np.testing.assert_array_equal(np.asarray(res.state.pos),
                                  np.asarray(res_b.state.pos))
    np.testing.assert_array_equal(np.asarray(res.state.vel),
                                  np.asarray(res_b.state.vel))
