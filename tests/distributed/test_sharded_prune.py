"""Escape pruning on the mesh (ShardedForce.with_sources + _pruned_eval)
— VERDICT round-3 Missing #1, the sharded seam.

Contract: identical to ForceModel's pruned dispatch (only tail–tail
interactions dropped; the single-device pruned force is f64-oracle-pinned
in tests/unit/test_escape_prune.py). The sharded two-sweep must reproduce
it on the emulated mesh at f32 summation-order tolerance, and the driver
must run a sharded dissolution end-to-end with ledgered conservation and
bitwise resume.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from oc_nbody_tpu import escape
from oc_nbody_tpu.config import SimConfig
from oc_nbody_tpu.forces import make_force_model
from oc_nbody_tpu.models.plummer import plummer
from oc_nbody_tpu.parallel import make_mesh, make_sharded_force
from oc_nbody_tpu.run import run

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (emulated) devices"
)

N, EPS = 512, 1.0 / 64


def _pruned_pair(d):
    state = plummer(N, jax.random.PRNGKey(0))
    r = np.linalg.norm(np.asarray(state.pos), axis=1)
    mask = r <= np.quantile(r, 0.2)
    idx, wgt, _ = escape.build_sources(mask, 16)
    src = (jnp.asarray(idx), jnp.asarray(wgt),
           jnp.asarray(mask.astype(np.float64)))
    ref = make_force_model(eps=EPS, backend="jnp").with_sources(*src)
    sf = make_sharded_force(eps=EPS, mesh=make_mesh(d),
                            backend="jnp").with_sources(*src)
    return state, ref, sf


@pytest.mark.parametrize("d", [2, 5, 8])
def test_sharded_pruned_accel_matches_single(d):
    state, ref, sf = _pruned_pair(d)
    a_ref = np.asarray(ref.accel(state.pos, state.mass))
    a = np.asarray(jax.jit(sf.accel)(state.pos, state.mass))
    assert np.abs(a - a_ref).max() / np.abs(a_ref).max() < 2e-6


def test_sharded_pruned_phi_and_jerk_match_single():
    state, ref, sf = _pruned_pair(8)
    _, p_ref, _ = ref.accel_potential(state.pos, state.mass)
    _, p, _ = jax.jit(sf.accel_potential)(state.pos, state.mass)
    p_ref, p = np.asarray(p_ref), np.asarray(p)
    assert np.abs(p - p_ref).max() / np.abs(p_ref).max() < 2e-6
    aj_ref, j_ref = ref.accel_jerk(state.pos, state.vel, state.mass)
    aj, j = jax.jit(sf.accel_jerk)(state.pos, state.vel, state.mass)
    assert (np.abs(np.asarray(aj) - np.asarray(aj_ref)).max()
            / np.abs(np.asarray(aj_ref)).max() < 2e-6)
    assert (np.abs(np.asarray(j) - np.asarray(j_ref)).max()
            / np.abs(np.asarray(j_ref)).max() < 5e-6)


def _pruned_pair_x(d):
    """Extended-tier twin of _pruned_pair: the single-device pruned
    extended ForceModel is the oracle."""
    state = plummer(N, jax.random.PRNGKey(0))
    r = np.linalg.norm(np.asarray(state.pos), axis=1)
    mask = r <= np.quantile(r, 0.2)
    idx, wgt, _ = escape.build_sources(mask, 16)
    src = (jnp.asarray(idx), jnp.asarray(wgt),
           jnp.asarray(mask.astype(np.float64)))
    ref = make_force_model(eps=EPS, backend="jnp",
                           precision="extended").with_sources(*src)
    sf = make_sharded_force(eps=EPS, mesh=make_mesh(d), backend="jnp",
                            precision="extended").with_sources(*src)
    return state, ref, sf


@pytest.mark.parametrize("d", [2, 8])
def test_sharded_pruned_extended_matches_single(d):
    """Round-5 (VERDICT round-4 Missing #2): the pruned two-sweep through
    the hi/lo sharded planes reproduces the single-device pruned extended
    tier — accel, phi AND jerk."""
    state, ref, sf = _pruned_pair_x(d)
    a_ref = np.asarray(ref.accel(state.pos, state.mass))
    a = np.asarray(jax.jit(sf.accel)(state.pos, state.mass))
    assert np.abs(a - a_ref).max() / np.abs(a_ref).max() < 2e-6
    _, p_ref, _ = ref.accel_potential(state.pos, state.mass)
    _, p, _ = jax.jit(sf.accel_potential)(state.pos, state.mass)
    p_ref, p = np.asarray(p_ref), np.asarray(p)
    assert np.abs(p - p_ref).max() / np.abs(p_ref).max() < 2e-6
    aj_ref, j_ref = ref.accel_jerk(state.pos, state.vel, state.mass)
    aj, j = jax.jit(sf.accel_jerk)(state.pos, state.vel, state.mass)
    assert (np.abs(np.asarray(aj) - np.asarray(aj_ref)).max()
            / np.abs(np.asarray(aj_ref)).max() < 2e-6)
    assert (np.abs(np.asarray(j) - np.asarray(j_ref)).max()
            / np.abs(np.asarray(j_ref)).max() < 5e-6)


def test_sharded_df32_still_rejected_at_construction():
    # df32 never reaches with_sources on a mesh: make_sharded_force
    # rejects the tier outright (routing rationale in parallel/force.py)
    with pytest.raises(ValueError, match="df32|tier"):
        make_sharded_force(eps=EPS, mesh=make_mesh(8), backend="jnp",
                           precision="df32")


# --------------------------------------------------------------------------
# driver: sharded dissolution run with pruning active
# --------------------------------------------------------------------------

def _run_cfg(out_dir, t_end, n_devices=8, kind="kdk"):
    cfg = SimConfig.from_dict({
        "units": {"kind": "henon", "mass_msun": 500.0, "length_pc": 8.0},
        "ic": {"kind": "plummer", "n": 256, "seed": 3},
        "potential": {"kind": "milky_way"},
        "orbit": {"kind": "circular", "R0_pc": 4000.0},
        "escape": {"prune": True, "r_cut": 1.5, "min_bucket": 32},
        "integrator": {"kind": kind, "dt": 1.0 / 256, "eps": 1.0 / 64,
                       "eta": 0.02},
        "output": {"out_dir": str(out_dir), "t_end": t_end,
                   "diag_every": 1.0, "snap_every": 3.0, "stdout": False},
        "mesh": {"n_devices": n_devices},
    })
    cfg.backend = "jnp"
    return cfg


def test_driver_sharded_prune_conserves_and_resumes(tmp_path):
    res = run(_run_cfg(tmp_path / "mesh", 12.0))
    d = res.diagnostics
    assert d["N_cluster"].min() < 256, "pruning never activated"
    assert np.abs(d["E_prune_cum"]).max() > 0
    assert np.abs(d["dE_cons_over_E_int"]).max() < 5e-3
    # bitwise resume with an active partition (history-free on the mesh
    # exactly as on one device)
    run(_run_cfg(tmp_path / "legs", 9.0))
    res_b = run(_run_cfg(tmp_path / "legs", 12.0), resume=True)
    np.testing.assert_array_equal(np.asarray(res.state.pos),
                                  np.asarray(res_b.state.pos))
    np.testing.assert_array_equal(np.asarray(res.state.vel),
                                  np.asarray(res_b.state.vel))


def test_driver_sharded_prune_matches_single_device(tmp_path):
    """The mesh dissolution tracks the single-device pruned run (same
    partition boundaries, f32 summation-order differences only) over a
    few stripping crossings."""
    res8 = run(_run_cfg(tmp_path / "d8", 6.0))
    res1 = run(_run_cfg(tmp_path / "d1", 6.0, n_devices=1))
    np.testing.assert_allclose(np.asarray(res8.state.pos),
                               np.asarray(res1.state.pos), atol=2e-5)
    np.testing.assert_allclose(res8.diagnostics["N_cluster"],
                               res1.diagnostics["N_cluster"])


def test_driver_sharded_prune_block_matches_single_device(tmp_path):
    """Round-5: escape pruning through the sharded block active-row eval
    (the rows_mask switch in ShardedForce.accel_jerk_on_rows) — the mesh
    dissolution run must track the single-device pruned block run."""
    # t=3 (3 stripping crossings): long enough that the partition cycles
    # and both all-tail and mixed switch branches run, short enough that
    # f32 summation-order chaos has not yet amplified through the block
    # micro-steps (measured: N_cluster identical through t=5 but ±3
    # borderline stars of 256 by t=6, and tail positions walk to ~4e-4
    # by t=5 — amplified rounding, not a contract break; the block path
    # takes ~30x more force evals than the kdk twin test, which happens
    # to match at t=6)
    res8 = run(_run_cfg(tmp_path / "b8", 3.0, kind="block"))
    res1 = run(_run_cfg(tmp_path / "b1", 3.0, n_devices=1, kind="block"))
    assert res8.diagnostics["N_cluster"].min() < 256, "pruning never active"
    np.testing.assert_allclose(res8.diagnostics["N_cluster"],
                               res1.diagnostics["N_cluster"])
    np.testing.assert_allclose(np.asarray(res8.state.pos),
                               np.asarray(res1.state.pos), atol=2e-5)
    assert np.abs(res8.diagnostics["dE_cons_over_E_int"]).max() < 5e-3


def test_driver_sharded_prune_extended_runs(tmp_path):
    """Extended tier × pruning × mesh through the standard driver."""
    cfg = _run_cfg(tmp_path / "x8", 3.0)
    cfg.integrator.precision = "extended"
    res = run(cfg)
    assert np.abs(res.diagnostics["dE_cons_over_E_int"]).max() < 5e-3
