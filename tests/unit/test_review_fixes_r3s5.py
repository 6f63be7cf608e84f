"""Regression tests for the round-3 final-session integrator review.

Each test pins one previously-latent defect:
  * Hermite4.reached used t_end*(1-eps): wrong direction for negative
    t_end — advance_to stopped but reached() stayed False (driver hang)
  * the dt growth limiter capped against the boundary-CLIPPED landing
    step, poisoning the carried dt to <= 2x a tiny clip at every
    diagnostics boundary (and the a2/a3 interpolation over the
    degenerate pair is rounding noise)
  * quantize=True with the dataclass-default dt_max=inf made every dt
    inf (inf / 2^k) instead of raising
  * quantization rounds down and could land below dt_min, bypassing the
    safety clamp
  * the driver silently accepted off-grid output targets for the block
    integrator (heterogeneous per-particle times at diag/snapshot time)
  * block pec2 evaluated the external parts at the predicted state while
    a1_full was re-evaluated at the corrected one (inconsistent split)
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oc_nbody_tpu.config import SimConfig
from oc_nbody_tpu.forces import make_force_model
from oc_nbody_tpu.integrators.hermite import Hermite4, _shape_dt_fn
from oc_nbody_tpu.models.plummer import plummer
from oc_nbody_tpu.run import run


def _carry(n=64, seed=0, **kw):
    state = plummer(n, jax.random.PRNGKey(seed))
    force = make_force_model(eps=0.05, backend="jnp")
    stepper = Hermite4(force=force, **kw)
    return stepper, stepper.init(state)


def test_reached_negative_t_end():
    stepper, carry = _carry()
    carry = carry.replace(state=carry.state.replace(
        time=jnp.asarray(-1.0, jnp.float64)))
    # advance_to's cond would not enter at time == t_end; reached must agree
    assert stepper.reached(carry, -1.0)
    assert not stepper.reached(carry, -0.5)
    assert stepper.reached(carry, -1.0 + 1e-15)


def test_landing_step_does_not_poison_dt():
    """A boundary-clipped tiny step must carry the previous dt forward,
    not cap the next segment at 2x the clip (and not trust a2/a3
    interpolated over a degenerate dt)."""
    stepper, carry = _carry()
    dt0 = float(carry.dt)
    tiny = 1e-9 * dt0
    after = stepper._step_with_dt(carry, jnp.asarray(tiny))
    assert float(after.dt) == pytest.approx(dt0, rel=1e-12), (
        float(after.dt), dt0)
    # a genuine full step still obeys the 2x growth limit
    full = stepper._step_with_dt(carry, carry.dt)
    assert float(full.dt) <= 2.0 * dt0 * (1 + 1e-12)


def test_advance_to_boundary_then_continue_keeps_dt():
    """End-to-end: landing exactly on a diag boundary must leave the
    carried dt at production size for the next segment."""
    stepper, carry = _carry(n=32)
    dt0 = float(carry.dt)
    carry = jax.jit(stepper.advance_to)(carry, 3.7 * dt0)  # forces a clip
    assert float(carry.dt) > 0.2 * dt0, float(carry.dt)


def test_quantize_requires_finite_dt_max():
    force = make_force_model(eps=0.05, backend="jnp")
    with pytest.raises(ValueError, match="finite dt_max"):
        Hermite4(force=force, quantize=True)  # dataclass default dt_max=inf


def test_quantize_respects_dt_min():
    """Round-down quantization landing below dt_min: the safety clamp
    wins (the value may then be off the power-of-two grid)."""
    dt = _shape_dt_fn(jnp.asarray(0.3, jnp.float64), 0.3, 1.0, True)
    assert float(dt) == pytest.approx(0.3)
    # without a binding dt_min the grid value is returned
    dt = _shape_dt_fn(jnp.asarray(0.3, jnp.float64), 0.0, 1.0, True)
    assert float(dt) == pytest.approx(0.25)


def test_block_driver_snaps_off_grid_targets(tmp_path):
    """kind='block' with diag_every NOT a multiple of dt_max (the
    Myr-cadence case): the driver snaps every output boundary to the
    block grid instead of silently evaluating diagnostics on a
    desynchronized state."""
    dt_max = 1.0 / 16
    cfg = SimConfig.from_dict({
        "ic": {"kind": "plummer", "n": 48, "seed": 3},
        "integrator": {"kind": "block", "eps": 0.05, "dt_max": dt_max,
                       "n_levels": 4},
        "backend": "jnp",
        "output": {"out_dir": str(tmp_path / "blk"),
                   # 0.1 and 0.17 are NOT multiples of 1/16
                   "t_end": 0.17, "diag_every": 0.1, "snap_every": 0.1,
                   "stdout": False},
    })
    res = run(cfg)
    times = np.asarray(res.diagnostics["time"])
    rel = times / dt_max
    np.testing.assert_allclose(rel, np.round(rel), atol=1e-9,
                               err_msg=f"diag times off the block grid: "
                                       f"{times}")
    assert np.isfinite(res.diagnostics["E_tot"]).all()


def test_block_pec2_matches_non_pec2_closely(tmp_path):
    """pec2's external parts are evaluated at the same state as the
    re-evaluated totals; on a smooth external field pec2 and base must
    agree to corrector-iteration order (catches a mixed-state split)."""
    def _run(pec2, out):
        cfg = SimConfig.from_dict({
            "ic": {"kind": "plummer", "n": 48, "seed": 3},
            "potential": {"kind": "milky_way"},
            "orbit": {"kind": "circular", "R0_pc": 4000.0},
            "units": {"kind": "henon", "mass_msun": 5.0e4,
                      "length_pc": 10.0},
            "integrator": {"kind": "block", "eps": 0.05,
                           "dt_max": 1.0 / 16, "n_levels": 4,
                           "pec2": pec2},
            "backend": "jnp",
            "output": {"out_dir": out, "t_end": 0.25,
                       "diag_every": 0.25, "snap_every": 0.25,
                       "stdout": False},
        })
        return run(cfg)

    r0 = _run(False, str(tmp_path / "b0"))
    r1 = _run(True, str(tmp_path / "b1"))
    p0 = np.asarray(r0.state.pos)
    p1 = np.asarray(r1.state.pos)
    scale = np.abs(p0 - np.mean(p0, 0)).max()
    assert np.abs(p1 - p0).max() < 2e-3 * scale
