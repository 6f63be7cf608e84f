"""Time-symmetrized dt selection (Hermite4.symmetrized — the Hut, Makino
& McMillan 1995 scheme; VERDICT round-3 Missing #4 mitigation knob).

The measured envelope on an e=0.9 binary over 100 periods (design
experiment, df32 force, dt_max=P/16): plain adaptive dt drifts
secularly at dE/E = -1.0e-3 (eta=0.02); symmetrizing reduces it ~1.7x at
+1 force eval/step; pec2 reduces it ~30x at the same extra eval — so
pec2 is the RECOMMENDED binary-dominated knob (the envelope study
bench/postcollapse_envelope.py records the same ordering on the
post-collapse cluster phase). These tests pin that the knob works and
the ordering that recommendation rests on.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oc_nbody_tpu.forces import make_force_model
from oc_nbody_tpu.integrators.hermite import Hermite4, MacroHermite
from oc_nbody_tpu.models.binaries import add_binaries
from oc_nbody_tpu.state import make_state


@pytest.fixture(scope="module")
def binary():
    parent = make_state(pos=jnp.zeros((1, 3)), vel=jnp.zeros((1, 3)),
                        mass=jnp.ones((1,)))
    pop = add_binaries(parent, jax.random.PRNGKey(7), fraction=1.0,
                       a_min=0.5, a_max=0.5, e_max=0.95)
    a0 = float(pop.a[0])
    gm = float(pop.state.mass.sum())
    period = 2.0 * np.pi * np.sqrt(a0 ** 3 / gm)
    return pop.state, period


def _drift(state, period, periods=25, **kw):
    force = make_force_model(eps=0.0, G=1.0, backend="jnp",
                             precision="df32")
    st = Hermite4(force=force, eta=0.02, dt_max=period / 16, **kw)
    c = jax.jit(st.advance_to)(st.init(state), periods * period)

    def e_tot(s):
        m = np.asarray(s.mass, np.float64)
        ke = 0.5 * float((m[:, None] * np.asarray(s.vel) ** 2).sum())
        r = float(np.linalg.norm(np.asarray(s.pos[0] - s.pos[1])))
        return ke - m[0] * m[1] / r

    assert st.reached(c, periods * period)
    return abs(e_tot(c.state) - e_tot(state)) / abs(e_tot(state))


def test_symmetrized_reduces_secular_drift(binary):
    state, period = binary
    plain = _drift(state, period)
    sym = _drift(state, period, symmetrized=True)
    # measured at 100 periods: 1.7x; assert a conservative margin and
    # that the knob cannot make things WORSE
    assert sym < 0.8 * plain, (sym, plain)


def test_pec2_beats_symmetrized_at_equal_cost(binary):
    """The recommendation's basis: at the same +1 eval/step, pec2's
    error-constant reduction dominates the dt-symmetrization gain on
    this problem class (measured 30x vs 1.7x at 100 periods)."""
    state, period = binary
    sym = _drift(state, period, symmetrized=True)
    pec2 = _drift(state, period, pec2=True)
    assert pec2 < 0.2 * sym, (pec2, sym)


def test_symmetrized_macro_refused():
    force = make_force_model(eps=0.01, backend="jnp")
    with pytest.raises(ValueError, match="symmetrized"):
        MacroHermite(force=force, eta=0.02, dt_max=0.25, symmetrized=True)


def test_symmetrized_config_surface(tmp_path):
    from oc_nbody_tpu.config import SimConfig
    from oc_nbody_tpu.run import run

    cfg = SimConfig.from_dict({
        "ic": {"kind": "plummer", "n": 64, "seed": 0},
        "integrator": {"kind": "hermite", "eta": 0.02, "eps": 1.0 / 32,
                       "dt_max": 0.25, "symmetrized": True},
        "output": {"out_dir": str(tmp_path), "t_end": 0.5,
                   "diag_every": 0.25, "stdout": False},
    })
    cfg.backend = "jnp"
    res = run(cfg)
    assert np.isfinite(res.diagnostics["E_tot"]).all()
    assert abs(res.diagnostics["dE_over_E_int"][-1]) < 1e-5
