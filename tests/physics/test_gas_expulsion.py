"""[potential.gas] — embedded natal-gas background + expulsion.

Physics contract: a cluster virialized inside a gas-deepened well
expands when the gas leaves (the infant-mortality driver); the reversed
Dehnen ramp takes the gas amplitude smoothly 1 -> 0."""
import jax.numpy as jnp
import numpy as np
import pytest

from oc_nbody_tpu.config import SimConfig
from oc_nbody_tpu.models import potentials as pot_mod
from oc_nbody_tpu.run import run
from oc_nbody_tpu.scene import build_scene


def test_reversed_ramp_is_a_smooth_decay():
    base = pot_mod.PlummerSphere(GM=jnp.asarray(1.0), b=jnp.asarray(0.5))
    dec = pot_mod.Ramped(base=base, t0=jnp.asarray(8.0), t1=jnp.asarray(5.0))
    t = np.linspace(0.0, 12.0, 200)
    amp = np.asarray([float(dec.amplitude(ti)) for ti in t])
    assert np.allclose(amp[t <= 5.0], 1.0)
    assert np.allclose(amp[t >= 8.0], 0.0)
    assert np.all(np.diff(amp) <= 1e-12), "decay must be monotone"
    mid = amp[(t > 5.0) & (t < 8.0)]
    assert np.all((mid > 0) & (mid < 1))


def _gas_cfg(tmp_path, name, t_expel_code=None, expel_code=None):
    """units.mass_msun = length_pc = 1 so the gas's physical fields ARE
    code units: gas mass 1.0 == the cluster mass (deeply embedded).
    t_expel/expel are given in code units and converted to Myr here."""
    from oc_nbody_tpu.utils.units import UnitSystem
    tm = UnitSystem.henon(mass_msun=1.0, length_pc=1.0).time_myr
    gas = {"kind": "plummer", "mass_msun": 1.0, "scale_pc": 1.0}
    if t_expel_code is not None:
        gas["t_expel_myr"] = t_expel_code * tm
        gas["expel_myr"] = expel_code * tm
    cfg = SimConfig.from_dict({
        "units": {"kind": "henon", "mass_msun": 1.0, "length_pc": 1.0},
        "ic": {"n": 512, "seed": 9, "vel_scale": float(np.sqrt(2.0))},
        "potential": {"kind": "none", "gas": gas},
        "integrator": {"dt": 1.0 / 128, "eps": 1.0 / 32},
        "output": {"out_dir": str(tmp_path / name), "t_end": 16.0,
                   "diag_every": 1.0, "snap_every": 8.0, "stdout": False},
    })
    cfg.backend = "jnp"
    return cfg


def test_scene_composes_gas_and_expulsion_zeroes_it(tmp_path):
    cfg = _gas_cfg(tmp_path, "compose", t_expel_code=5.0, expel_code=1.0)
    scene = build_scene(cfg)
    ext = scene.force.external
    assert ext is not None
    phi_early = float(ext.at(0.0).phi(jnp.zeros(3)))
    phi_late = float(ext.at(100.0).phi(jnp.zeros(3)))
    assert phi_early < -0.5, "embedded gas must deepen the central well"
    assert abs(phi_late) < 1e-12, "expelled gas must vanish"


def test_expulsion_expands_the_cluster(tmp_path):
    """Near-impulsive loss of the gas half of the binding mass: the
    half-mass radius must grow substantially after expulsion."""
    res = run(_gas_cfg(tmp_path, "expel", t_expel_code=6.0, expel_code=0.5))
    d = res.diagnostics
    t = d["time"]
    r50 = d["r_lagr_50"]
    before = float(np.mean(r50[(t >= 4.0) & (t <= 6.0)]))
    after = float(r50[-1])
    assert after > 1.25 * before, (
        f"no expansion after gas expulsion: r50 {before:.3f} -> {after:.3f}")
    # the external (gas) energy really switched off
    assert d["E_ext"][0] < -0.1
    assert abs(d["E_ext"][-1]) < 1e-10
    assert np.all(np.isfinite(d["E_tot"]))


def test_eccentric_orbit_with_gas_is_refused(tmp_path):
    cfg = _gas_cfg(tmp_path, "refuse", t_expel_code=5.0, expel_code=1.0)
    cfg.potential.kind = "milky_way"
    cfg.orbit.kind = "eccentric"
    cfg.orbit.r_apo_pc = 8000.0
    cfg.orbit.r_peri_pc = 4000.0
    with pytest.raises(ValueError, match="comoving"):
        build_scene(cfg)
