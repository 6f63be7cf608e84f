"""Primordial mass segregation (models/segregation.py + ic.segregation).

Oracles: the Allison+ MST ratio (the same observable the analysis layer
measures), the in/out mean-mass split, exact mass-set preservation, and
the strength ordering.
"""
import os
import sys

import numpy as np
import pytest
import jax

from oc_nbody_tpu.models.plummer import plummer
from oc_nbody_tpu.models.imf import kroupa_imf
from oc_nbody_tpu.models.segregation import segregate

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..",
                                "analysis"))
import profiles  # noqa: E402

N = 4096


@pytest.fixture(scope="module")
def kroupa_plummer():
    key = jax.random.PRNGKey(3)
    masses = kroupa_imf(N, jax.random.fold_in(key, 1))
    return plummer(N, key, masses=masses)


def test_full_segregation_observable(kroupa_plummer):
    st = segregate(kroupa_plummer, seed=1, strength=1.0)
    pos = np.asarray(st.pos)
    m = np.asarray(st.mass, np.float64)
    lam, sig = profiles.mass_segregation_ratio(pos, m, seed=2)
    assert lam - 2 * sig > 1.5, (lam, sig)   # strongly segregated
    r = np.linalg.norm(pos, axis=1)
    r_half = np.median(r)
    assert m[r < r_half].mean() > 1.5 * m[r >= r_half].mean()
    # the unsegregated IC measures none
    lam0, sig0 = profiles.mass_segregation_ratio(
        np.asarray(kroupa_plummer.pos),
        np.asarray(kroupa_plummer.mass, np.float64), seed=2)
    assert abs(lam0 - 1.0) < 3 * sig0


def test_mass_set_and_phase_space_preserved(kroupa_plummer):
    st = segregate(kroupa_plummer, seed=1, strength=0.7)
    np.testing.assert_array_equal(np.asarray(st.pos),
                                  np.asarray(kroupa_plummer.pos))
    np.testing.assert_array_equal(np.asarray(st.vel),
                                  np.asarray(kroupa_plummer.vel))
    np.testing.assert_allclose(
        np.sort(np.asarray(st.mass)),
        np.sort(np.asarray(kroupa_plummer.mass)), rtol=0)


def test_strength_ordering(kroupa_plummer):
    """Higher strength puts the top masses on more tightly bound (lower
    radius) stars: mean radius of the 50 heaviest decreases with S."""
    def mean_r_heavy(st):
        pos = np.asarray(st.pos)
        m = np.asarray(st.mass)
        idx = np.argsort(m)[-50:]
        return float(np.linalg.norm(pos[idx], axis=1).mean())

    r0 = mean_r_heavy(kroupa_plummer)
    r_mid = mean_r_heavy(segregate(kroupa_plummer, 1, 0.5))
    r_full = mean_r_heavy(segregate(kroupa_plummer, 1, 1.0))
    assert r_full < r_mid < r0, (r_full, r_mid, r0)


def test_zero_strength_is_identity(kroupa_plummer):
    st = segregate(kroupa_plummer, seed=1, strength=0.0)
    assert st is kroupa_plummer


def test_validation(kroupa_plummer):
    with pytest.raises(ValueError, match="strength"):
        segregate(kroupa_plummer, 1, 1.5)
    eq = plummer(256, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="mass spectrum"):
        segregate(eq, 1, 0.5)


def test_config_surface(tmp_path):
    from oc_nbody_tpu.config import SimConfig
    from oc_nbody_tpu.scene import build_scene

    cfg = SimConfig.from_dict({
        "ic": {"kind": "plummer", "n": 512, "seed": 2, "imf": "kroupa",
               "segregation": 1.0},
        "integrator": {"eps": 0.02},
    })
    scene = build_scene(cfg)
    pos = np.asarray(scene.state.pos)
    m = np.asarray(scene.state.mass, np.float64)
    r = np.linalg.norm(pos - (pos * (m / m.sum())[:, None]).sum(0), axis=1)
    rh = np.median(r)
    assert m[r < rh].mean() > 1.3 * m[r >= rh].mean()
