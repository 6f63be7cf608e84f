"""King model: ODE profile and sampler validation (SURVEY.md §7 hard part #4)."""
import jax
import numpy as np
import pytest

from oc_nbody_tpu import diagnostics
from oc_nbody_tpu.forces import make_force_model
from oc_nbody_tpu.models.king import king, solve_king_profile


def test_profile_concentration():
    """Known King concentrations c = log10(r_t/r_c): W0=3 -> ~0.67,
    W0=6 -> ~1.25, W0=9 -> ~2.12."""
    for w0, c_expected, tol in [(3.0, 0.67, 0.03), (6.0, 1.255, 0.02),
                                (9.0, 2.12, 0.04)]:
        prof = solve_king_profile(w0)
        c = np.log10(prof["r_t"])
        assert abs(c - c_expected) < tol, (w0, c)


def test_profile_boundary():
    prof = solve_king_profile(5.0)
    assert prof["W"][0] == pytest.approx(5.0, abs=1e-6)
    assert prof["W"][-1] == pytest.approx(0.0, abs=1e-6)
    assert np.all(np.diff(prof["M"]) >= 0)


def test_sample_statistics():
    n = 4096
    state = king(n, 6.0, seed=5)
    pos = np.asarray(state.pos)
    # Hénon scaling: KE = 1/4 exactly, PE = -1/2 exactly
    force = make_force_model(eps=0.0, backend="jnp")
    e = diagnostics.energies(state, force)
    assert float(e["KE"]) == pytest.approx(0.25, rel=1e-10)
    assert float(e["PE_pair"]) == pytest.approx(-0.5, rel=1e-3)  # f32 kernel
    # centre of mass removed
    np.testing.assert_allclose(np.asarray(state.com()), 0.0, atol=1e-12)
    # finite truncation: all radii inside the (scaled) tidal radius
    r = np.linalg.norm(pos, axis=1)
    assert r.max() < 10.0
    # sample half-mass vs profile half-mass (scale-invariant ratio)
    prof = solve_king_profile(6.0)
    m_half_r = np.interp(0.5 * prof["M"][-1], prof["M"], prof["r"])
    ratio_profile = m_half_r / prof["r_t"]
    ratio_sample = np.median(r) / r.max()
    assert abs(ratio_sample - ratio_profile) < 0.15 * ratio_profile


def test_determinism():
    s1 = king(256, 6.0, seed=9)
    s2 = king(256, 6.0, seed=9)
    np.testing.assert_array_equal(np.asarray(s1.pos), np.asarray(s2.pos))
    np.testing.assert_array_equal(np.asarray(s1.vel), np.asarray(s2.vel))


def test_physical_scaling():
    state = king(512, 4.0, seed=2, total_mass=2.0, G=3.0, r_scale=5.0)
    m = np.asarray(state.mass, np.float64)
    assert m.sum() == pytest.approx(2.0, rel=1e-6)
    # KE scales as G M^2 / r: KE = 0.25 * G * M^2 / r_scale
    ke = 0.5 * (m * (np.asarray(state.vel) ** 2).sum(1)).sum()
    assert ke == pytest.approx(0.25 * 3.0 * 4.0 / 5.0, rel=1e-6)
