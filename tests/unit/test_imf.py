"""Kroupa IMF sampling vs the analytic CDF (SURVEY.md §4.1)."""
import jax
import numpy as np
import pytest

from oc_nbody_tpu.models.imf import kroupa_imf, salpeter_imf


def _analytic_fraction(m_lo, m_hi, m_min, m_max):
    """Number fraction in [m_lo, m_hi] for Kroupa in [m_min, m_max]."""
    import scipy.integrate as si

    def pdf(m):
        if m < 0.08:
            return (m / 0.08) ** -0.3
        if m < 0.5:
            return (m / 0.08) ** -1.3
        return (0.5 / 0.08) ** -1.3 * (m / 0.5) ** -2.3

    total, _ = si.quad(pdf, m_min, m_max, limit=200)
    part, _ = si.quad(pdf, m_lo, m_hi, limit=200)
    return part / total


def test_kroupa_range_and_fractions():
    n = 40000
    m = np.asarray(kroupa_imf(n, jax.random.PRNGKey(2), m_min=0.01, m_max=100.0))
    assert m.min() >= 0.01 and m.max() <= 100.0
    for lo, hi in [(0.01, 0.08), (0.08, 0.5), (0.5, 100.0)]:
        frac = np.mean((m >= lo) & (m < hi))
        expected = _analytic_fraction(lo, hi, 0.01, 100.0)
        assert frac == pytest.approx(expected, abs=0.01), (lo, hi, frac, expected)


def test_kroupa_default_range():
    m = np.asarray(kroupa_imf(10000, jax.random.PRNGKey(3)))
    assert m.min() >= 0.08 and m.max() <= 100.0
    # mean mass of a Kroupa population over [0.08, 100] is ~0.55-0.65 Msun
    assert 0.45 < m.mean() < 0.75, m.mean()


def test_salpeter_slope():
    m = np.asarray(salpeter_imf(50000, jax.random.PRNGKey(4), m_min=1.0, m_max=10.0))
    # empirical CDF exponent: P(>m) ∝ m^{1-2.35}
    frac_gt2 = np.mean(m > 2.0)
    expected = (2.0 ** -1.35 - 10.0 ** -1.35) / (1.0 - 10.0 ** -1.35)
    assert frac_gt2 == pytest.approx(expected, abs=0.01)
