"""Initial mass function sampling (inverse-CDF, device-side jnp).

Capability parity: SURVEY.md §2.7 — the reference samples a Kroupa (2001)
IMF for its Hermite config (BASELINE.json:9 "Kroupa IMF mass spectrum").

The Kroupa (2001) broken power law dN/dm ∝ m^-alpha with
  alpha = 0.3 for m in [0.01, 0.08) Msun
  alpha = 1.3 for m in [0.08, 0.5) Msun
  alpha = 2.3 for m in [0.5, m_max] Msun
is sampled exactly by inverting the piecewise-analytic CDF — fully
vectorised, no rejection.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

KROUPA_BREAKS = (0.08, 0.5)
KROUPA_ALPHAS = (0.3, 1.3, 2.3)


def _segment_integrals(edges, alphas):
    """Integral of m^-alpha over each [edges[i], edges[i+1]] with continuity
    coefficients c_i such that the density is continuous at the breaks."""
    coeffs = [1.0]
    for i in range(1, len(alphas)):
        # continuity at edges[i]: c_{i-1} e^-a_{i-1} = c_i e^-a_i
        coeffs.append(coeffs[-1] * edges[i] ** (alphas[i] - alphas[i - 1]))
    integrals = []
    for i, a in enumerate(alphas):
        lo, hi = edges[i], edges[i + 1]
        p = 1.0 - a
        if p == 0.0:  # alpha == 1: the integral is logarithmic
            integrals.append(coeffs[i] * math.log(hi / lo))
        else:
            integrals.append(coeffs[i] * (hi**p - lo**p) / p)
    return jnp.asarray(coeffs), jnp.asarray(integrals)


def _broken_power_law(key, n, edges, alphas, dtype):
    edges_t = jnp.asarray(edges, dtype)
    coeffs, integrals = _segment_integrals(edges, alphas)
    cdf = jnp.concatenate([jnp.zeros((1,)), jnp.cumsum(integrals)])
    total = cdf[-1]
    u = jax.random.uniform(key, (n,), dtype) * total
    seg = jnp.clip(jnp.searchsorted(cdf, u, side="right") - 1, 0, len(alphas) - 1)
    alphas_t = jnp.asarray(alphas, dtype)
    a = alphas_t[seg]
    p = 1.0 - a
    lo = edges_t[seg]
    c = jnp.asarray(coeffs, dtype)[seg]
    # invert: u - cdf[seg] = c (m^p - lo^p)/p, or c log(m/lo) when p == 0
    # (alpha == 1); p is exact so the p == 0 select is exact too.
    frac = (u - cdf[seg]) / c
    p_safe = jnp.where(p == 0.0, 1.0, p)
    m_pow = (lo**p_safe + frac * p_safe) ** (1.0 / p_safe)
    m_log = lo * jnp.exp(frac)
    return jnp.where(p == 0.0, m_log, m_pow)


def kroupa_imf(
    n: int,
    key: jax.Array,
    m_min: float = 0.08,
    m_max: float = 100.0,
    dtype=jnp.float64,
) -> jax.Array:
    """Sample n stellar masses [Msun] from the Kroupa (2001) IMF.

    The standard open-cluster default range is [0.08, 100] Msun; pass
    m_min=0.01 to include brown dwarfs.
    """
    if not (0.0 < m_min < m_max):
        raise ValueError("need 0 < m_min < m_max")
    seg_bounds = [0.0, *KROUPA_BREAKS, float("inf")]
    edges, alphas = [m_min], []
    for i, alpha in enumerate(KROUPA_ALPHAS):
        lo = max(seg_bounds[i], m_min)
        hi = min(seg_bounds[i + 1], m_max)
        if lo < hi:
            alphas.append(alpha)
            edges.append(hi)
    return _broken_power_law(key, n, tuple(edges), tuple(alphas), dtype)


def salpeter_imf(
    n: int,
    key: jax.Array,
    m_min: float = 0.4,
    m_max: float = 10.0,
    alpha: float = 2.35,
    dtype=jnp.float64,
) -> jax.Array:
    """Single power-law (Salpeter 1955) IMF, for comparison runs."""
    return _broken_power_law(key, n, (m_min, m_max), (alpha,), dtype)
