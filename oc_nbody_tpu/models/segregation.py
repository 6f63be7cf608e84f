"""Primordial mass segregation (ic.segregation).

Observed young clusters are often born segregated rather than relaxing
into it; the standard way to realize that in an IC (Baumgardt, De Marchi
& Kroupa 2008-style rank ordering) is to correlate the IMF masses with
binding energy: the most massive stars get the most-bound phase-space
points. ``strength`` in [0, 1] blends the energy rank with a random rank
(1 = fully segregated, 0 = no correlation — the unsegregated IC).

Masses are PERMUTED among the already-sampled phase-space points, so the
mass function, total mass, positions and velocities are all exactly
preserved. The mass-density profile steepens slightly relative to the
sampled equilibrium (heavier mass now sits deeper) — the same mild,
accepted disequilibrium as in published segregated-IC generators; for
strict equilibrium run a few t_dyn of settling or use strength ≲ 0.5.

Host-side at IC time (numpy), like the King/Eddington samplers.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from oc_nbody_tpu.state import ParticleState


def segregate(state: ParticleState, seed: int, strength: float,
              G: float = 1.0) -> ParticleState:
    """Rank-correlate masses with specific binding energy.

    strength: 0 returns the state unchanged; 1 = perfect rank ordering
    (heaviest mass on the most-bound star)."""
    if not 0.0 <= strength <= 1.0:
        raise ValueError(f"segregation strength must be in [0,1], "
                         f"got {strength}")
    if strength == 0.0:
        return state
    m = np.asarray(state.mass, np.float64)
    if m.max() / m.min() < 1.001:
        raise ValueError("ic.segregation needs a mass spectrum "
                         "(imf != 'equal') — equal masses cannot segregate")
    pos = np.asarray(state.pos, np.float64)
    vel = np.asarray(state.vel, np.float64)
    mw = m / m.sum()
    vbar = (vel * mw[:, None]).sum(0)
    # specific energies in the cluster's own (softening-free) well; the
    # ranking only needs ordering, so equal-weight phi is fine and keeps
    # the result independent of which star carries which mass
    phi = np.zeros(len(m))
    w = 1.0 / len(m)  # equal-weight unit-total-mass potential
    chunk = 1024
    for i0 in range(0, len(m), chunk):
        d = np.linalg.norm(pos[i0:i0 + chunk, None, :] - pos[None, :, :],
                           axis=-1)
        phi[i0:i0 + chunk] = -G * w * (1.0 / np.where(d > 0, d, np.inf)
                                       ).sum(axis=1)
    e = 0.5 * ((vel - vbar) ** 2).sum(1) + phi

    rng = np.random.default_rng(seed)
    n = len(m)
    e_rank = np.argsort(np.argsort(e))          # 0 = most bound
    mixed = strength * e_rank + (1.0 - strength) * rng.uniform(0, n, n)
    order = np.argsort(mixed)                   # most-bound-ish first
    new_m = np.empty(n)
    new_m[order] = np.sort(m)[::-1]             # heaviest first
    return state.replace(mass=jnp.asarray(new_m, state.mass.dtype))
