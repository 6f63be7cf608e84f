"""Primordial binary populations for cluster initial conditions.

Capability extension beyond SURVEY.md §2.5-2.7 (the reference tree is empty
— SURVEY.md §0; its IC surface per BASELINE.json:7-9 is Plummer/King + IMF
singles): open clusters are born with large binary fractions, and a direct
N-body framework for them needs a primordial-binary layer over any single
-star IC. This module splits a chosen fraction of an existing IC's stars
into two-body pairs whose internal orbits are sampled from the standard
population-synthesis distributions:

  * semi-major axis a: log-uniform on [a_min, a_max] (Öpik's law),
  * eccentricity e: thermal, f(e) = 2e  =>  e = sqrt(u),
  * mass ratio q = m2/m1: uniform on [q_min, 1] (components share the
    parent star's mass: m1 + m2 = m_parent, so the cluster's total mass
    and the IMF's system-mass function are preserved),
  * orientation: Haar-uniform random rotation (unit quaternion),
  * orbital phase: mean anomaly uniform on [0, 2pi), mapped to eccentric
    anomaly with a fixed-iteration Newton solve of Kepler's equation
    (branch-free, jit-friendly).

Each pair is placed at its parent star's phase-space point (the pair's
centre of mass coincides with the removed single in both position and
velocity), so the cluster-scale structure of the parent IC is untouched:
total mass, momentum, and the mass distribution are preserved exactly;
only the small internal binary energy (-G m1 m2 / 2a per pair) is added.

Numerical honesty: the force kernels are softened. A binary with a ~< eps
is not resolved as a binary (its internal dynamics are suppressed by the
softening); choose a_min a few times eps, or run the extended/df32
precision tier with small eps for close-pair accuracy (docs/PERFORMANCE.md
precision-tier table). This module does not regularise few-body encounters
— softening is the regularisation, as in the reference class.

Everything is jax.random + jnp: deterministic per key, device-executable.
Host-level (IC time) like the other generators.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from oc_nbody_tpu.state import ParticleState


def solve_kepler(mean_anom, ecc, n_iter: int = 12):
    """Eccentric anomaly E with E - e sin E = M, elementwise.

    Fixed-count Newton iteration from the standard starter
    E0 = M + e sin M (adequate for e <= ~0.95; thermal sampling is
    truncated at e_max below). f64 in, f64 out; 12 iterations measured
    to machine precision over the full (M, e) grid in the unit tests.
    """
    m = jnp.asarray(mean_anom, jnp.float64)
    e = jnp.asarray(ecc, jnp.float64)
    ea = m + e * jnp.sin(m)

    def body(_, ea):
        f = ea - e * jnp.sin(ea) - m
        fp = 1.0 - e * jnp.cos(ea)
        return ea - f / fp

    return jax.lax.fori_loop(0, n_iter, body, ea)


def _random_rotations(key, n):
    """(n, 3, 3) Haar-uniform rotation matrices via unit quaternions."""
    u1, u2, u3 = jax.random.uniform(key, (3, n), jnp.float64)
    s1, s2 = jnp.sqrt(1.0 - u1), jnp.sqrt(u1)
    w = s1 * jnp.sin(2 * jnp.pi * u2)
    x = s1 * jnp.cos(2 * jnp.pi * u2)
    y = s2 * jnp.sin(2 * jnp.pi * u3)
    z = s2 * jnp.cos(2 * jnp.pi * u3)
    r = jnp.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
    ], axis=-1).reshape(n, 3, 3)
    return r


def kepler_orbit_phase(a, e, mean_anom, gm_tot):
    """Relative position/velocity on a Kepler ellipse in the perifocal frame.

    Returns (r_rel, v_rel), each (..., 3): the separation vector and
    relative velocity of body 1 w.r.t. body 2 for total gravitational
    parameter ``gm_tot`` = G (m1 + m2), at the orbital phase given by the
    mean anomaly. Perifocal: x toward pericentre, z along the orbital
    angular momentum.
    """
    a = jnp.asarray(a, jnp.float64)
    e = jnp.asarray(e, jnp.float64)
    ea = solve_kepler(mean_anom, e)
    cose, sine = jnp.cos(ea), jnp.sin(ea)
    b_over_a = jnp.sqrt(jnp.maximum(1.0 - e * e, 0.0))
    x = a * (cose - e)
    y = a * b_over_a * sine
    # dE/dt = n / (1 - e cos E), n = sqrt(gm / a^3)
    n_mot = jnp.sqrt(gm_tot / a ** 3)
    edot = n_mot / (1.0 - e * cose)
    vx = -a * sine * edot
    vy = a * b_over_a * cose * edot
    zeros = jnp.zeros_like(x)
    r_rel = jnp.stack([x, y, zeros], axis=-1)
    v_rel = jnp.stack([vx, vy, zeros], axis=-1)
    return r_rel, v_rel


def orbital_elements(r_rel, v_rel, gm_tot):
    """(a, e) from relative separation/velocity — inverts kepler_orbit_phase.

    Standard two-body relations: a from the vis-viva energy
    eps = v^2/2 - gm/r = -gm/(2a); e from |h| with
    e^2 = 1 + 2 eps h^2 / gm^2. Unbound pairs (eps >= 0) return a < 0.
    Used by the tests and by analysis/binaries.py's census.
    """
    r_rel = jnp.asarray(r_rel, jnp.float64)
    v_rel = jnp.asarray(v_rel, jnp.float64)
    r = jnp.linalg.norm(r_rel, axis=-1)
    v2 = jnp.sum(v_rel * v_rel, axis=-1)
    eps_orb = 0.5 * v2 - gm_tot / r
    a = -gm_tot / (2.0 * eps_orb)
    h = jnp.cross(r_rel, v_rel)
    h2 = jnp.sum(h * h, axis=-1)
    e2 = 1.0 + 2.0 * eps_orb * h2 / gm_tot ** 2
    e = jnp.sqrt(jnp.maximum(e2, 0.0))
    return a, e


@dataclasses.dataclass(frozen=True)
class BinaryPopulation:
    """Result of add_binaries: the new state plus the pair bookkeeping.

    ``primary_idx``/``secondary_idx`` index into ``state``; component 1
    occupies the parent star's original slot (and keeps its id), component
    2 is appended at the end with a fresh id. ``a``, ``e`` are the sampled
    elements in code units.
    """

    state: ParticleState
    primary_idx: jax.Array    # (n_b,) int32
    secondary_idx: jax.Array  # (n_b,) int32
    a: jax.Array              # (n_b,) f64
    e: jax.Array              # (n_b,) f64


def add_binaries(state: ParticleState, key, fraction: float,
                 a_min: float, a_max: float, *, G: float = 1.0,
                 q_min: float = 0.1, e_max: float = 0.95,
                 ) -> BinaryPopulation:
    """Split ``round(fraction * N)`` stars of ``state`` into binary pairs.

    ``fraction`` is the binary fraction by SYSTEM count: n_b binaries among
    N systems total, so the returned state has N + n_b particles. The
    parent stars are chosen uniformly without replacement; each parent of
    mass m becomes components m/(1+q) and m q/(1+q) at its phase-space
    point, with the internal orbit sampled as in the module docstring
    (a log-uniform on [a_min, a_max] code units, e thermal truncated at
    ``e_max``, mean anomaly uniform).

    Shapes are static given (N, fraction): safe to call before jit regions.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"binary fraction must be in [0, 1], got {fraction}")
    if not 0.0 < a_min <= a_max:
        raise ValueError(f"need 0 < a_min <= a_max, got ({a_min}, {a_max})")
    if not 0.0 < q_min <= 1.0:
        raise ValueError(f"q_min must be in (0, 1], got {q_min}")
    n = state.n
    n_b = int(round(fraction * n))
    if n_b == 0:
        return BinaryPopulation(
            state=state,
            primary_idx=jnp.zeros((0,), jnp.int32),
            secondary_idx=jnp.zeros((0,), jnp.int32),
            a=jnp.zeros((0,), jnp.float64),
            e=jnp.zeros((0,), jnp.float64),
        )

    k_sel, k_a, k_e, k_q, k_m, k_rot = jax.random.split(key, 6)
    sel = jax.random.permutation(k_sel, n)[:n_b].astype(jnp.int32)

    # elements
    log_a = jax.random.uniform(k_a, (n_b,), jnp.float64,
                               jnp.log(a_min), jnp.log(a_max))
    a = jnp.exp(log_a)
    e = e_max * jnp.sqrt(jax.random.uniform(k_e, (n_b,), jnp.float64))
    q = jax.random.uniform(k_q, (n_b,), jnp.float64, q_min, 1.0)
    mean_anom = jax.random.uniform(k_m, (n_b,), jnp.float64,
                                   0.0, 2.0 * jnp.pi)

    # Component masses are rounded to the state's mass dtype (f32) FIRST,
    # and the orbit weights below use the rounded values: the pair's
    # centre of mass as recomputed from the stored state is then exact to
    # f64 rounding, not to f32 mass rounding (~1e-8 rel otherwise).
    m_parent = state.mass[sel].astype(jnp.float64)
    m1 = (m_parent / (1.0 + q)).astype(state.mass.dtype)
    m2 = (m_parent - m1.astype(jnp.float64)).astype(state.mass.dtype)
    m1 = m1.astype(jnp.float64)
    m2 = m2.astype(jnp.float64)
    m_pair = m1 + m2
    gm_tot = jnp.asarray(G, jnp.float64) * m_pair

    r_rel, v_rel = kepler_orbit_phase(a, e, mean_anom, gm_tot)
    rot = _random_rotations(k_rot, n_b)
    r_rel = jnp.einsum("nij,nj->ni", rot, r_rel)
    v_rel = jnp.einsum("nij,nj->ni", rot, v_rel)

    com_pos = state.pos[sel]
    com_vel = state.vel[sel]
    w1 = (m2 / m_pair)[:, None]  # component 1 offset weight
    w2 = (m1 / m_pair)[:, None]
    pos1 = com_pos + w1 * r_rel
    vel1 = com_vel + w1 * v_rel
    pos2 = com_pos - w2 * r_rel
    vel2 = com_vel - w2 * v_rel

    pos = jnp.concatenate(
        [state.pos.at[sel].set(pos1.astype(state.pos.dtype)),
         pos2.astype(state.pos.dtype)])
    vel = jnp.concatenate(
        [state.vel.at[sel].set(vel1.astype(state.vel.dtype)),
         vel2.astype(state.vel.dtype)])
    mass = jnp.concatenate(
        [state.mass.at[sel].set(m1.astype(state.mass.dtype)),
         m2.astype(state.mass.dtype)])
    next_id = jnp.max(state.ids) + 1
    new_ids = (next_id + jnp.arange(n_b, dtype=state.ids.dtype))
    ids = jnp.concatenate([state.ids, new_ids])

    new_state = ParticleState(pos=pos, vel=vel, mass=mass, ids=ids,
                              time=state.time)
    return BinaryPopulation(
        state=new_state,
        primary_idx=sel,
        secondary_idx=(n + jnp.arange(n_b)).astype(jnp.int32),
        a=a,
        e=e,
    )
