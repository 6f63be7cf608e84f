"""On-device diagnostics: energies, angular momentum, Lagrangian radii,
density centre, bound mass (energy cut and iterative tidal-radius cut).

Capability parity: SURVEY.md §2.11 — BASELINE.json:5 "on-device diagnostics
(energy, angular momentum, Lagrangian radii, bound-mass via iterative
tidal-radius cut)". Everything here is a pure jnp function (jit-safe,
fixed shapes, fori/while loops only); accumulations are float64.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from oc_nbody_tpu.forces import ForceModel
from oc_nbody_tpu.state import ParticleState


def kinetic_energy(state: ParticleState) -> jax.Array:
    m = state.mass.astype(jnp.float64)
    v2 = jnp.sum(state.vel.astype(jnp.float64) ** 2, axis=1)
    return 0.5 * jnp.sum(m * v2)


def energies(state: ParticleState, force: ForceModel,
             f64_pairwise: bool = False, precomputed_phi=None) -> dict:
    """KE, pairwise PE, external potential energy, total. All f64 scalars.

    ``E_int`` is the cluster-internal energy — KE in the mass-weighted COM
    velocity frame plus the pairwise PE. On orbit runs E_tot is dominated by
    the galactic well (|E_ext| >> |E_int|), so |dE/E_tot| flatters the drift
    by orders of magnitude; the spec's per-crossing target is about the
    CLUSTER, so the driver also reports dE normalised by |E_int(t=0)|
    (VERDICT round-1 item 4 / W6).

    Time-dependent externals are bound at state.time — the energy row is
    the instantaneous E(t) (not conserved when the field varies; see
    jacobi_energy for the rotating-pattern conserved quantity).
    """
    force = force.at_time(state.time)  # no-op for static externals
    m = state.mass.astype(jnp.float64)
    if precomputed_phi is not None:
        # oversized-eval path (MacroKDK): the O(N²) potential was computed
        # outside this jit by the batched chunked kernels — the one part
        # of the row a single XLA program cannot hold at N ≳ 4M
        phi_pair, phi_ext = precomputed_phi
    elif f64_pairwise:
        # diagnostic-grade pairwise potential: full (emulated) f64 pair
        # terms via the jnp oracle path. ~15x the f32 kernel cost — opt-in
        # (output.diag_f64) for acceptance runs where the f32 potential's
        # ~2e-7 noise floor would contaminate the dE_over_E_int series.
        from oc_nbody_tpu.ops import gravity
        _, phi_pair = gravity.accel_potential(
            state.pos, state.mass, force.eps, force.G,
            compute_dtype=jnp.float64, chunk=512)
        phi_ext = (force.external.phi(state.pos) if force.external is not None
                   else jnp.zeros_like(phi_pair))
    else:
        _, phi_pair, phi_ext = force.accel_potential(state.pos, state.mass)
    ke = kinetic_energy(state)
    pe_pair = 0.5 * jnp.sum(m * phi_pair.astype(jnp.float64))
    e_ext = jnp.sum(m * phi_ext.astype(jnp.float64))
    vel = state.vel.astype(jnp.float64)
    vbar = jnp.sum(vel * m[:, None], axis=0) / jnp.sum(m)
    ke_int = 0.5 * jnp.sum(m * jnp.sum((vel - vbar) ** 2, axis=1))
    return {
        "KE": ke,
        "PE_pair": pe_pair,
        "E_ext": e_ext,
        "E_tot": ke + pe_pair + e_ext,
        "E_int": ke_int + pe_pair,
    }


def angular_momentum(state: ParticleState, center=None, center_vel=None) -> jax.Array:
    """Total L = sum m (r - c) x (v - vc), (3,) float64."""
    pos = state.pos.astype(jnp.float64)
    vel = state.vel.astype(jnp.float64)
    if center is not None:
        pos = pos - center
    if center_vel is not None:
        vel = vel - center_vel
    m = state.mass.astype(jnp.float64)
    return jnp.sum(m[:, None] * jnp.cross(pos, vel), axis=0)


def density_center(state: ParticleState, n_iter: int = 24,
                   shrink: float = 0.9, min_frac: float = 0.05) -> jax.Array:
    """Shrinking-sphere density centre (Casertano–Hut-style), branch-free.

    Iteratively recentres on the mass inside a shrinking sphere; stops
    shrinking (keeps the last good centre) once the enclosed mass fraction
    drops below ``min_frac``.
    """
    pos = state.pos.astype(jnp.float64)
    m = state.mass.astype(jnp.float64)
    m_tot = jnp.sum(m)

    c0 = jnp.sum(pos * m[:, None], axis=0) / m_tot
    r0 = jnp.max(jnp.linalg.norm(pos - c0, axis=1))

    def body(_, carry):
        c, r = carry
        d = jnp.linalg.norm(pos - c, axis=1)
        w = m * (d < r)
        wsum = jnp.sum(w)
        ok = wsum > min_frac * m_tot
        c_new = jnp.where(
            ok, jnp.sum(pos * w[:, None], axis=0) / jnp.maximum(wsum, 1e-300), c
        )
        r_new = jnp.where(ok, r * shrink, r)
        return (c_new, r_new)

    c, _ = jax.lax.fori_loop(0, n_iter, body, (c0, r0))
    return c


def lagrangian_radii(state: ParticleState, fractions=(0.1, 0.25, 0.5, 0.75, 0.9),
                     center=None, mask=None) -> jax.Array:
    """Radii enclosing the given mass fractions, about ``center``
    (default: density centre). ``mask`` restricts to a subset (e.g. bound
    stars) without changing shapes."""
    if center is None:
        center = density_center(state)
    pos = state.pos.astype(jnp.float64)
    m = state.mass.astype(jnp.float64)
    if mask is not None:
        m = m * mask
    r = jnp.linalg.norm(pos - center, axis=1)
    order = jnp.argsort(r)
    r_sorted = r[order]
    csum = jnp.cumsum(m[order])
    targets = jnp.asarray(fractions, jnp.float64) * csum[-1]
    idx = jnp.clip(jnp.searchsorted(csum, targets), 0, r.shape[0] - 1)
    # a fully-disrupted selection (mask sums to zero mass) has no
    # meaningful radii: searchsorted(0) would return the innermost
    # particle's radius for every fraction — a tiny, plausible-looking
    # garbage value. NaN signals "no cluster" honestly.
    return jnp.where(csum[-1] > 0, r_sorted[idx], jnp.nan)


def bound_mass_energy(state: ParticleState, force: ForceModel,
                      n_iter: int = 8, phi_pair=None):
    """Bound mass via iterated energy cut in the cluster frame.

    A star is bound if 0.5 |v - v_b|^2 + phi_pair(x) < 0, where v_b is the
    mean velocity of currently-bound stars; iterate to a fixpoint (shapes
    fixed, mask-based). Returns (M_bound, N_bound, mask).
    """
    force = force.at_time(state.time)  # no-op for static externals
    m = state.mass.astype(jnp.float64)
    if phi_pair is None:
        _, phi_pair, _ = force.accel_potential(state.pos, state.mass)
    phi_pair = phi_pair.astype(jnp.float64)
    vel = state.vel.astype(jnp.float64)

    def body(_, mask):
        w = m * mask
        vb = jnp.sum(vel * w[:, None], axis=0) / jnp.maximum(jnp.sum(w), 1e-300)
        ke = 0.5 * jnp.sum((vel - vb) ** 2, axis=1)
        return (ke + phi_pair < 0).astype(jnp.float64)

    mask = jax.lax.fori_loop(0, n_iter, body, jnp.ones_like(m))
    return jnp.sum(m * mask), jnp.sum(mask).astype(jnp.int64), mask


def tidal_radius(m_bound, tidal_coeff, G):
    """King tidal radius r_t = (G M_b / (Ω² − ∂²Φ/∂R²))^{1/3}.

    A non-positive coefficient (cored host potential interiors, where the
    tidal tensor's largest eigenvalue can be more negative than Ω² is
    positive) means NO tidal truncation: r_t = inf, not the ~1e100 of a
    tiny-denominator clamp."""
    lam = jnp.maximum(tidal_coeff, 1e-300)
    r = (G * m_bound / lam) ** (1.0 / 3.0)
    return jnp.where(tidal_coeff > 0, r, jnp.inf)


def bound_mass_tidal(state: ParticleState, force: ForceModel,
                     n_iter: int = 20, center=None, center_vel=None,
                     method: str = "tensor"):
    """Bound mass via the iterative tidal-radius cut (SURVEY.md §2.11).

    Iterates  r_t = (G M_b / λ)^{1/3},  M_b = mass inside r_t  to a
    fixpoint. The tidal coefficient λ comes from one of two methods:

      * ``"tensor"`` (default): λ = λ_max(T) + Ω² with T the full autodiff
        tidal tensor −∂²Φ/∂x∂x at the cluster centre and Ω² = |r×v|²/r⁴
        the instantaneous orbital angular speed (from ``center_vel``, by
        default the mass-weighted mean velocity). Correct for inclined /
        disk-crossing orbits where the vertical tide dominates at crossing
        (VERDICT round-1 W3).
      * ``"midplane"``: the classic in-plane coefficient Ω² − ∂²Φ/∂R²
        evaluated at the centre's cylindrical radius — valid only for
        orbits in the z = 0 plane (kept for comparison/back-compat).

    Returns (M_bound, N_bound, r_t, mask).
    """
    force = force.at_time(state.time)  # no-op for static externals
    if force.external is None:
        m_tot = jnp.sum(state.mass.astype(jnp.float64))
        n = state.mass.shape[0]
        return (m_tot, jnp.asarray(n, jnp.int64), jnp.asarray(jnp.inf),
                jnp.ones((n,), jnp.float64))
    if center is None:
        center = density_center(state)
    pos = state.pos.astype(jnp.float64)
    m = state.mass.astype(jnp.float64)
    d = jnp.linalg.norm(pos - center, axis=1)
    if method == "tensor":
        if center_vel is None:
            vel = state.vel.astype(jnp.float64)
            center_vel = jnp.sum(vel * m[:, None], axis=0) / jnp.sum(m)
        r2 = jnp.sum(center**2)
        omega2 = jnp.sum(jnp.cross(center, center_vel) ** 2) / jnp.maximum(
            r2 * r2, 1e-300)
        lam = force.external.tidal_coefficient_at(center, omega2)
    elif method == "midplane":
        R_gal = jnp.sqrt(center[0] ** 2 + center[1] ** 2)
        lam = force.external.tidal_coefficient(R_gal)
    else:
        raise ValueError(f"unknown tidal method {method!r}")
    m_tot = jnp.sum(m)

    def body(_, m_b):
        r_t = tidal_radius(m_b, lam, force.G)
        return jnp.sum(m * (d < r_t))

    m_b = jax.lax.fori_loop(0, n_iter, body, m_tot)
    r_t = tidal_radius(m_b, lam, force.G)
    mask = (d < r_t).astype(jnp.float64)
    return m_b, jnp.sum(mask).astype(jnp.int64), r_t, mask


def compute_all(state: ParticleState, force: ForceModel,
                fractions=(0.1, 0.25, 0.5, 0.75, 0.9),
                f64_pairwise: bool = False, precomputed_phi=None) -> dict:
    """The full diagnostics row (SURVEY.md §5 metrics list); all scalars
    except lagrangian radii. One jit-able call — except at oversized N,
    where the caller precomputes (phi_pair, phi_ext) with the batched
    chunked kernels outside the jit and passes them via
    ``precomputed_phi`` (every other column is O(N) or O(N·iters))."""
    force = force.at_time(state.time)  # no-op for static externals
    if precomputed_phi is None:
        # ONE pairwise-potential pass per row, shared by energies() and
        # (isolated clusters) the bound-mass energy cut — a second O(N²)
        # evaluation is never CSE-guaranteed, and under diag_f64 the cut
        # would otherwise use f32 phi while the energies report f64
        if f64_pairwise:
            from oc_nbody_tpu.ops import gravity
            _, phi_pair = gravity.accel_potential(
                state.pos, state.mass, force.eps, force.G,
                compute_dtype=jnp.float64, chunk=512)
            phi_ext = (force.external.phi(state.pos)
                       if force.external is not None
                       else jnp.zeros_like(phi_pair))
        else:
            _, phi_pair, phi_ext = force.accel_potential(state.pos,
                                                         state.mass)
        precomputed_phi = (phi_pair, phi_ext)
    e = energies(state, force, precomputed_phi=precomputed_phi)
    center = density_center(state)
    L = angular_momentum(state)
    if force.external is not None:
        m_b, n_b, r_t, mask = bound_mass_tidal(state, force, center=center,
                                               method="tensor")
    else:
        m_b, n_b, mask = bound_mass_energy(state, force,
                                           phi_pair=precomputed_phi[0])
        r_t = jnp.asarray(jnp.inf)
    rl = lagrangian_radii(state, fractions, center=center, mask=mask)
    out = dict(e)
    out.update({
        "time": state.time,
        "Lx": L[0], "Ly": L[1], "Lz": L[2],
        "L_norm": jnp.linalg.norm(L),
        "M_bound": m_b,
        "N_bound": n_b,
        "r_tidal": r_t,
        "cx": center[0], "cy": center[1], "cz": center[2],
    })
    for f, r in zip(fractions, rl):
        out[f"r_lagr_{int(round(f * 100))}"] = r
    return out


def jacobi_energy(state: ParticleState, force: ForceModel, omega_p,
                  f64_pairwise: bool = False) -> jax.Array:
    """E_J = E_tot − ω_p·L_z, the Jacobi integral (f64 scalar).

    The conserved quantity for a field rigidly rotating about z at
    pattern speed ``omega_p`` (models/potentials.py Rotating — bars,
    spiral patterns, a perturber on a CircularTrajectory with
    omega = omega_p): in such a field E_tot and L_z each drift
    secularly but E − ω_p L_z does not. This is the rotating-frame
    energy check to use instead of dE/E when the external field has a
    pattern speed."""
    e = energies(state, force, f64_pairwise=f64_pairwise)
    L = angular_momentum(state)
    return e["E_tot"] - jnp.asarray(omega_p, jnp.float64) * L[2]
