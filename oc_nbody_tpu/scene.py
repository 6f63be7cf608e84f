"""Scene building: IC generation, unit wiring, orbit placement.

Capability parity: SURVEY.md §2.8 / §3.1 — the reference's scene/state API
(BASELINE.json:5): build a cluster IC, convert the analytic Milky Way
potential into code units, and place the cluster's centre of mass on a
galactic orbit (circular, BASELINE.json:8, or eccentric disk-crossing,
BASELINE.json:10) in an inertial galactocentric frame.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp

from oc_nbody_tpu.config import SimConfig
from oc_nbody_tpu.forces import ForceModel, make_force_model
from oc_nbody_tpu.models import imf as imf_mod
from oc_nbody_tpu.models import potentials as pot_mod
from oc_nbody_tpu.models.plummer import plummer
from oc_nbody_tpu.state import ParticleState
from oc_nbody_tpu.utils.units import UnitSystem


@dataclasses.dataclass
class Scene:
    units: UnitSystem
    state: ParticleState
    force: ForceModel
    config: SimConfig
    # the run's forward RNG stream (disjoint from the IC keys); the driver
    # persists it in every snapshot so future stochastic physics (e.g.
    # stellar mass loss) resumes bit-identically (SURVEY.md §4.4)
    rng_key: Optional[jax.Array] = None


def build_units(cfg: SimConfig) -> UnitSystem:
    u = cfg.units
    if u.kind == "henon":
        return UnitSystem.henon(mass_msun=u.mass_msun, length_pc=u.length_pc)
    if u.kind == "physical":
        return UnitSystem.physical()
    raise ValueError(f"unknown units kind {u.kind!r}")


def build_external_potential(cfg: SimConfig, us: UnitSystem) -> Optional[pot_mod.Potential]:
    p = cfg.potential
    if p.kind == "none":
        return None
    mass_scale = 1.0 / us.mass_msun      # code mass units per Msun
    length_scale = 1.0 / us.length_pc    # code length units per pc
    if p.kind == "milky_way":
        return pot_mod.milky_way(us.G, mass_scale, length_scale)
    if p.kind == "point_mass":
        return pot_mod.PointMass(
            GM=jnp.asarray(us.G * p.mass_msun * mass_scale),
            softening=jnp.asarray(p.softening_pc * length_scale),
        )
    if p.kind == "log_halo":
        return pot_mod.LogHalo(
            v0=jnp.asarray(us.to_code(p.v0_kms, "velocity")),
            rc=jnp.asarray(p.rc_pc * length_scale),
        )
    raise ValueError(f"unknown potential kind {p.kind!r}")


def _build_perturber(cfg: SimConfig, us: UnitSystem,
                     host: Optional[pot_mod.Potential]):
    """[potential.perturber] → a MovingCenter in code units (or None)."""
    p = cfg.potential.perturber
    if p.kind == "none":
        return None
    L = 1.0 / us.length_pc
    GM = jnp.asarray(us.G * p.mass_msun / us.mass_msun)
    scale = jnp.asarray(p.scale_pc * L)
    if p.kind == "plummer":
        base = pot_mod.PlummerSphere(GM=GM, b=scale)
    elif p.kind == "point_mass":
        base = pot_mod.PointMass(GM=GM, softening=scale)
    else:
        raise ValueError(f"unknown perturber kind {p.kind!r}")
    if p.trajectory == "linear":
        traj = pot_mod.LinearTrajectory(
            x0=jnp.asarray([c * L for c in p.x0_pc], jnp.float64),
            v0=jnp.asarray([us.to_code(c, "velocity") for c in p.v0_kms],
                           jnp.float64))
    elif p.trajectory == "circular":
        R = p.radius_pc * L
        if p.period_myr > 0:
            omega = 2.0 * math.pi / us.to_code(p.period_myr, "time")
        else:
            if host is None:
                raise ValueError(
                    "perturber.period_myr = 0 derives the circular rate "
                    "from the main potential's v_circ, but potential.kind "
                    "is 'none' — set period_myr explicitly")
            omega = float(host.vcirc(R)) / R
        traj = pot_mod.CircularTrajectory(
            radius=jnp.asarray(R), omega=jnp.asarray(omega),
            phase=jnp.asarray(math.radians(p.phase_deg)),
            z0=jnp.asarray(p.z0_pc * L))
    else:
        raise ValueError(f"unknown perturber trajectory {p.trajectory!r}")
    return pot_mod.MovingCenter(base=base, trajectory=traj)


def _build_gas(cfg: SimConfig, us: UnitSystem,
               host: Optional[pot_mod.Potential]):
    """[potential.gas] → an embedded natal-gas Plummer background,
    comoving with the cluster and (optionally) expelled.

    Centre: the cluster's own frame — at the origin when there is no
    orbit, riding a CircularTrajectory matching place_on_orbit's phase
    (start at (R0, 0, 0), prograde at v_circ) for a circular orbit.
    An eccentric orbit has no closed-form comoving trajectory: refused.
    Expulsion: the Dehnen C² ramp with REVERSED bounds (potentials.Ramped
    docstring) takes the amplitude 1 → 0 over [t_expel, t_expel+expel]."""
    g = cfg.potential.gas
    if g.kind == "none":
        return None
    if g.kind != "plummer":
        raise ValueError(f"unknown gas kind {g.kind!r}")
    if g.mass_msun <= 0:
        raise ValueError("potential.gas.mass_msun must be > 0")
    L = 1.0 / us.length_pc
    base = pot_mod.PlummerSphere(
        GM=jnp.asarray(us.G * g.mass_msun / us.mass_msun),
        b=jnp.asarray(g.scale_pc * L))
    orbit = cfg.orbit
    if orbit.kind == "circular":
        if host is None:
            raise ValueError("[potential.gas] on a circular orbit needs "
                             "the main potential for v_circ")
        R0 = orbit.R0_pc * L
        pot = pot_mod.MovingCenter(
            base=base, trajectory=pot_mod.CircularTrajectory(
                radius=jnp.asarray(R0),
                omega=jnp.asarray(float(host.vcirc(R0)) / R0)))
    elif orbit.kind == "none":
        pot = base
    else:
        raise ValueError(
            f"[potential.gas] supports orbit.kind none|circular (got "
            f"{orbit.kind!r}: no closed-form comoving trajectory)")
    if g.expel_myr > 0:
        t_start = us.to_code(g.t_expel_myr, "time")
        t_end = us.to_code(g.t_expel_myr + g.expel_myr, "time")
        pot = pot_mod.Ramped(base=pot, t0=jnp.asarray(t_end),
                             t1=jnp.asarray(t_start))  # reversed: decay
    return pot


def _build_bar(cfg: SimConfig, us: UnitSystem):
    """[potential.bar] → a Rotating (optionally Ramped) LongMuraliBar."""
    b = cfg.potential.bar
    if b.kind == "none":
        return None
    if b.kind != "long_murali":
        raise ValueError(f"unknown bar kind {b.kind!r}")
    L = 1.0 / us.length_pc
    bar = pot_mod.LongMuraliBar(
        GM=jnp.asarray(us.G * b.mass_msun / us.mass_msun),
        a=jnp.asarray(b.a_pc * L), b=jnp.asarray(b.b_pc * L),
        c=jnp.asarray(b.c_pc * L))
    # km/s/kpc → rad/Myr → rad/code-time
    from oc_nbody_tpu.utils.units import KMS_IN_PC_PER_MYR
    omega_myr = b.pattern_speed_kms_kpc * KMS_IN_PC_PER_MYR / 1000.0
    pot = pot_mod.Rotating(
        base=bar, omega_p=jnp.asarray(omega_myr * us.time_myr),
        phase=jnp.asarray(math.radians(b.angle0_deg)))
    if b.grow_myr > 0:
        pot = pot_mod.Ramped(base=pot, t0=jnp.asarray(0.0),
                             t1=jnp.asarray(us.to_code(b.grow_myr, "time")))
    return pot


def build_ic(cfg: SimConfig, us: UnitSystem) -> ParticleState:
    ic = cfg.ic
    key = jax.random.PRNGKey(ic.seed)
    k_ic, k_imf = jax.random.split(key)

    masses = None
    if ic.imf != "equal":
        sampler = {"kroupa": imf_mod.kroupa_imf, "salpeter": imf_mod.salpeter_imf}[ic.imf]
        masses = sampler(ic.n, k_imf, m_min=ic.m_min_msun, m_max=ic.m_max_msun)

    if ic.kind == "plummer":
        state = plummer(ic.n, k_ic, a=ic.a, total_mass=ic.total_mass,
                        G=us.G, masses=masses)
    elif ic.kind == "king":
        from oc_nbody_tpu.models.king import king
        state = king(ic.n, ic.w0, seed=ic.seed, total_mass=ic.total_mass,
                     G=us.G, masses=masses)
    elif ic.kind == "dehnen":
        from oc_nbody_tpu.models.eddington import dehnen
        state = dehnen(ic.n, gamma=ic.gamma, seed=ic.seed, r_max=ic.r_cut,
                       total_mass=ic.total_mass, G=us.G, masses=masses,
                       r_aniso=ic.r_aniso)
    elif ic.kind == "eff":
        from oc_nbody_tpu.models.eddington import eff
        state = eff(ic.n, gamma=ic.gamma, a=(ic.a or 1.0), seed=ic.seed,
                    r_max=ic.r_cut, total_mass=ic.total_mass, G=us.G,
                    masses=masses, r_aniso=ic.r_aniso)
    elif ic.kind == "file":
        from oc_nbody_tpu.io.snapshot import read_snapshot
        state = read_snapshot(ic.file).state
    else:
        raise ValueError(f"unknown IC kind {ic.kind!r}")

    if ic.vel_scale != 1.0:
        if ic.vel_scale <= 0:
            raise ValueError(f"ic.vel_scale must be > 0, got {ic.vel_scale}")
        state = state.replace(vel=state.vel * ic.vel_scale)

    if ic.segregation != 0.0:
        # before rotation/binaries: segregation permutes the IMF masses
        # over the sampled phase-space points (models/segregation.py)
        from oc_nbody_tpu.models.segregation import segregate
        state = segregate(state, ic.seed + 0x5345, ic.segregation, G=us.G)

    if ic.rotation != 0.0:
        # before add_binaries: rotation acts on the systems' centre-of-mass
        # velocities, not on the binaries' internal orbits
        from oc_nbody_tpu.models.rotation import add_rotation
        state = add_rotation(state, jax.random.fold_in(key, 0x524F54),
                             ic.rotation)

    if ic.binary_fraction > 0.0:
        if ic.binary_a_min is None or ic.binary_a_max is None:
            raise ValueError(
                "ic.binary_fraction > 0 requires ic.binary_a_min and "
                "ic.binary_a_max (semi-major-axis bounds, code units)")
        if ic.binary_a_min < 2.0 * cfg.integrator.eps:
            raise ValueError(
                f"ic.binary_a_min = {ic.binary_a_min} is below twice the "
                f"softening eps = {cfg.integrator.eps}: such pairs are "
                "softened away, not binaries — raise a_min or lower eps")
        from oc_nbody_tpu.models.binaries import add_binaries
        pop = add_binaries(
            state, jax.random.fold_in(key, 0x42494E),
            fraction=ic.binary_fraction,
            a_min=ic.binary_a_min, a_max=ic.binary_a_max,
            G=us.G, q_min=ic.binary_q_min, e_max=ic.binary_e_max)
        state = pop.state
    return state


def eccentric_orbit_ic(potential: pot_mod.Potential, r_apo, r_peri):
    """In-plane phase-space point at apocentre of an (r_apo, r_peri) orbit.

    Energy/angular-momentum match in the midplane:
      L^2 = 2 (Φ(r_a) − Φ(r_p)) / (1/r_p² − 1/r_a²)
    """
    r_apo = jnp.asarray(r_apo, jnp.float64)
    r_peri = jnp.asarray(r_peri, jnp.float64)
    phi_a = potential.phi_R(r_apo)
    phi_p = potential.phi_R(r_peri)
    L2 = 2.0 * (phi_a - phi_p) / (1.0 / r_peri**2 - 1.0 / r_apo**2)
    v_t = jnp.sqrt(L2) / r_apo
    return jnp.array([r_apo, 0.0, 0.0]), jnp.array([0.0, v_t, 0.0])


def _rot_x(vec, angle_rad: float):
    c, s = math.cos(angle_rad), math.sin(angle_rad)
    x, y, z = vec[..., 0], vec[..., 1], vec[..., 2]
    return jnp.stack([x, c * y - s * z, s * y + c * z], axis=-1)


def place_on_orbit(state: ParticleState, potential: Optional[pot_mod.Potential],
                   cfg: SimConfig, us: UnitSystem) -> ParticleState:
    orbit = cfg.orbit
    if orbit.kind == "none":
        return state
    if potential is None:
        raise ValueError("orbit placement requires an external potential")
    length_scale = 1.0 / us.length_pc
    if orbit.kind == "circular":
        R0 = orbit.R0_pc * length_scale
        pos0 = jnp.array([R0, 0.0, 0.0])
        vel0 = jnp.array([0.0, float(potential.vcirc(R0)), 0.0])
    elif orbit.kind == "eccentric":
        pos0, vel0 = eccentric_orbit_ic(
            potential, orbit.r_apo_pc * length_scale, orbit.r_peri_pc * length_scale
        )
    else:
        raise ValueError(f"unknown orbit kind {orbit.kind!r}")
    if orbit.inclination_deg:
        ang = math.radians(orbit.inclination_deg)
        pos0, vel0 = _rot_x(pos0, ang), _rot_x(vel0, ang)
    return state.shifted(dpos=pos0, dvel=vel0)


def _build_friction(cfg: SimConfig, us: UnitSystem,
                    host: Optional[pot_mod.Potential]):
    """[friction] → a ChandrasekharFriction over the STATIC host (TD
    additions — bars, flybys, gas — are excluded from the drag's field
    density by design; models/friction.py rationale)."""
    f = cfg.friction
    if f.kind in (None, "none"):
        return None
    if f.kind != "chandrasekhar":
        raise ValueError(f"unknown friction kind {f.kind!r}")
    if host is None:
        raise ValueError("[friction] needs an external potential (the "
                         "drag integrates over the host's field stars)")
    if f.ln_lambda <= 0:
        raise ValueError("[friction] requires ln_lambda > 0 (typical: "
                         "ln(M_enc/M_cl) ~ 5-10 for clusters)")
    from oc_nbody_tpu.models.friction import ChandrasekharFriction
    return ChandrasekharFriction(
        host=host, G=jnp.asarray(us.G, jnp.float64),
        ln_lambda=jnp.asarray(f.ln_lambda, jnp.float64),
        sigma=jnp.asarray(us.to_code(f.sigma_kms, "velocity")
                          if f.sigma_kms > 0 else 0.0, jnp.float64))


def build_scene(cfg: SimConfig) -> Scene:
    us = build_units(cfg)
    external = build_external_potential(cfg, us)
    state = build_ic(cfg, us)
    # orbit placement uses the HOST potential only: a perturber/bar is a
    # perturbation of the orbit, not part of its circular-speed balance
    state = place_on_orbit(state, external, cfg, us)
    friction = _build_friction(cfg, us, external)
    additions = [p for p in (_build_perturber(cfg, us, external),
                             _build_bar(cfg, us),
                             _build_gas(cfg, us, external)) if p is not None]
    if additions:
        comps = ([external] if external is not None else []) + additions
        external = comps[0] if len(comps) == 1 else pot_mod.composite(comps)
    # forward RNG stream for the run itself, disjoint from build_ic's keys
    # (which are split directly from PRNGKey(seed))
    rng_key = jax.random.fold_in(jax.random.PRNGKey(cfg.ic.seed), 0x52554E)
    if cfg.mesh.n_devices != 1:
        from oc_nbody_tpu.parallel import make_mesh, make_sharded_force
        n_dev = cfg.mesh.n_devices or len(jax.devices())
        if n_dev > 1:
            # precision tiers on the mesh: "extended" shards the hi/lo
            # planes through the same collectives (round-2 Missing #1
            # closed); make_sharded_force rejects df32 with the rationale.
            # [friction] composes (round-4): the rigid CoM drag is an O(1)
            # add on the global state outside shard_map.
            mode = cfg.mesh.mode if cfg.mesh.mode != "auto" else "allgather"
            force = make_sharded_force(
                eps=cfg.integrator.eps, G=us.G, external=external,
                mesh=make_mesh(n_dev), mode=mode, backend=cfg.backend,
                precision=cfg.integrator.precision, friction=friction,
            )
            return Scene(units=us, state=state, force=force, config=cfg,
                         rng_key=rng_key)
    force = make_force_model(
        eps=cfg.integrator.eps, G=us.G, external=external,
        backend=cfg.backend, precision=cfg.integrator.precision,
        friction=friction,
    )
    return Scene(units=us, state=state, force=force, config=cfg,
                 rng_key=rng_key)


def make_stepper(cfg: SimConfig, force: ForceModel):
    """Build the configured stepper; returns (stepper, kind)."""
    ic = cfg.integrator
    if ic.kind == "kdk":
        if ic.macro_batches > 0:
            # oversized-N path: host-stepped KDK over the batched chunked
            # kernels (one force eval = macro_batches dispatches); the
            # same checkpoint aux/kind, so snapshots interchange with the
            # in-jit stepper
            from oc_nbody_tpu.integrators.leapfrog import MacroKDK
            return MacroKDK(force=force, dt=ic.dt,
                            n_batches=ic.macro_batches), "kdk"
        from oc_nbody_tpu.integrators.leapfrog import LeapfrogKDK
        return LeapfrogKDK(force=force, dt=ic.dt), "kdk"
    if ic.kind == "yoshida4":
        # 4th-order Yoshida composition: dt⁴ energy scaling at 3 force
        # evals/step; same carry/aux contract as kdk but its OWN kind
        # string (substep structure differs, so cross-kind resume is
        # refused by the snapshot integrator-mismatch guard)
        if ic.macro_batches > 0:
            from oc_nbody_tpu.integrators.leapfrog import MacroYoshida4
            return MacroYoshida4(force=force, dt=ic.dt,
                                 n_batches=ic.macro_batches), "yoshida4"
        from oc_nbody_tpu.integrators.leapfrog import Yoshida4
        return Yoshida4(force=force, dt=ic.dt), "yoshida4"
    if ic.kind == "hermite":
        if ic.macro_batches > 0:
            if ic.pair_dt:
                raise ValueError(
                    "integrator.pair_dt has no macro (host-stepped) "
                    "Hermite form — the encounter min-sweep has no "
                    "oversized batched kernel; use the in-jit stepper "
                    "(macro_batches = 0) or block timesteps")
            # oversized-N path: host-stepped Hermite over the batched
            # chunked jerk kernels; same aux/kind as the in-jit stepper
            from oc_nbody_tpu.integrators.hermite import MacroHermite
            return MacroHermite(force=force, eta=ic.eta,
                                eta_init=ic.eta_init, dt_max=ic.dt_max,
                                quantize=ic.quantize, pec2=ic.pec2,
                                symmetrized=ic.symmetrized,
                                n_batches=ic.macro_batches), "hermite"
        from oc_nbody_tpu.integrators.hermite import Hermite4
        return Hermite4(force=force, eta=ic.eta, eta_init=ic.eta_init,
                        dt_max=ic.dt_max, quantize=ic.quantize,
                        pec2=ic.pec2, symmetrized=ic.symmetrized,
                        pair_dt=ic.pair_dt,
                        eta_pair=(ic.eta_pair or ic.eta),
                        pair_r_max=ic.pair_r_max), "hermite"
    if ic.kind == "block":
        from oc_nbody_tpu.integrators.block import BlockHermite
        return BlockHermite(force=force, eta=ic.eta, eta_init=ic.eta_init,
                            dt_max=ic.dt_max, n_levels=ic.n_levels,
                            pec2=ic.pec2, pair_dt=ic.pair_dt,
                            eta_pair=(ic.eta_pair or ic.eta),
                            pair_r_max=ic.pair_r_max), "block"
    raise ValueError(f"unknown integrator kind {ic.kind!r}")
