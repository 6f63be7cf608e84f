"""Analytic external (Milky Way) potentials, evaluated on device.

Capability parity: SURVEY.md §2.4 — the reference evaluates an analytic
Milky Way tidal potential (BASELINE.json:5, :8). Components: Hernquist
bulge + Miyamoto–Nagai disk + NFW halo, composable; defaults follow the
widely used Bovy/gala-style three-component Milky Way model.

Design: each potential is a frozen dataclass registered as a pytree, so a
`CompositePotential` flows through jit/shard_map as parameters, not Python
state. Φ is hand-written; accelerations are hand-written closed forms
(O(N), not hot, but cheap); radial derivatives for tidal diagnostics come
from autodiff of Φ — exact, no finite differencing (SURVEY.md §2.11).

All quantities are in *code units*: pass G explicitly at construction time
(the scene builder converts physical parameters with a UnitSystem).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp


def _r(xyz):
    return jnp.sqrt(jnp.sum(xyz * xyz, axis=-1))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Potential:
    """Base class. Subclasses implement phi(xyz) and accel(xyz).

    xyz has shape (..., 3); phi returns (...,); accel returns (..., 3).
    """

    def phi(self, xyz):
        raise NotImplementedError

    def accel(self, xyz):
        raise NotImplementedError

    # ---- generic derived quantities (autodiff of phi) -----------------
    def phi_R(self, R):
        """Φ in the z=0 midplane as a function of cylindrical radius."""
        R = jnp.asarray(R)
        xyz = jnp.stack([R, jnp.zeros_like(R), jnp.zeros_like(R)], axis=-1)
        return self.phi(xyz)

    def dphi_dR(self, R):
        g = jax.grad(lambda r: jnp.sum(self.phi_R(r)))
        return g(jnp.asarray(R, jnp.result_type(float)))

    def d2phi_dR2(self, R):
        R = jnp.asarray(R, jnp.result_type(float))
        g = jax.grad(lambda r: jnp.sum(self.dphi_dR(r)))
        return g(R)

    def vcirc(self, R):
        """Circular speed at midplane radius R: v_c^2 = R dΦ/dR."""
        R = jnp.asarray(R, jnp.result_type(float))
        return jnp.sqrt(jnp.maximum(R * self.dphi_dR(R), 0.0))

    def omega2(self, R):
        """Squared circular angular frequency Ω² = v_c²/R²."""
        R = jnp.asarray(R, jnp.result_type(float))
        return self.dphi_dR(R) / R

    def tidal_coefficient(self, R):
        """Ω² − d²Φ/dR², the denominator of the King tidal radius
        r_t = (G M_cl / (Ω² − ∂²Φ/∂R²) ... )^{1/3} — SURVEY.md §2.11.

        Midplane approximation: valid for orbits in the z = 0 plane. For
        inclined/disk-crossing orbits use ``tidal_coefficient_at`` (full
        tidal tensor; VERDICT round-1 W3)."""
        return self.omega2(R) - self.d2phi_dR2(R)

    def tidal_tensor(self, xyz):
        """T_ij = −∂²Φ/∂x_i∂x_j at a single point; (3, 3), symmetric.

        Exact autodiff Hessian — no finite differencing. The largest
        eigenvalue is the maximal tidal stretching rate²; for a point-mass
        host it is 2GM/r³ along the radial direction."""
        xyz = jnp.asarray(xyz, jnp.result_type(float))
        return -jax.hessian(lambda p: self.phi(p))(xyz)

    def tidal_coefficient_at(self, xyz, omega2):
        """λ_max(T) + Ω²: the tidal-radius denominator at an arbitrary
        position (full tensor, not the midplane radial slice).

        ``omega2`` is the squared instantaneous angular speed of the
        cluster's orbit about the host, |r × v|²/r⁴. On a circular midplane
        orbit this reduces exactly to ``tidal_coefficient(R)``: for a
        spherical host λ_max = 2GM/r³ = −∂²Φ/∂R², giving the classic Jacobi
        coefficient 3GM/r³."""
        lam_max = jnp.linalg.eigvalsh(self.tidal_tensor(xyz))[-1]
        return lam_max + omega2

    def laplacian(self, xyz):
        """∇²Φ at a single point (exact autodiff Hessian trace). By the
        Poisson equation this is 4πG·ρ — the generic way to read the
        source density off ANY potential (composites included) without a
        per-component formula."""
        return jnp.trace(-self.tidal_tensor(xyz))

    def density(self, xyz, G):
        """Source mass density ρ = ∇²Φ/(4πG) at a single point. Negative
        values are possible for non-physical composites (e.g. a rigid bar
        substituted into a smooth disk) — callers clamp if needed."""
        return self.laplacian(xyz) / (4.0 * jnp.pi * G)

    # ---- time binding (time-dependent fields) --------------------------
    def at(self, t):
        """Bind an evaluation time. Time-independent potentials return
        ``self`` unchanged; :class:`TimeDependentPotential` subclasses
        return a :class:`Bound` wrapper whose phi/accel evaluate at ``t``.
        Integrators call this once per force evaluation with the physical
        time of that evaluation, so the SAME stepper code drives static
        and time-dependent external fields."""
        return self

    def accel_jerk_ext(self, pos, vel):
        """(a_ext, da_ext/dt) along a trajectory: the exact convective
        derivative (v·∇)a via one jvp — plus ∂a/∂t when a time is bound
        (see :meth:`Bound.accel_jerk_ext`). The external-jerk entry point
        for Hermite/block steppers."""
        return jax.jvp(self.accel, (pos,), (vel,))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NullPotential(Potential):
    """No external field (isolated cluster)."""

    def phi(self, xyz):
        return jnp.zeros(xyz.shape[:-1], xyz.dtype)

    def accel(self, xyz):
        return jnp.zeros_like(xyz)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PointMass(Potential):
    GM: jax.Array
    softening: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(0.0))

    def phi(self, xyz):
        r2 = jnp.sum(xyz * xyz, axis=-1) + self.softening**2
        return -self.GM / jnp.sqrt(r2)

    def accel(self, xyz):
        r2 = jnp.sum(xyz * xyz, axis=-1) + self.softening**2
        return -self.GM * xyz / jnp.sqrt(r2)[..., None] ** 3


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LogHalo(Potential):
    """Spherical logarithmic halo: Φ = ½ v0² ln(r² + rc²).

    The standard flat-rotation-curve host (v_c → v0 for r >> rc) — the
    usual minimal model for tidal-field studies when the full composite
    Milky Way is overkill. Config surface: potential.kind = "log_halo"
    with v0_kms and rc_pc."""

    v0: jax.Array    # asymptotic circular speed (code units)
    rc: jax.Array    # core radius (code units)

    def phi(self, xyz):
        r2 = jnp.sum(xyz * xyz, axis=-1)
        return 0.5 * self.v0**2 * jnp.log(r2 + self.rc**2)

    def accel(self, xyz):
        r2 = jnp.sum(xyz * xyz, axis=-1)
        return -(self.v0**2 / (r2 + self.rc**2))[..., None] * xyz


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Hernquist(Potential):
    """Hernquist (1990) sphere: Φ = −GM/(r+a)."""

    GM: jax.Array
    a: jax.Array

    def phi(self, xyz):
        return -self.GM / (_r(xyz) + self.a)

    def accel(self, xyz):
        r = _r(xyz)
        safe_r = jnp.maximum(r, jnp.finfo(xyz.dtype).tiny)
        mag = jnp.where(r > 0, self.GM / (r + self.a) ** 2 / safe_r, 0.0)
        return -mag[..., None] * xyz


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MiyamotoNagai(Potential):
    """Miyamoto–Nagai (1975) disk: Φ = −GM / sqrt(R² + (a + sqrt(z²+b²))²)."""

    GM: jax.Array
    a: jax.Array
    b: jax.Array

    def _parts(self, xyz):
        x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
        zb = jnp.sqrt(z * z + self.b * self.b)
        s = self.a + zb
        denom = jnp.sqrt(x * x + y * y + s * s)
        return x, y, z, zb, s, denom

    def phi(self, xyz):
        *_, denom = self._parts(xyz)
        return -self.GM / denom

    def accel(self, xyz):
        x, y, z, zb, s, denom = self._parts(xyz)
        inv_d3 = self.GM / denom**3
        ax = -inv_d3 * x
        ay = -inv_d3 * y
        az = -inv_d3 * z * s / jnp.maximum(zb, jnp.finfo(xyz.dtype).tiny)
        return jnp.stack([ax, ay, az], axis=-1)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NFW(Potential):
    """NFW (1996) halo: Φ = −G M_s ln(1 + r/r_s) / r, M_s = 4πρ₀r_s³."""

    GMs: jax.Array
    rs: jax.Array

    def phi(self, xyz):
        r = _r(xyz)
        safe_r = jnp.maximum(r, jnp.finfo(xyz.dtype).tiny)
        # limit r->0: -GMs/rs
        return jnp.where(
            r > 0, -self.GMs * jnp.log1p(r / self.rs) / safe_r, -self.GMs / self.rs
        )

    def accel(self, xyz):
        r = _r(xyz)
        safe_r = jnp.maximum(r, jnp.finfo(xyz.dtype).tiny)
        x = r / self.rs
        menc = jnp.log1p(x) - x / (1.0 + x)  # M(<r)/M_s
        # stepwise divisions: r == 0 gives 0/tiny = 0 (tiny**3 would underflow)
        mag = jnp.where(r > 0, ((self.GMs * menc / safe_r) / safe_r) / safe_r, 0.0)
        return -mag[..., None] * xyz


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PlummerSphere(Potential):
    """Plummer (1911) sphere: Φ = −GM / sqrt(r² + b²) (smooth core — also
    useful as a softened point mass or a smooth cluster background)."""

    GM: jax.Array
    b: jax.Array

    def phi(self, xyz):
        r2 = jnp.sum(xyz * xyz, axis=-1)
        return -self.GM / jnp.sqrt(r2 + self.b * self.b)

    def accel(self, xyz):
        r2 = jnp.sum(xyz * xyz, axis=-1)
        mag = self.GM * (r2 + self.b * self.b) ** -1.5
        return -mag[..., None] * xyz


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LogarithmicHalo(Potential):
    """Flat-rotation-curve halo: Φ = ½ v0² ln(R² + z²/q² + rc²).

    The standard potential for tidal-stream modelling; q flattens the
    equipotentials (q=1: spherical)."""

    v0: jax.Array
    rc: jax.Array
    q: jax.Array = dataclasses.field(default_factory=lambda: jnp.asarray(1.0))

    def _m2(self, xyz):
        x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
        return x * x + y * y + (z / self.q) ** 2 + self.rc * self.rc

    def phi(self, xyz):
        return 0.5 * self.v0**2 * jnp.log(self._m2(xyz))

    def accel(self, xyz):
        x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
        f = self.v0**2 / self._m2(xyz)
        return -jnp.stack([f * x, f * y, f * z / self.q**2], axis=-1)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Composite(Potential):
    components: tuple

    def phi(self, xyz):
        return sum(c.phi(xyz) for c in self.components)

    def accel(self, xyz):
        return sum(c.accel(xyz) for c in self.components)

    def at(self, t):
        comps = tuple(c.at(t) for c in self.components)
        if all(c is c0 for c, c0 in zip(comps, self.components)):
            return self  # all static: no retrace-relevant structure change
        return Composite(components=comps)

    def accel_jerk_ext(self, pos, vel):
        """Sum of member jerks, each member handling its own ∂a/∂t.

        The inherited single-jvp-over-pos path would be WRONG here for
        time-bound members: a :class:`Bound` member's ``t`` is a fixed
        pytree leaf of this composite, so d/dpos misses its ∂a/∂t term
        entirely (while the member's own ``accel_jerk_ext`` jvp's over
        (pos, t) exactly). Static members are unchanged — their
        ``accel_jerk_ext`` is the pos-only jvp."""
        acc = jnp.zeros_like(pos)
        jerk = jnp.zeros_like(pos)
        for c in self.components:
            a, j = c.accel_jerk_ext(pos, vel)
            acc = acc + a
            jerk = jerk + j
        return acc, jerk


def composite(components: Sequence[Potential]) -> Composite:
    return Composite(components=tuple(components))


# -- Milky Way defaults (physical: pc, Msun, Myr) ---------------------------
# Bovy (2015) / gala MilkyWayPotential-style 3-component model.
MW_BULGE_M = 5.00e9       # Msun
MW_BULGE_A = 1.00e3       # pc
MW_DISK_M = 6.80e10       # Msun
MW_DISK_A = 3.00e3        # pc
MW_DISK_B = 0.28e3        # pc
MW_HALO_MS = 5.40e11      # Msun
MW_HALO_RS = 15.62e3      # pc


def milky_way(G: float, mass_scale: float = 1.0, length_scale: float = 1.0) -> Composite:
    """Three-component Milky Way in code units.

    Args:
      G: gravitational constant in code units.
      mass_scale: code mass units per Msun (i.e. multiply Msun values by this).
      length_scale: code length units per pc.
    """
    m, L = mass_scale, length_scale
    return composite([
        Hernquist(GM=jnp.asarray(G * MW_BULGE_M * m), a=jnp.asarray(MW_BULGE_A * L)),
        MiyamotoNagai(GM=jnp.asarray(G * MW_DISK_M * m), a=jnp.asarray(MW_DISK_A * L),
                      b=jnp.asarray(MW_DISK_B * L)),
        NFW(GMs=jnp.asarray(G * MW_HALO_MS * m), rs=jnp.asarray(MW_HALO_RS * L)),
    ])


# ===========================================================================
# Time-dependent external fields
# ===========================================================================
# Open-cluster dynamics beyond a static tide: GMC flybys (MovingCenter),
# rotating bar/spiral patterns (Rotating + LongMuraliBar), adiabatic
# perturbation growth (Ramped). Design: a time-dependent potential never
# exposes phi/accel directly — integrators bind the physical time of each
# force evaluation with ``.at(t)`` (a no-op for static potentials), which
# returns a Bound wrapper carrying ``t`` as a pytree leaf. All stepper and
# diagnostic code is therefore identical for static and dynamic fields, and
# the bound time flows through jit as a traced value (no recompiles per
# step). The external jerk picks up the exact ∂a/∂t term through one jvp
# over (pos, t) — no finite differencing (Bound.accel_jerk_ext).
# Wrappers COMPOSE: each binds its base with .at(t) (identity for
# static bases), so Ramped(Rotating(bar)) or a Composite mixing static
# and moving members all work through one outer .at(t).


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TimeDependentPotential(Potential):
    """Base for fields Φ(x, t). Subclasses implement phi_t / accel_t.

    phi/accel (the time-independent surface) raise: every evaluation must
    go through ``.at(t)`` so a missed time-binding is a loud error rather
    than a silently frozen field."""

    def phi_t(self, xyz, t):
        raise NotImplementedError

    def accel_t(self, xyz, t):
        raise NotImplementedError

    def at(self, t):
        return Bound(base=self, t=jnp.asarray(t, jnp.result_type(float)))

    def phi(self, xyz):
        raise TypeError(
            f"{type(self).__name__} is time-dependent: bind an evaluation "
            "time with .at(t) (integrators do this automatically)")

    def accel(self, xyz):
        raise TypeError(
            f"{type(self).__name__} is time-dependent: bind an evaluation "
            "time with .at(t) (integrators do this automatically)")


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Bound(Potential):
    """A TimeDependentPotential with its evaluation time bound as a leaf.

    Behaves as an ordinary (static) Potential at that instant — all the
    generic derived quantities (vcirc, tidal tensor, ...) work through the
    inherited phi-based autodiff paths."""

    base: TimeDependentPotential
    t: jax.Array

    def phi(self, xyz):
        return self.base.phi_t(xyz, self.t)

    def accel(self, xyz):
        return self.base.accel_t(xyz, self.t)

    def at(self, t):
        return Bound(base=self.base, t=jnp.asarray(t, jnp.result_type(float)))

    def accel_jerk_ext(self, pos, vel):
        """Total time derivative along the trajectory: (v·∇)a + ∂a/∂t,
        both exact via a single jvp over (pos, t)."""
        t = self.t
        return jax.jvp(self.base.accel_t, (pos, t),
                       (vel.astype(pos.dtype), jnp.ones_like(t)))


# ---- trajectories (pytrees, so parameters flow through jit) ---------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LinearTrajectory:
    """x_c(t) = x0 + v0 t — an impulsive flyby path (GMC passage)."""

    x0: jax.Array
    v0: jax.Array

    def __call__(self, t):
        return self.x0 + self.v0 * t


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CircularTrajectory:
    """x_c(t) on a circle of radius R in the z = z0 plane, angular speed
    omega, starting angle phase — a perturber on a circular galactic
    orbit (the CR3BP secondary when paired with a central mass)."""

    radius: jax.Array
    omega: jax.Array
    phase: jax.Array = dataclasses.field(default_factory=lambda: jnp.asarray(0.0))
    z0: jax.Array = dataclasses.field(default_factory=lambda: jnp.asarray(0.0))

    def __call__(self, t):
        ang = self.omega * t + self.phase
        r = self.radius
        return jnp.stack([r * jnp.cos(ang), r * jnp.sin(ang),
                          self.z0 * jnp.ones_like(ang)], axis=-1)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MovingCenter(TimeDependentPotential):
    """``base`` rigidly translated along a trajectory x_c(t).

    The workhorse perturber wrapper: a Plummer-softened GMC on a straight
    flyby is ``MovingCenter(PlummerSphere(...), LinearTrajectory(...))``."""

    base: Potential
    trajectory: object  # LinearTrajectory | CircularTrajectory | pytree callable

    def phi_t(self, xyz, t):
        return self.base.at(t).phi(xyz - self.trajectory(t))

    def accel_t(self, xyz, t):
        return self.base.at(t).accel(xyz - self.trajectory(t))


def _rot_z(xyz, ang):
    """Rotate xyz by +ang about the z axis."""
    c, s = jnp.cos(ang), jnp.sin(ang)
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    return jnp.stack([c * x - s * y, s * x + c * y, z], axis=-1)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Rotating(TimeDependentPotential):
    """``base`` rigidly rotating about z at pattern speed omega_p.

    Inertial-frame field of a bar/spiral pattern: Φ(x, t) =
    Φ_base(R_z(−θ) x) with θ = omega_p·t + phase; accelerations are
    rotated back to the inertial frame. For any ``base`` the Jacobi
    integral E_J = E − omega_p·L_z is conserved (diagnostics.jacobi_energy
    — the rotating-frame energy check)."""

    base: Potential
    omega_p: jax.Array
    phase: jax.Array = dataclasses.field(default_factory=lambda: jnp.asarray(0.0))

    def _angle(self, t):
        return self.omega_p * t + self.phase

    def phi_t(self, xyz, t):
        return self.base.at(t).phi(_rot_z(xyz, -self._angle(t)))

    def accel_t(self, xyz, t):
        ang = self._angle(t)
        return _rot_z(self.base.at(t).accel(_rot_z(xyz, -ang)), ang)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Ramped(TimeDependentPotential):
    """``base`` with a smooth amplitude ramp A(t): 0 → 1 over [t0, t1].

    Dehnen (2000) growth polynomial: A(ξ) = 3/16 ξ⁵ − 5/8 ξ³ + 15/16 ξ +
    1/2, ξ = clip(2(t−t0)/(t1−t0) − 1), which is C² at both ends — the
    standard adiabatic switch-on for bar perturbations.

    REVERSED bounds (t0 > t1) give the mirror-image C² decay 1 → 0 over
    [t1, t0] — used by the gas-expulsion surface ([potential.gas],
    scene._build_gas): the natal-gas background leaving the cluster."""

    base: Potential
    t0: jax.Array
    t1: jax.Array

    def amplitude(self, t):
        xi = jnp.clip(2.0 * (t - self.t0) / (self.t1 - self.t0) - 1.0,
                      -1.0, 1.0)
        return ((3.0 / 16.0) * xi**5 - (5.0 / 8.0) * xi**3
                + (15.0 / 16.0) * xi + 0.5)

    def phi_t(self, xyz, t):
        return self.amplitude(t) * self.base.at(t).phi(xyz)

    def accel_t(self, xyz, t):
        return self.amplitude(t) * self.base.at(t).accel(xyz)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LongMuraliBar(Potential):
    """Long & Murali (1992) softened-needle bar along x.

    Φ = (GM/2a) ln[(x − a + T₋)/(x + a + T₊)], T_± = √((a ∓ x)² + y² +
    (b + √(c² + z²))²). Closed-form, finite everywhere; the standard
    analytic triaxial bar model. Acceleration by exact autodiff of Φ
    (O(N), not a hot path). Wrap in :class:`Rotating` (optionally
    :class:`Ramped`) for a pattern-rotating Galactic bar."""

    GM: jax.Array
    a: jax.Array   # bar half-length
    b: jax.Array   # in-plane softening
    c: jax.Array   # vertical softening

    def phi(self, xyz):
        x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
        w = self.b + jnp.sqrt(self.c**2 + z * z)
        yw2 = y * y + w * w
        tm = jnp.sqrt((self.a - x) ** 2 + yw2)
        tp = jnp.sqrt((self.a + x) ** 2 + yw2)
        return (self.GM / (2.0 * self.a)) * jnp.log(
            (x - self.a + tm) / (x + self.a + tp))

    def accel(self, xyz):
        xyz = jnp.asarray(xyz, jnp.result_type(float))
        return -jax.grad(lambda p: jnp.sum(self.phi(p)))(xyz)
