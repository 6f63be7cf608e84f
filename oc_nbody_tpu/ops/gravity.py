"""Softened direct-summation gravity: O(N^2) pairwise kernels.

Capability parity: SURVEY.md §2.3 — the reference's "O(N^2) softened
pairwise-gravity kernel" (BASELINE.json:5), plus the jerk extension needed by
the Hermite-4 stepper and the pairwise potential needed by the energy
diagnostics.

Architecture: everything is built on *rows-vs-sources* primitives
  accel_rows(pos_rows, src_pos, src_mass, ...)
computing forces on a row block exerted by an arbitrary source set. The
single-chip functions call them with rows == sources; the multi-chip path
(parallel/force.py) calls them with rows = the local shard and sources =
all-gathered or ring-permuted shards (SURVEY.md §3.5); the Pallas kernels
(ops/pallas_gravity.py) implement the same signatures on the TPU and are
drop-in replacements.

Three tiers:
  * ``*_direct``    — full (N, N) broadcast in the input dtype; the in-repo
                      oracle (SURVEY.md §4.1), small N / tests only.
  * ``*_rows`` etc. — blocked jnp: row-chunked ``lax.map`` so memory stays
                      O(chunk * N); pairwise math in float32.
  * Pallas kernels  — ops.pallas_gravity, the production TPU path.

Numerical notes (measured; SURVEY.md §6):
  * separations use direct subtraction (no |r_i|²+|r_j|²-2r_i·r_j
    cancellation trap);
  * callers centre positions before the f32 cast (``prepare_f32``) so a
    galactocentric offset does not eat the f32 mantissa;
  * ``r² + eps²`` is guarded so eps == 0 self-pairs produce 0, not NaN.

Conventions: r_ij = x_j - x_i (points at the source);
  a_i    = G * sum_j m_j r_ij / (r_ij² + eps²)^{3/2}
  jerk_i = G * sum_j m_j [ v_ij / u^{3/2} - 3 (r_ij·v_ij) r_ij / u^{5/2} ]
  phi_i  = -G * sum_{j != i} m_j / sqrt(r_ij² + eps²)
(the self term of phi is subtracted by the *caller* via ``self_phi``).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


# --------------------------------------------------------------------------
# oracle tier: full broadcast, input dtype
# --------------------------------------------------------------------------

def _pair_geometry(pos_i, pos_j, eps):
    dr = pos_j[None, :, :] - pos_i[:, None, :]
    r2 = jnp.sum(dr * dr, axis=-1)
    u = r2 + eps * eps
    inv_r = jnp.where(u > 0, lax.rsqrt(jnp.maximum(u, jnp.finfo(u.dtype).tiny)), 0.0)
    return dr, u, inv_r


def accel_direct(pos, mass, eps=0.0, G=1.0):
    """Oracle acceleration, full (N, N) broadcast in pos.dtype."""
    pos = jnp.asarray(pos)
    mass = jnp.asarray(mass, pos.dtype)
    eps = jnp.asarray(eps, pos.dtype)
    dr, u, inv_r = _pair_geometry(pos, pos, eps)
    w = G * mass[None, :] * inv_r**3
    return jnp.sum(w[:, :, None] * dr, axis=1)  # self term: w_ii * 0 = 0


def accel_potential_direct(pos, mass, eps=0.0, G=1.0):
    """Oracle (accel, per-particle potential phi_i), excluding self terms."""
    pos = jnp.asarray(pos)
    mass = jnp.asarray(mass, pos.dtype)
    eps = jnp.asarray(eps, pos.dtype)
    dr, u, inv_r = _pair_geometry(pos, pos, eps)
    w = G * mass[None, :] * inv_r**3
    acc = jnp.sum(w[:, :, None] * dr, axis=1)
    phi = -G * jnp.sum(mass[None, :] * inv_r, axis=1)
    phi = phi + self_phi(mass, eps, G)
    return acc, phi


def accel_jerk_direct(pos, vel, mass, eps=0.0, G=1.0):
    """Oracle (accel, jerk) for the Hermite stepper."""
    pos = jnp.asarray(pos)
    vel = jnp.asarray(vel, pos.dtype)
    mass = jnp.asarray(mass, pos.dtype)
    eps = jnp.asarray(eps, pos.dtype)
    dr, u, inv_r = _pair_geometry(pos, pos, eps)
    dv = vel[None, :, :] - vel[:, None, :]
    w = G * mass[None, :] * inv_r**3
    rv = jnp.sum(dr * dv, axis=-1)
    inv_u = jnp.where(u > 0, 1.0 / jnp.maximum(u, jnp.finfo(u.dtype).tiny), 0.0)
    s = 3.0 * w * rv * inv_u
    acc = jnp.sum(w[:, :, None] * dr, axis=1)
    jerk = jnp.sum(w[:, :, None] * dv - s[:, :, None] * dr, axis=1)
    return acc, jerk


def self_phi(mass, eps, G):
    """The softened self-interaction potential -G m_i/eps that a rows==src
    sum includes and must be removed (zero when eps == 0)."""
    eps = jnp.asarray(eps, mass.dtype)
    inv_eps = jnp.where(eps > 0, 1.0 / jnp.maximum(eps, jnp.finfo(mass.dtype).tiny), 0.0)
    return G * mass * inv_eps


# --------------------------------------------------------------------------
# rows-vs-sources tier (f32 blocked lax.map) — the multi-chip building block
# --------------------------------------------------------------------------

def _block_accel(src_x, src_y, src_z, gm, pi, eps2):
    dx = src_x - pi[:, 0:1]
    dy = src_y - pi[:, 1:2]
    dz = src_z - pi[:, 2:3]
    u = dx * dx + dy * dy + dz * dz + eps2
    inv_r = jnp.where(u > 0, lax.rsqrt(jnp.maximum(u, jnp.finfo(u.dtype).tiny)), 0.0)
    w = gm * inv_r * inv_r * inv_r
    return jnp.stack(
        [jnp.sum(w * dx, axis=1), jnp.sum(w * dy, axis=1), jnp.sum(w * dz, axis=1)],
        axis=1,
    )


def accel_rows(pos_rows, src_pos, src_mass, eps, G=1.0, chunk: int = 1024):
    """Accel on ``pos_rows`` from ``src_pos/src_mass``; all f32-ish inputs
    already centred. Row count is padded internally to the chunk size."""
    nr = pos_rows.shape[0]
    chunk = min(chunk, _round_up(nr, 8))
    n_pad = _round_up(nr, chunk)
    rows = jnp.pad(pos_rows, ((0, n_pad - nr), (0, 0))) if n_pad != nr else pos_rows
    eps2 = jnp.asarray(eps, rows.dtype) ** 2
    gm = (jnp.asarray(G, rows.dtype) * src_mass)[None, :]
    src_x, src_y, src_z = (src_pos[None, :, 0], src_pos[None, :, 1],
                           src_pos[None, :, 2])
    starts = jnp.arange(0, n_pad, chunk)
    blocks = lax.map(
        lambda i0: _block_accel(
            src_x, src_y, src_z, gm,
            lax.dynamic_slice(rows, (i0, 0), (chunk, 3)), eps2),
        starts,
    )
    return blocks.reshape(-1, 3)[:nr]


def _block_accel_phi(src_x, src_y, src_z, gm, pi, eps2):
    dx = src_x - pi[:, 0:1]
    dy = src_y - pi[:, 1:2]
    dz = src_z - pi[:, 2:3]
    u = dx * dx + dy * dy + dz * dz + eps2
    inv_r = jnp.where(u > 0, lax.rsqrt(jnp.maximum(u, jnp.finfo(u.dtype).tiny)), 0.0)
    w = gm * inv_r * inv_r * inv_r
    acc = jnp.stack(
        [jnp.sum(w * dx, axis=1), jnp.sum(w * dy, axis=1), jnp.sum(w * dz, axis=1)],
        axis=1,
    )
    phi = -jnp.sum(gm * inv_r, axis=1)
    return acc, phi


def accel_potential_rows(pos_rows, src_pos, src_mass, eps, G=1.0,
                         chunk: int = 1024):
    """(accel, phi) on rows from sources. phi still contains the softened
    self term when rows overlap sources — caller adds ``self_phi``."""
    nr = pos_rows.shape[0]
    chunk = min(chunk, _round_up(nr, 8))
    n_pad = _round_up(nr, chunk)
    rows = jnp.pad(pos_rows, ((0, n_pad - nr), (0, 0))) if n_pad != nr else pos_rows
    eps2 = jnp.asarray(eps, rows.dtype) ** 2
    gm = (jnp.asarray(G, rows.dtype) * src_mass)[None, :]
    src_x, src_y, src_z = (src_pos[None, :, 0], src_pos[None, :, 1],
                           src_pos[None, :, 2])
    starts = jnp.arange(0, n_pad, chunk)
    acc_b, phi_b = lax.map(
        lambda i0: _block_accel_phi(
            src_x, src_y, src_z, gm,
            lax.dynamic_slice(rows, (i0, 0), (chunk, 3)), eps2),
        starts,
    )
    return acc_b.reshape(-1, 3)[:nr], phi_b.reshape(-1)[:nr]


def _block_accel_jerk(src_x, src_y, src_z, svx, svy, svz, gm, pi, vi, eps2):
    dx = src_x - pi[:, 0:1]
    dy = src_y - pi[:, 1:2]
    dz = src_z - pi[:, 2:3]
    dvx = svx - vi[:, 0:1]
    dvy = svy - vi[:, 1:2]
    dvz = svz - vi[:, 2:3]
    u = dx * dx + dy * dy + dz * dz + eps2
    safe_u = jnp.maximum(u, jnp.finfo(u.dtype).tiny)
    inv_r = jnp.where(u > 0, lax.rsqrt(safe_u), 0.0)
    w = gm * inv_r * inv_r * inv_r
    rv = dx * dvx + dy * dvy + dz * dvz
    # s = 3 w rv / u == 3 rv w inv_r^2 (inv_r is already zero-guarded)
    s = (3.0 * rv) * w * (inv_r * inv_r)
    acc = jnp.stack(
        [jnp.sum(w * dx, axis=1), jnp.sum(w * dy, axis=1), jnp.sum(w * dz, axis=1)],
        axis=1,
    )
    jerk = jnp.stack(
        [jnp.sum(w * dvx - s * dx, axis=1), jnp.sum(w * dvy - s * dy, axis=1),
         jnp.sum(w * dvz - s * dz, axis=1)],
        axis=1,
    )
    return acc, jerk


def accel_jerk_rows(pos_rows, vel_rows, src_pos, src_vel, src_mass, eps,
                    G=1.0, chunk: int = 1024):
    """(accel, jerk) on rows from sources."""
    nr = pos_rows.shape[0]
    chunk = min(chunk, _round_up(nr, 8))
    n_pad = _round_up(nr, chunk)
    if n_pad != nr:
        pos_rows = jnp.pad(pos_rows, ((0, n_pad - nr), (0, 0)))
        vel_rows = jnp.pad(vel_rows, ((0, n_pad - nr), (0, 0)))
    eps2 = jnp.asarray(eps, pos_rows.dtype) ** 2
    gm = (jnp.asarray(G, pos_rows.dtype) * src_mass)[None, :]
    sx, sy, sz = src_pos[None, :, 0], src_pos[None, :, 1], src_pos[None, :, 2]
    svx, svy, svz = src_vel[None, :, 0], src_vel[None, :, 1], src_vel[None, :, 2]
    starts = jnp.arange(0, n_pad, chunk)
    acc_b, jerk_b = lax.map(
        lambda i0: _block_accel_jerk(
            sx, sy, sz, svx, svy, svz, gm,
            lax.dynamic_slice(pos_rows, (i0, 0), (chunk, 3)),
            lax.dynamic_slice(vel_rows, (i0, 0), (chunk, 3)), eps2),
        starts,
    )
    return acc_b.reshape(-1, 3)[:nr], jerk_b.reshape(-1, 3)[:nr]


# --------------------------------------------------------------------------
# pairwise encounter timescale (block-timestep pair-aware rung criterion)
# --------------------------------------------------------------------------

def _block_pair_tau2(src_x, src_y, src_z, svx, svy, svz, gm_src, pi, vi,
                     gm_rows, eps2, rmax2):
    dx = src_x - pi[:, 0:1]
    dy = src_y - pi[:, 1:2]
    dz = src_z - pi[:, 2:3]
    r2 = dx * dx + dy * dy + dz * dz
    u = r2 + eps2
    dvx = svx - vi[:, 0:1]
    dvy = svy - vi[:, 1:2]
    dvz = svz - vi[:, 2:3]
    v2 = dvx * dvx + dvy * dvy + dvz * dvz
    tiny = jnp.finfo(u.dtype).tiny
    big = jnp.asarray(jnp.finfo(u.dtype).max, u.dtype)
    # fly-by time²: (r²+eps²)/|dv|² — stays finite (eps/v) through the
    # softened core where the force (and hence the Aarseth dt) vanishes
    t_fly2 = u / jnp.maximum(v2, tiny)
    t_fly2 = jnp.where(v2 > 0, t_fly2, big)
    # softened free-fall time²: (r²+eps²)^{3/2} / (G (m_i + m_j))
    gm_pair = gm_rows[:, None] + gm_src
    t_ff2 = u * jnp.sqrt(u) / jnp.maximum(gm_pair, tiny)
    t_ff2 = jnp.where(gm_pair > 0, t_ff2, big)
    tau2 = jnp.minimum(t_fly2, t_ff2)
    # self pairs (and exactly coincident particles): r² == 0 — exclude,
    # or the softened self free-fall time sqrt(eps³/2Gm_i) would cap
    # EVERY row at the encounter floor
    tau2 = jnp.where(r2 > 0, tau2, big)
    # optional near-field window (rmax2 > 0): only pairs INSIDE it
    # contribute. The Aarseth criterion is blind exactly where softening
    # bends the force (r ≲ few eps); outside that the force-derived dt is
    # already correct, and an unwindowed nearest-neighbour cap drags the
    # whole cluster onto deep rungs (measured on configs/binaries_8k:
    # ~half the stars moved 5+ rungs deeper for no accuracy gain)
    tau2 = jnp.where((rmax2 > 0) & (r2 > rmax2), big, tau2)
    return jnp.min(tau2, axis=1)


def pair_timescale_rows(pos_rows, vel_rows, mass_rows, src_pos, src_vel,
                        src_mass, eps, G=1.0, chunk: int = 1024,
                        r_max=0.0):
    """Per-row minimum softened two-body encounter timescale against the
    source set: tau_i = min_j min( sqrt(u)/|v_ij|, u^{3/4}/sqrt(G m_pair) )
    with u = r_ij² + eps². The fly-by term is the criterion the aggregate
    Aarseth dt MISSES inside the softened core (a → 0 at r → 0, so the
    force-derived dt grows exactly where the encounter is fastest —
    measured on configs/binaries_8k.toml as a ~3e-3 |dE/E_int| random
    walk, round-4 VERDICT Missing #1). Inputs centred/f32 like the other
    rows kernels; self pairs are excluded by r² > 0. ``r_max`` > 0
    restricts the criterion to pairs with r < r_max (the near-field
    window where the force-derived criterion is actually blind)."""
    nr = pos_rows.shape[0]
    chunk = min(chunk, _round_up(nr, 8))
    n_pad = _round_up(nr, chunk)
    if n_pad != nr:
        pos_rows = jnp.pad(pos_rows, ((0, n_pad - nr), (0, 0)))
        vel_rows = jnp.pad(vel_rows, ((0, n_pad - nr), (0, 0)))
        mass_rows = jnp.pad(mass_rows, ((0, n_pad - nr),))
    eps2 = jnp.asarray(eps, pos_rows.dtype) ** 2
    rmax2 = jnp.asarray(r_max, pos_rows.dtype) ** 2
    G_ = jnp.asarray(G, pos_rows.dtype)
    gm_src = (G_ * src_mass)[None, :]
    gm_rows = G_ * mass_rows
    sx, sy, sz = src_pos[None, :, 0], src_pos[None, :, 1], src_pos[None, :, 2]
    svx, svy, svz = (src_vel[None, :, 0], src_vel[None, :, 1],
                     src_vel[None, :, 2])
    starts = jnp.arange(0, n_pad, chunk)
    tau2 = lax.map(
        lambda i0: _block_pair_tau2(
            sx, sy, sz, svx, svy, svz, gm_src,
            lax.dynamic_slice(pos_rows, (i0, 0), (chunk, 3)),
            lax.dynamic_slice(vel_rows, (i0, 0), (chunk, 3)),
            lax.dynamic_slice(gm_rows, (i0,), (chunk,)), eps2, rmax2),
        starts,
    )
    return jnp.sqrt(tau2.reshape(-1)[:nr])


# --------------------------------------------------------------------------
# cross-pair tier (halfring sharded mode): one sweep computes BOTH the
# action on set A and the reaction on set B for two DISJOINT particle sets
# (two mesh shards) — the jnp twin of ops.pallas_gravity's cross-pair
# wrappers (same signatures; oracle for the emulated-mesh tests). The
# pairwise weights w = gm·(r²+eps²)^{-3/2} are computed once and reduced
# along both axes, so the pair count is genuinely halved vs two one-sided
# rows calls. Blocked over A rows with lax.scan carrying the B accumulator;
# inputs are f32-ready and globally centred (per-set centring would put A
# and B in different frames).
# --------------------------------------------------------------------------

def _pad_rows_masses(pos, mass, n_pad):
    n = pos.shape[0]
    if n_pad == n:
        return pos, mass
    return (jnp.pad(pos, ((0, n_pad - n), (0, 0))),
            jnp.pad(mass, ((0, n_pad - n),)))  # zero mass → zero reaction


def accel_cross_pair(posA, posB, massA, massB, eps, G=1.0, chunk: int = 1024):
    """(accel on A from B, accel on B from A), each (a, b) pair once."""
    nA, nB = posA.shape[0], posB.shape[0]
    chunk = min(chunk, _round_up(nA, 8))
    n_pad = _round_up(nA, chunk)
    rows, gmA = _pad_rows_masses(posA, jnp.asarray(G, posA.dtype) * massA,
                                 n_pad)
    gmB = (jnp.asarray(G, posB.dtype) * massB)[None, :]
    eps2 = jnp.asarray(eps, rows.dtype) ** 2
    sx, sy, sz = posB[None, :, 0], posB[None, :, 1], posB[None, :, 2]

    def body(aB, i0):
        pi = lax.dynamic_slice(rows, (i0, 0), (chunk, 3))
        gi = lax.dynamic_slice(gmA, (i0,), (chunk,))[:, None]
        dx = sx - pi[:, 0:1]
        dy = sy - pi[:, 1:2]
        dz = sz - pi[:, 2:3]
        u = dx * dx + dy * dy + dz * dz + eps2
        inv_r = jnp.where(u > 0, lax.rsqrt(
            jnp.maximum(u, jnp.finfo(u.dtype).tiny)), 0.0)
        inv3 = inv_r * inv_r * inv_r
        w = gmB * inv3
        wi = gi * inv3
        aA_blk = jnp.stack([jnp.sum(w * dx, axis=1),
                            jnp.sum(w * dy, axis=1),
                            jnp.sum(w * dz, axis=1)], axis=1)
        aB = aB - jnp.stack([jnp.sum(wi * dx, axis=0),
                             jnp.sum(wi * dy, axis=0),
                             jnp.sum(wi * dz, axis=0)], axis=1)
        return aB, aA_blk

    aB, aA_blocks = lax.scan(body, jnp.zeros((nB, 3), rows.dtype),
                             jnp.arange(0, n_pad, chunk))
    return aA_blocks.reshape(-1, 3)[:nA], aB


def accel_potential_cross_pair(posA, posB, massA, massB, eps, G=1.0,
                               chunk: int = 1024):
    """(accA, phiA, accB, phiB); the sets are disjoint, so neither phi has
    a self term (no self_phi correction applies)."""
    nA, nB = posA.shape[0], posB.shape[0]
    chunk = min(chunk, _round_up(nA, 8))
    n_pad = _round_up(nA, chunk)
    rows, gmA = _pad_rows_masses(posA, jnp.asarray(G, posA.dtype) * massA,
                                 n_pad)
    gmB = (jnp.asarray(G, posB.dtype) * massB)[None, :]
    eps2 = jnp.asarray(eps, rows.dtype) ** 2
    sx, sy, sz = posB[None, :, 0], posB[None, :, 1], posB[None, :, 2]

    def body(carry, i0):
        aB, pB = carry
        pi = lax.dynamic_slice(rows, (i0, 0), (chunk, 3))
        gi = lax.dynamic_slice(gmA, (i0,), (chunk,))[:, None]
        dx = sx - pi[:, 0:1]
        dy = sy - pi[:, 1:2]
        dz = sz - pi[:, 2:3]
        u = dx * dx + dy * dy + dz * dz + eps2
        inv_r = jnp.where(u > 0, lax.rsqrt(
            jnp.maximum(u, jnp.finfo(u.dtype).tiny)), 0.0)
        inv3 = inv_r * inv_r * inv_r
        w = gmB * inv3
        wi = gi * inv3
        aA_blk = jnp.stack([jnp.sum(w * dx, axis=1),
                            jnp.sum(w * dy, axis=1),
                            jnp.sum(w * dz, axis=1)], axis=1)
        pA_blk = -jnp.sum(gmB * inv_r, axis=1)
        aB = aB - jnp.stack([jnp.sum(wi * dx, axis=0),
                             jnp.sum(wi * dy, axis=0),
                             jnp.sum(wi * dz, axis=0)], axis=1)
        pB = pB - jnp.sum(gi * inv_r, axis=0)
        return (aB, pB), (aA_blk, pA_blk)

    (aB, pB), (aA_blocks, pA_blocks) = lax.scan(
        body, (jnp.zeros((nB, 3), rows.dtype), jnp.zeros((nB,), rows.dtype)),
        jnp.arange(0, n_pad, chunk))
    return (aA_blocks.reshape(-1, 3)[:nA], pA_blocks.reshape(-1)[:nA],
            aB, pB)


def accel_jerk_cross_pair(posA, velA, posB, velB, massA, massB, eps, G=1.0,
                          chunk: int = 1024):
    """(accA, jerkA, accB, jerkB); shared bracket dv − 3(r·v)inv²·d serves
    both directions (reaction jerk = −action jerk pairwise)."""
    nA, nB = posA.shape[0], posB.shape[0]
    chunk = min(chunk, _round_up(nA, 8))
    n_pad = _round_up(nA, chunk)
    rows, gmA = _pad_rows_masses(posA, jnp.asarray(G, posA.dtype) * massA,
                                 n_pad)
    vrows = (jnp.pad(velA, ((0, n_pad - nA), (0, 0)))
             if n_pad != nA else velA)
    gmB = (jnp.asarray(G, posB.dtype) * massB)[None, :]
    eps2 = jnp.asarray(eps, rows.dtype) ** 2
    sx, sy, sz = posB[None, :, 0], posB[None, :, 1], posB[None, :, 2]
    svx, svy, svz = velB[None, :, 0], velB[None, :, 1], velB[None, :, 2]

    def body(carry, i0):
        aB, jB = carry
        pi = lax.dynamic_slice(rows, (i0, 0), (chunk, 3))
        vi = lax.dynamic_slice(vrows, (i0, 0), (chunk, 3))
        gi = lax.dynamic_slice(gmA, (i0,), (chunk,))[:, None]
        dx = sx - pi[:, 0:1]
        dy = sy - pi[:, 1:2]
        dz = sz - pi[:, 2:3]
        dvx = svx - vi[:, 0:1]
        dvy = svy - vi[:, 1:2]
        dvz = svz - vi[:, 2:3]
        u = dx * dx + dy * dy + dz * dz + eps2
        inv_r = jnp.where(u > 0, lax.rsqrt(
            jnp.maximum(u, jnp.finfo(u.dtype).tiny)), 0.0)
        inv3 = inv_r * inv_r * inv_r
        rv = dx * dvx + dy * dvy + dz * dvz
        s = (3.0 * rv) * (inv_r * inv_r)
        bx = dvx - s * dx
        by = dvy - s * dy
        bz = dvz - s * dz
        w = gmB * inv3
        wi = gi * inv3
        aA_blk = jnp.stack([jnp.sum(w * dx, axis=1),
                            jnp.sum(w * dy, axis=1),
                            jnp.sum(w * dz, axis=1)], axis=1)
        jA_blk = jnp.stack([jnp.sum(w * bx, axis=1),
                            jnp.sum(w * by, axis=1),
                            jnp.sum(w * bz, axis=1)], axis=1)
        aB = aB - jnp.stack([jnp.sum(wi * dx, axis=0),
                             jnp.sum(wi * dy, axis=0),
                             jnp.sum(wi * dz, axis=0)], axis=1)
        jB = jB - jnp.stack([jnp.sum(wi * bx, axis=0),
                             jnp.sum(wi * by, axis=0),
                             jnp.sum(wi * bz, axis=0)], axis=1)
        return (aB, jB), (aA_blk, jA_blk)

    zero = jnp.zeros((nB, 3), rows.dtype)
    (aB, jB), (aA_blocks, jA_blocks) = lax.scan(
        body, (zero, zero), jnp.arange(0, n_pad, chunk))
    return (aA_blocks.reshape(-1, 3)[:nA], jA_blocks.reshape(-1, 3)[:nA],
            aB, jB)


# --------------------------------------------------------------------------
# single-chip wrappers: centre -> f32 -> rows==sources -> cast back
# --------------------------------------------------------------------------

def prepare_f32(pos, mass, vel=None, compute_dtype=jnp.float32):
    """Centre on the mean position (and velocity) and cast for the kernel.
    Pairwise differences are exactly shift-invariant, so centring costs
    nothing physically but preserves the f32 mantissa for clusters sitting
    at large galactocentric offsets (SURVEY.md §6 pitfall)."""
    pos_c = (pos - jnp.mean(pos, axis=0)).astype(compute_dtype)
    mass_c = jnp.asarray(mass, compute_dtype)
    if vel is None:
        return pos_c, mass_c
    vel_c = (vel - jnp.mean(vel, axis=0)).astype(compute_dtype)
    return pos_c, mass_c, vel_c


@functools.partial(jax.jit, static_argnames=("compute_dtype", "chunk"))
def accel(pos, mass, eps=0.0, G=1.0, *, compute_dtype=jnp.float32, chunk=1024):
    """Blocked pairwise acceleration; returns (N, 3) in pos.dtype."""
    pos_c, mass_c = prepare_f32(pos, mass, compute_dtype=compute_dtype)
    out = accel_rows(pos_c, pos_c, mass_c,
                     jnp.asarray(eps, compute_dtype),
                     jnp.asarray(G, compute_dtype), chunk)
    return out.astype(pos.dtype)


@functools.partial(jax.jit, static_argnames=("compute_dtype", "chunk"))
def accel_potential(pos, mass, eps=0.0, G=1.0, *, compute_dtype=jnp.float32,
                    chunk=1024):
    """Blocked (accel, phi); self term removed."""
    pos_c, mass_c = prepare_f32(pos, mass, compute_dtype=compute_dtype)
    acc, phi = accel_potential_rows(
        pos_c, pos_c, mass_c,
        jnp.asarray(eps, compute_dtype), jnp.asarray(G, compute_dtype), chunk)
    phi = phi + self_phi(mass_c, jnp.asarray(eps, compute_dtype),
                         jnp.asarray(G, compute_dtype))
    return acc.astype(pos.dtype), phi.astype(pos.dtype)


@functools.partial(jax.jit, static_argnames=("compute_dtype", "chunk"))
def accel_jerk(pos, vel, mass, eps=0.0, G=1.0, *, compute_dtype=jnp.float32,
               chunk=1024):
    """Blocked (accel, jerk) for the Hermite-4 stepper."""
    pos_c, mass_c, vel_c = prepare_f32(pos, mass, vel=vel,
                                       compute_dtype=compute_dtype)
    acc, jerk = accel_jerk_rows(
        pos_c, vel_c, pos_c, vel_c, mass_c,
        jnp.asarray(eps, compute_dtype), jnp.asarray(G, compute_dtype), chunk)
    return acc.astype(pos.dtype), jerk.astype(pos.dtype)
