"""Softened direct-summation gravity: O(N^2) pairwise kernels.

Capability parity: SURVEY.md §2.3 — the reference's "O(N^2) softened
pairwise-gravity kernel" (BASELINE.json:5), plus the jerk extension needed by
the Hermite-4 stepper and the pairwise potential needed by the energy
diagnostics.

Three tiers live here / in ops.pallas_gravity:

  * ``*_direct``   — full (N, N) broadcast in the input dtype. The in-repo
                     oracle for everything else (SURVEY.md §4.1); use for
                     small N and tests only.
  * ``accel`` etc. — blocked jnp implementation: row-chunked ``lax.map`` so
                     memory stays O(chunk * N); pairwise math in float32 on
                     cluster-centred offsets. Runs everywhere (CPU/TPU).
  * Pallas kernels — ops.pallas_gravity, the MXU/VPU production path.

Numerical notes (measured; SURVEY.md §6):
  * pairwise separations are computed by direct subtraction (no |r_i|^2 +
    |r_j|^2 - 2 r_i.r_j cancellation trap);
  * inputs are centred before the f32 cast so a galactocentric offset does
    not eat the f32 mantissa;
  * ``r^2 + eps^2`` is guarded so eps == 0 self-interactions produce 0, not
    NaN.

Conventions: r_ij = x_j - x_i (points at the source);
  a_i    = G * sum_j m_j r_ij / (r_ij^2 + eps^2)^{3/2}
  jerk_i = G * sum_j m_j [ v_ij / u^{3/2} - 3 (r_ij.v_ij) r_ij / u^{5/2} ]
  phi_i  = -G * sum_{j != i} m_j / sqrt(r_ij^2 + eps^2)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


# --------------------------------------------------------------------------
# oracle tier: full broadcast, input dtype
# --------------------------------------------------------------------------

def _pair_geometry(pos_i, pos_j, eps):
    """dr (Ni,Nj,3), u = r^2+eps^2 (Ni,Nj), safe inverse sqrt powers."""
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
    w = G * mass[None, :] * inv_r**3            # (N, N)
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
    # remove the softened self term -G m_i / eps (zero when eps == 0)
    inv_eps = jnp.where(eps > 0, 1.0 / jnp.maximum(eps, jnp.finfo(pos.dtype).tiny), 0.0)
    phi = phi + G * mass * inv_eps
    return acc, phi


def accel_jerk_direct(pos, vel, mass, eps=0.0, G=1.0):
    """Oracle (accel, jerk) for the Hermite stepper."""
    pos = jnp.asarray(pos)
    vel = jnp.asarray(vel, pos.dtype)
    mass = jnp.asarray(mass, pos.dtype)
    eps = jnp.asarray(eps, pos.dtype)
    dr, u, inv_r = _pair_geometry(pos, pos, eps)
    dv = vel[None, :, :] - vel[:, None, :]
    w = G * mass[None, :] * inv_r**3            # (N, N)
    rv = jnp.sum(dr * dv, axis=-1)              # (N, N)
    inv_u = jnp.where(u > 0, 1.0 / jnp.maximum(u, jnp.finfo(u.dtype).tiny), 0.0)
    s = 3.0 * w * rv * inv_u                    # (N, N)
    acc = jnp.sum(w[:, :, None] * dr, axis=1)
    jerk = jnp.sum(w[:, :, None] * dv - s[:, :, None] * dr, axis=1)
    return acc, jerk


# --------------------------------------------------------------------------
# production tier: blocked jnp (row-chunked lax.map, f32 pairwise math)
# --------------------------------------------------------------------------

def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _prepare(pos, mass, eps, compute_dtype, chunk, vel=None):
    """Centre, cast to compute dtype, zero-mass pad to a chunk multiple."""
    n = pos.shape[0]
    center = jnp.mean(pos, axis=0)
    pos_c = (pos - center).astype(compute_dtype)
    mass_c = jnp.asarray(mass, compute_dtype)
    chunk = min(chunk, _round_up(n, 8))
    n_pad = _round_up(n, chunk)
    if n_pad != n:
        pos_c = jnp.pad(pos_c, ((0, n_pad - n), (0, 0)))
        mass_c = jnp.pad(mass_c, (0, n_pad - n))
    out = [pos_c, mass_c]
    if vel is not None:
        vc = (vel - jnp.mean(vel, axis=0)).astype(compute_dtype)
        if n_pad != n:
            vc = jnp.pad(vc, ((0, n_pad - n), (0, 0)))
        out.append(vc)
    eps2 = jnp.asarray(eps, compute_dtype) ** 2
    return out, eps2, n, chunk


def _row_block_accel(pos_all, mass_all, eps2, G, i0, chunk):
    pi = lax.dynamic_slice(pos_all, (i0, 0), (chunk, 3))
    dx = pos_all[None, :, 0] - pi[:, 0:1]
    dy = pos_all[None, :, 1] - pi[:, 1:2]
    dz = pos_all[None, :, 2] - pi[:, 2:3]
    u = dx * dx + dy * dy + dz * dz + eps2
    inv_r = jnp.where(u > 0, lax.rsqrt(jnp.maximum(u, jnp.finfo(u.dtype).tiny)), 0.0)
    w = (G * mass_all)[None, :] * inv_r * inv_r * inv_r
    ax = jnp.sum(w * dx, axis=1)
    ay = jnp.sum(w * dy, axis=1)
    az = jnp.sum(w * dz, axis=1)
    return jnp.stack([ax, ay, az], axis=1)


@functools.partial(jax.jit, static_argnames=("compute_dtype", "chunk"))
def accel(pos, mass, eps=0.0, G=1.0, *, compute_dtype=jnp.float32, chunk=1024):
    """Blocked pairwise acceleration; returns (N, 3) in pos.dtype."""
    (pos_c, mass_c), eps2, n, chunk = _prepare(pos, mass, eps, compute_dtype, chunk)
    Gc = jnp.asarray(G, compute_dtype)
    starts = jnp.arange(0, pos_c.shape[0], chunk)
    blocks = lax.map(
        lambda i0: _row_block_accel(pos_c, mass_c, eps2, Gc, i0, chunk), starts
    )
    return blocks.reshape(-1, 3)[:n].astype(pos.dtype)


def _row_block_accel_phi(pos_all, mass_all, eps2, G, i0, chunk):
    pi = lax.dynamic_slice(pos_all, (i0, 0), (chunk, 3))
    mi = lax.dynamic_slice(mass_all, (i0,), (chunk,))
    dx = pos_all[None, :, 0] - pi[:, 0:1]
    dy = pos_all[None, :, 1] - pi[:, 1:2]
    dz = pos_all[None, :, 2] - pi[:, 2:3]
    u = dx * dx + dy * dy + dz * dz + eps2
    inv_r = jnp.where(u > 0, lax.rsqrt(jnp.maximum(u, jnp.finfo(u.dtype).tiny)), 0.0)
    gm = (G * mass_all)[None, :]
    w = gm * inv_r * inv_r * inv_r
    ax = jnp.sum(w * dx, axis=1)
    ay = jnp.sum(w * dy, axis=1)
    az = jnp.sum(w * dz, axis=1)
    phi = -jnp.sum(gm * inv_r, axis=1)
    # add back the softened self term (subtracted because -G m_i/eps is in the sum)
    inv_eps = jnp.where(eps2 > 0, lax.rsqrt(jnp.maximum(eps2, jnp.finfo(u.dtype).tiny)), 0.0)
    phi = phi + G * mi * inv_eps
    return jnp.stack([ax, ay, az], axis=1), phi


@functools.partial(jax.jit, static_argnames=("compute_dtype", "chunk"))
def accel_potential(pos, mass, eps=0.0, G=1.0, *, compute_dtype=jnp.float32,
                    chunk=1024):
    """Blocked (accel, phi). phi accumulates per-row in f64 at the block join."""
    (pos_c, mass_c), eps2, n, chunk = _prepare(pos, mass, eps, compute_dtype, chunk)
    Gc = jnp.asarray(G, compute_dtype)
    starts = jnp.arange(0, pos_c.shape[0], chunk)
    acc_blocks, phi_blocks = lax.map(
        lambda i0: _row_block_accel_phi(pos_c, mass_c, eps2, Gc, i0, chunk), starts
    )
    acc = acc_blocks.reshape(-1, 3)[:n].astype(pos.dtype)
    phi = phi_blocks.reshape(-1)[:n].astype(pos.dtype)
    return acc, phi


def _row_block_accel_jerk(pos_all, vel_all, mass_all, eps2, G, i0, chunk):
    pi = lax.dynamic_slice(pos_all, (i0, 0), (chunk, 3))
    vi = lax.dynamic_slice(vel_all, (i0, 0), (chunk, 3))
    dx = pos_all[None, :, 0] - pi[:, 0:1]
    dy = pos_all[None, :, 1] - pi[:, 1:2]
    dz = pos_all[None, :, 2] - pi[:, 2:3]
    dvx = vel_all[None, :, 0] - vi[:, 0:1]
    dvy = vel_all[None, :, 1] - vi[:, 1:2]
    dvz = vel_all[None, :, 2] - vi[:, 2:3]
    u = dx * dx + dy * dy + dz * dz + eps2
    safe_u = jnp.maximum(u, jnp.finfo(u.dtype).tiny)
    inv_r = jnp.where(u > 0, lax.rsqrt(safe_u), 0.0)
    w = (G * mass_all)[None, :] * inv_r * inv_r * inv_r
    rv = dx * dvx + dy * dvy + dz * dvz
    s = 3.0 * w * rv * jnp.where(u > 0, 1.0 / safe_u, 0.0)
    ax = jnp.sum(w * dx, axis=1)
    ay = jnp.sum(w * dy, axis=1)
    az = jnp.sum(w * dz, axis=1)
    jx = jnp.sum(w * dvx - s * dx, axis=1)
    jy = jnp.sum(w * dvy - s * dy, axis=1)
    jz = jnp.sum(w * dvz - s * dz, axis=1)
    return jnp.stack([ax, ay, az], axis=1), jnp.stack([jx, jy, jz], axis=1)


@functools.partial(jax.jit, static_argnames=("compute_dtype", "chunk"))
def accel_jerk(pos, vel, mass, eps=0.0, G=1.0, *, compute_dtype=jnp.float32,
               chunk=1024):
    """Blocked (accel, jerk) for the Hermite-4 stepper."""
    (pos_c, mass_c, vel_c), eps2, n, chunk = _prepare(
        pos, mass, eps, compute_dtype, chunk, vel=vel
    )
    Gc = jnp.asarray(G, compute_dtype)
    starts = jnp.arange(0, pos_c.shape[0], chunk)
    acc_blocks, jerk_blocks = lax.map(
        lambda i0: _row_block_accel_jerk(pos_c, vel_c, mass_c, eps2, Gc, i0, chunk),
        starts,
    )
    acc = acc_blocks.reshape(-1, 3)[:n].astype(pos.dtype)
    jerk = jerk_blocks.reshape(-1, 3)[:n].astype(pos.dtype)
    return acc, jerk
