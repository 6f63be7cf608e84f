"""Particle state: struct-of-arrays pytree resident in HBM.

Capability parity: SURVEY.md §2.2 — the reference's scene/state API over
(pos/vel/mass/id) per BASELINE.json:5. Here the state is a frozen dataclass
registered as a JAX pytree so it flows through jit/vmap/shard_map untouched.

Positions/velocities default to float64 (see package docstring for the
precision policy); masses and ids are f32/int32 — they are only ever read by
the f32 force kernel and the diagnostics.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ParticleState:
    """Struct-of-arrays particle state.

    Attributes:
      pos:  (N, 3) positions, float64 by default.
      vel:  (N, 3) velocities, float64 by default.
      mass: (N,) masses, float32.
      ids:  (N,) stable particle identifiers, int32.
      time: scalar simulation time, float64.
    """

    pos: jax.Array
    vel: jax.Array
    mass: jax.Array
    ids: jax.Array
    time: jax.Array

    @property
    def n(self) -> int:
        return self.pos.shape[0]

    @property
    def total_mass(self) -> jax.Array:
        return jnp.sum(self.mass.astype(jnp.float64))

    def com(self) -> jax.Array:
        """Centre of mass, (3,) float64."""
        m = self.mass.astype(jnp.float64)
        return jnp.sum(self.pos * m[:, None], axis=0) / jnp.sum(m)

    def com_vel(self) -> jax.Array:
        m = self.mass.astype(jnp.float64)
        return jnp.sum(self.vel * m[:, None], axis=0) / jnp.sum(m)

    def shifted(self, dpos=None, dvel=None) -> "ParticleState":
        """Return a copy translated in phase space (orbit placement)."""
        new = self
        if dpos is not None:
            new = dataclasses.replace(new, pos=new.pos + jnp.asarray(dpos, new.pos.dtype))
        if dvel is not None:
            new = dataclasses.replace(new, vel=new.vel + jnp.asarray(dvel, new.vel.dtype))
        return new

    def replace(self, **kw) -> "ParticleState":
        return dataclasses.replace(self, **kw)


def make_state(
    pos,
    vel,
    mass,
    ids: Optional[jax.Array] = None,
    time: float = 0.0,
    state_dtype=jnp.float64,
) -> ParticleState:
    """Build a ParticleState with canonical dtypes."""
    pos = jnp.asarray(pos, state_dtype)
    vel = jnp.asarray(vel, state_dtype)
    mass = jnp.asarray(mass, jnp.float32)
    n = pos.shape[0]
    if pos.shape != (n, 3) or vel.shape != (n, 3) or mass.shape != (n,):
        raise ValueError(
            f"bad shapes: pos {pos.shape}, vel {vel.shape}, mass {mass.shape}"
        )
    if ids is None:
        ids = jnp.arange(n, dtype=jnp.int32)
    else:
        ids = jnp.asarray(ids, jnp.int32)
    return ParticleState(pos=pos, vel=vel, mass=mass, ids=ids,
                         time=jnp.asarray(time, jnp.float64))
