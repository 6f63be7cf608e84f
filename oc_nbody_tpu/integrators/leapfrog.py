"""KDK leapfrog (kick–drift–kick), fixed timestep.

Capability parity: SURVEY.md §2.9a / §3.2 — the reference's leapfrog
stepper (BASELINE.json:5, :7). Symplectic and time-reversible; one force
evaluation per step (the closing kick's acceleration is cached and reused
as the next step's opening kick).

The whole step is a pure function carry -> carry; `advance` wraps k steps
in a lax.fori_loop so the hot loop is a single XLA computation
(SURVEY.md §3.1 "superstep").

Precision: positions/velocities update in the state dtype (f64 by default);
the force kernel internally computes in f32 on centred offsets.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from oc_nbody_tpu.forces import ForceModel
from oc_nbody_tpu.state import ParticleState


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class KDKCarry:
    state: ParticleState
    acc: jax.Array          # cached total acceleration at state.time
    n_steps: jax.Array      # int64 step counter

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class LeapfrogKDK:
    """Fixed-dt KDK leapfrog stepper."""

    force: ForceModel
    dt: float

    def init(self, state: ParticleState) -> KDKCarry:
        acc = self.force.accel(state.pos, state.mass).astype(state.pos.dtype)
        return KDKCarry(state=state, acc=acc,
                        n_steps=jnp.asarray(0, jnp.int64))

    def step(self, carry: KDKCarry) -> KDKCarry:
        s, acc = carry.state, carry.acc
        dt = jnp.asarray(self.dt, s.pos.dtype)
        v_half = s.vel + (0.5 * dt) * acc
        pos_new = s.pos + dt * v_half
        acc_new = self.force.accel(pos_new, s.mass).astype(s.pos.dtype)
        vel_new = v_half + (0.5 * dt) * acc_new
        state_new = s.replace(pos=pos_new, vel=vel_new, time=s.time + dt)
        return KDKCarry(state=state_new, acc=acc_new, n_steps=carry.n_steps + 1)

    def advance(self, carry: KDKCarry, n: int) -> KDKCarry:
        """n steps as one on-device loop (the superstep)."""
        return jax.lax.fori_loop(0, n, lambda _, c: self.step(c), carry)

    def advance_to(self, carry: KDKCarry, t_end) -> KDKCarry:
        """Step until state.time >= t_end (whole steps; fixed dt)."""
        def cond(c):
            return c.state.time < t_end - 1e-12 * jnp.abs(t_end)

        return jax.lax.while_loop(cond, lambda c: self.step(c), carry)

    def advance_to_bounded(self, carry: KDKCarry, t_end,
                           max_steps: int) -> KDKCarry:
        """advance_to with a per-dispatch step cap (driver loops on host)."""
        start = carry.n_steps

        def cond(c):
            return (c.state.time < t_end - 1e-12 * jnp.abs(t_end)) & (
                c.n_steps - start < max_steps)

        return jax.lax.while_loop(cond, lambda c: self.step(c), carry)

    def reached(self, carry: KDKCarry, t_end) -> bool:
        return float(carry.state.time) >= float(t_end) - 1e-12 * abs(float(t_end))

    # aux arrays that must survive a checkpoint for bitwise resume
    def checkpoint_aux(self, carry: KDKCarry) -> dict:
        return {"acc": carry.acc, "n_steps": carry.n_steps}

    def restore(self, state: ParticleState, aux: dict) -> KDKCarry:
        if "acc" in aux:
            return KDKCarry(state=state, acc=jnp.asarray(aux["acc"]),
                            n_steps=jnp.asarray(aux.get("n_steps", 0), jnp.int64))
        return self.init(state)
