"""RDMA ring force kernel: the whole D-step ring lives INSIDE one Pallas
kernel, with inter-chip transfers issued as explicit `make_async_remote_copy`
RDMAs that overlap the force computation on the current source shard.

This is the TPU-native alternative to the XLA-collective ring in
parallel/force.py (lax.ppermute between shard-local kernel calls): instead
of returning to XLA between ring steps, each chip keeps a double-buffered
(2, 4, Ns) VMEM slab [rows 0-2 = source positions, row 3 = G*mass] and, at
ring step k,

  * waits for its RIGHT neighbour to declare slot 1-k%2 free,
  * starts the RDMA of slot k%2 into the right neighbour's slot 1-k%2,
  * sweeps the row tiles against slot k%2 (VPU force kernel, identical
    arithmetic to ops/pallas_gravity), overlapping the transfer,
  * waits send+recv, then tells its LEFT neighbour the just-swept slot is
    free to receive into at step k+1.

The explicit free-slot handshake (a REGULAR semaphore) is what bounds ring
skew: without it a fast left neighbour could overwrite a slot the local
chip is still sweeping (a genuine RDMA race — the interpret-mode test runs
with InterpretParams(detect_races=True) to prove the protocol).

Capability parity: SURVEY.md §3.5 ring decomposition / §5 "long-context";
BASELINE.json:11. Validated via the TPU interpreter on the emulated CPU
mesh (tests/distributed/test_rdma_ring.py); selected on hardware with
ShardedForce(mode="rdma").

The ring-step loop is a Python unroll over D (static mesh size): fine for
pod-slice rings (D <= 256); each step adds one RDMA + one tile sweep to
the kernel body.
"""
from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from oc_nbody_tpu.ops.pallas_gravity import (
    TI_A, TJ_A, _inv_r, _pad_rows, _round_up, _two_sum, COMPENSATED)

# Interpret-mode switch (read at call time, like ops.pallas_gravity._call).
# Remote DMAs and semaphores need the TPU interpreter (InterpretParams),
# not the generic interpret=True. detect_races costs time; the dedicated
# race test opts in via _interpret_params().
def _interpret_params():
    if _os.environ.get("OCN_PALLAS_INTERPRET") == "1":
        races = _os.environ.get("OCN_PALLAS_DETECT_RACES") == "1"
        return pltpu.InterpretParams(detect_races=races)
    return False


def _ring_kernel(rows_ref, src_ref, gm_ref, eps2_ref, out_ref,
                 buf_ref, comp_ref, send_sem, recv_sem, free_sem, *,
                 axis, d, guarded, compensated):
    """One invocation per chip; rows/src/gm are the chip's local shards."""
    ni = rows_ref.shape[0] // TI_A
    nsp = src_ref.shape[1]
    nj = nsp // TJ_A
    eps2 = eps2_ref[0, 0]

    my = lax.axis_index(axis)
    right = lax.rem(my + 1, d)
    left = lax.rem(my + d - 1, d)

    # slot 0 <- local shard (positions rows 0-2, G*mass row 3)
    buf_ref[0, 0:3, :] = src_ref[:]
    buf_ref[0, 3:4, :] = gm_ref[:]

    if d > 1:
        # Start barrier: no chip may RDMA until every neighbour has entered
        # the kernel (its buf/semaphores are live).
        barrier = pltpu.get_barrier_semaphore()
        pltpu.semaphore_signal(barrier, inc=1, device_id=left,
                               device_id_type=pltpu.DeviceIdType.LOGICAL)
        pltpu.semaphore_signal(barrier, inc=1, device_id=right,
                               device_id_type=pltpu.DeviceIdType.LOGICAL)
        pltpu.semaphore_wait(barrier, 2)
        # slot 1 has never been used: tell LEFT it may send into it (step 0)
        pltpu.semaphore_signal(free_sem, inc=1, device_id=left,
                               device_id_type=pltpu.DeviceIdType.LOGICAL)

    def sweep(slot, first):
        """Accumulate forces on all row tiles from buf[slot] into out_ref."""
        def row_body(i, _):
            i0 = i * TI_A
            xi = rows_ref[pl.ds(i0, TI_A), 0:1]
            yi = rows_ref[pl.ds(i0, TI_A), 1:2]
            zi = rows_ref[pl.ds(i0, TI_A), 2:3]

            def j_body(j, carry):
                ax, ay, az = carry
                j0 = j * TJ_A
                dx = buf_ref[slot, 0:1, pl.ds(j0, TJ_A)] - xi
                dy = buf_ref[slot, 1:2, pl.ds(j0, TJ_A)] - yi
                dz = buf_ref[slot, 2:3, pl.ds(j0, TJ_A)] - zi
                u = dx * dx + dy * dy + dz * dz + eps2
                inv = _inv_r(u, guarded)
                w = buf_ref[slot, 3:4, pl.ds(j0, TJ_A)] * (inv * inv * inv)
                ax = ax + jnp.sum(w * dx, axis=1, keepdims=True)
                ay = ay + jnp.sum(w * dy, axis=1, keepdims=True)
                az = az + jnp.sum(w * dz, axis=1, keepdims=True)
                return ax, ay, az

            zero = jnp.zeros((TI_A, 1), jnp.float32)
            ax, ay, az = lax.fori_loop(0, nj, j_body, (zero, zero, zero))
            tile = jnp.concatenate([ax, ay, az], axis=1)
            if first:
                out_ref[pl.ds(i0, TI_A), :] = tile
                if compensated:
                    comp_ref[pl.ds(i0, TI_A), :] = jnp.zeros_like(tile)
            elif compensated:
                t, c = _two_sum(out_ref[pl.ds(i0, TI_A), :],
                                comp_ref[pl.ds(i0, TI_A), :], tile)
                out_ref[pl.ds(i0, TI_A), :] = t
                comp_ref[pl.ds(i0, TI_A), :] = c
            else:
                out_ref[pl.ds(i0, TI_A), :] = (
                    out_ref[pl.ds(i0, TI_A), :] + tile)
            return 0

        lax.fori_loop(0, ni, row_body, 0)

    for k in range(d):
        slot = k % 2
        rdma = None
        if k < d - 1:
            # right's receive slot must be free before we write it
            pltpu.semaphore_wait(free_sem, 1)
            rdma = pltpu.make_async_remote_copy(
                src_ref=buf_ref.at[slot],
                dst_ref=buf_ref.at[1 - slot],
                send_sem=send_sem,
                recv_sem=recv_sem,
                device_id=right,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )
            rdma.start()
        sweep(slot, first=(k == 0))  # compute overlaps the transfer
        if rdma is not None:
            rdma.wait()  # our send drained AND left's shard arrived
            if k + 1 < d - 1:
                # buf[slot] is fully swept and fully sent: it is step k+1's
                # receive target — release it to LEFT
                pltpu.semaphore_signal(
                    free_sem, inc=1, device_id=left,
                    device_id_type=pltpu.DeviceIdType.LOGICAL)


@functools.partial(
    jax.jit, static_argnames=("axis", "d", "guarded", "compensated"))
def accel_ring(pos_local, mass_local, eps, G=1.0, *, axis: str, d: int,
               guarded: bool = True, compensated=None):
    """Per-shard entry point, called INSIDE shard_map: returns the total
    pairwise accel on this chip's rows from ALL shards, circulated by RDMA.
    f32 in (already centred, see gravity.prepare_f32), f32 out."""
    if compensated is None:
        compensated = COMPENSATED
    nr = pos_local.shape[0]
    nrp = _round_up(max(nr, TI_A), TI_A)
    rows = _pad_rows(pos_local, nrp)
    ns = pos_local.shape[0]
    nsp = _round_up(max(ns, TJ_A), TJ_A)
    srcT = jnp.pad(pos_local.T, ((0, 0), (0, nsp - ns)))
    gm = jnp.pad((jnp.asarray(G, jnp.float32) * mass_local)[None, :],
                 ((0, 0), (0, nsp - ns)))
    eps2 = jnp.asarray(eps, jnp.float32).reshape(1, 1) ** 2

    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(_ring_kernel, axis=axis, d=d, guarded=guarded,
                              compensated=compensated),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nrp, 3), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, 4, nsp), jnp.float32),   # double buffer
                pltpu.VMEM((nrp, 3), jnp.float32),      # Kahan comp
                pltpu.SemaphoreType.DMA,                # send
                pltpu.SemaphoreType.DMA,                # recv
                pltpu.SemaphoreType.REGULAR,            # free-slot handshake
            ],
            # collective_id names the barrier-semaphore group; Mosaic
            # rejects it when the kernel uses no barrier (the d=1 body)
            compiler_params=pltpu.CompilerParams(
                collective_id=0) if d > 1 else None,
            interpret=_interpret_params(),
            cost_estimate=pl.CostEstimate(
                flops=22 * nrp * nsp * d,
                bytes_accessed=(nrp + nsp * d) * 16,
                transcendentals=nrp * nsp * d,
            ),
        )(rows, srcT, gm, eps2)
    return out[:nr]
