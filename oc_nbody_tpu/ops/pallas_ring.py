"""RDMA ring force kernel: the whole D-step ring lives INSIDE one Pallas
kernel, with inter-chip transfers issued as explicit `make_async_remote_copy`
RDMAs that overlap the force computation on the current source shard.

This is the TPU-native alternative to the XLA-collective ring in
parallel/force.py (lax.ppermute between shard-local kernel calls): instead
of returning to XLA between ring steps, each chip keeps a double-buffered
(2, C, Ns) VMEM slab [C=4: source positions + G*mass; C=7 for the jerk
variant: + velocities] and, at ring step k,

  * waits for its RIGHT neighbour to declare slot 1-k%2 free,
  * starts the RDMA of slot k%2 into the right neighbour's slot 1-k%2,
  * sweeps the row tiles against slot k%2, overlapping the transfer,
  * waits send+recv, then tells its LEFT neighbour the just-swept slot is
    free to receive into at step k+1.

The explicit free-slot handshake (a REGULAR semaphore) is what bounds ring
skew: without it a fast left neighbour could overwrite a slot the local
chip is still sweeping (a genuine RDMA race — the interpret-mode test runs
with InterpretParams(detect_races=True) to prove the protocol).

The per-shard arithmetic IS the transposed monolithic sweep of
ops/pallas_gravity (`_sweep_t_accel` / `_sweep_t_jerk`): the ring binds
the sweep's `read` closure to its circulating slab, the single-chip
kernels bind it to their input refs. The transposed (3, N) layout for
rows/outputs/compensation is what keeps the ring's persistent state off
the 16 MiB scoped-VMEM stack (a (N,3) array is lane-padded to 32 MiB at
N=65k — measured to OOM; (3, N) sublane-pads to 2 MiB). At d == 1 the
slab and the initial copy are skipped entirely (reads go straight to the
input refs), so a 1-device mesh pays nothing for the ring machinery.

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
    _round_up, _sweep_t_accel, _sweep_t_jerk, _sweep_t_phi, COMPENSATED)

# Ring tile sizes. The ring kernel's slab + compensation scratch live on
# the same 16 MiB scoped-VMEM stack as the sweep temporaries, so its tiles
# are smaller than the single-kernel ones (measured OOMs on hardware:
# accel 512x2048 -> 19.51M; jerk 512x2048 -> 30.75M, 256x2048 -> 17.47M).
TI_R = int(_os.environ.get("OCN_PALLAS_TI_R", 256))
TJ_R = int(_os.environ.get("OCN_PALLAS_TJ_R", 2048))
TI_J = int(_os.environ.get("OCN_PALLAS_TI_RJ", 256))
TJ_J = int(_os.environ.get("OCN_PALLAS_TJ_RJ", 1024))


# Interpret-mode switch (read at call time, like ops.pallas_gravity._call).
# Remote DMAs and semaphores need the TPU interpreter (InterpretParams),
# not the generic interpret=True. detect_races costs time; the dedicated
# race test opts in via _interpret_params().
def _interpret_params():
    if _os.environ.get("OCN_PALLAS_INTERPRET") == "1":
        races = _os.environ.get("OCN_PALLAS_DETECT_RACES") == "1"
        return pltpu.InterpretParams(detect_races=races)
    return False


def _pad_cols(aT, n_pad):
    n = aT.shape[1]
    if n == n_pad:
        return aT
    return jnp.pad(aT, ((0, 0), (0, n_pad - n)))


def _ring_enter(axis, d):
    """Start barrier; returns (right, left) neighbour ids."""
    my = lax.axis_index(axis)
    right = lax.rem(my + 1, d)
    left = lax.rem(my + d - 1, d)
    if d > 1:
        # Start barrier: no chip may RDMA until every neighbour has entered
        # the kernel (its buf/semaphores are live).
        barrier = pltpu.get_barrier_semaphore()
        pltpu.semaphore_signal(barrier, inc=1, device_id=left,
                               device_id_type=pltpu.DeviceIdType.LOGICAL)
        pltpu.semaphore_signal(barrier, inc=1, device_id=right,
                               device_id_type=pltpu.DeviceIdType.LOGICAL)
        pltpu.semaphore_wait(barrier, 2)
    return right, left


def _ring_steps(d, right, left, buf_ref, send_sem, recv_sem, free_sem,
                sweep):
    """The D-step ring schedule shared by both kernels: RDMA slot k%2 to
    the right neighbour while sweeping it, free-slot handshake bounding
    skew."""
    if d > 1:
        # slot 1 has never been used: tell LEFT it may send into it (step 0)
        pltpu.semaphore_signal(free_sem, inc=1, device_id=left,
                               device_id_type=pltpu.DeviceIdType.LOGICAL)
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


def _ring_kernel(rowsT_ref, src_ref, gm_ref, eps2_ref, outT_ref,
                 buf_ref, compT_ref, send_sem, recv_sem, free_sem, *,
                 axis, d, guarded, compensated):
    """One invocation per chip; rowsT/src/gm are the chip's local shards
    in the transposed (components, N) layout."""
    nsp = src_ref.shape[1]
    eps2 = eps2_ref[0, 0]

    if d > 1:
        # slot 0 <- local shard (positions rows 0-2, G*mass row 3)
        buf_ref[0, 0:3, :] = src_ref[:]
        buf_ref[0, 3:4, :] = gm_ref[:]

    right, left = _ring_enter(axis, d)

    def sweep(slot, first):
        if d > 1:
            def read(c, j0):
                return buf_ref[slot, c:c + 1, pl.ds(j0, TJ_R)]
        else:
            # d == 1: no circulation — sweep straight off the input refs
            def read(c, j0):
                if c == 3:
                    return gm_ref[0:1, pl.ds(j0, TJ_R)]
                return src_ref[c:c + 1, pl.ds(j0, TJ_R)]

        _sweep_t_accel(rowsT_ref, read, outT_ref, compT_ref, eps2,
                       ti=TI_R, tj=TJ_R, nj=nsp // TJ_R, first=first,
                       guarded=guarded, compensated=compensated)

    _ring_steps(d, right, left, buf_ref, send_sem, recv_sem, free_sem,
                sweep)


def _ring_phi_kernel(rowsT_ref, src_ref, gm_ref, eps2_ref, outT_ref,
                     phi_ref, buf_ref, acompT_ref, pcomp_ref,
                     send_sem, recv_sem, free_sem, *,
                     axis, d, guarded, compensated):
    """accel+potential variant (diagnostics at scale): same slab layout as
    the accel ring (positions 0-2, G*mass 3); phi accumulates as (1, N)."""
    nsp = src_ref.shape[1]
    eps2 = eps2_ref[0, 0]

    if d > 1:
        buf_ref[0, 0:3, :] = src_ref[:]
        buf_ref[0, 3:4, :] = gm_ref[:]

    right, left = _ring_enter(axis, d)

    def sweep(slot, first):
        if d > 1:
            def read(c, j0):
                return buf_ref[slot, c:c + 1, pl.ds(j0, TJ_R)]
        else:
            def read(c, j0):
                if c == 3:
                    return gm_ref[0:1, pl.ds(j0, TJ_R)]
                return src_ref[c:c + 1, pl.ds(j0, TJ_R)]

        _sweep_t_phi(rowsT_ref, read, outT_ref, phi_ref, acompT_ref,
                     pcomp_ref, eps2, ti=TI_R, tj=TJ_R, nj=nsp // TJ_R,
                     first=first, guarded=guarded, compensated=compensated)

    _ring_steps(d, right, left, buf_ref, send_sem, recv_sem, free_sem,
                sweep)


def _ring_jerk_kernel(rowsT_ref, vrowsT_ref, src_ref, gm_ref, eps2_ref,
                      outT_ref, joutT_ref, buf_ref, acompT_ref, jcompT_ref,
                      send_sem, recv_sem, free_sem, *,
                      axis, d, guarded, compensated):
    """accel+jerk variant: the circulating slab carries positions (0-2),
    velocities (3-5) and G*mass (6); same handshake as _ring_kernel."""
    nsp = src_ref.shape[1]
    eps2 = eps2_ref[0, 0]

    if d > 1:
        buf_ref[0, 0:6, :] = src_ref[:]
        buf_ref[0, 6:7, :] = gm_ref[:]

    right, left = _ring_enter(axis, d)

    def sweep(slot, first):
        if d > 1:
            def read(c, j0):
                return buf_ref[slot, c:c + 1, pl.ds(j0, TJ_J)]
        else:
            def read(c, j0):
                if c == 6:
                    return gm_ref[0:1, pl.ds(j0, TJ_J)]
                return src_ref[c:c + 1, pl.ds(j0, TJ_J)]

        _sweep_t_jerk(rowsT_ref, vrowsT_ref, read, outT_ref, joutT_ref,
                      acompT_ref, jcompT_ref, eps2,
                      ti=TI_J, tj=TJ_J, nj=nsp // TJ_J, first=first,
                      guarded=guarded, compensated=compensated)

    _ring_steps(d, right, left, buf_ref, send_sem, recv_sem, free_sem,
                sweep)


@functools.partial(
    jax.jit, static_argnames=("axis", "d", "guarded", "compensated"))
def accel_ring(pos_local, mass_local, eps, G=1.0, *, axis: str, d: int,
               guarded: bool = True, compensated=None):
    """Per-shard entry point, called INSIDE shard_map: returns the total
    pairwise accel on this chip's rows from ALL shards, circulated by RDMA.
    f32 in (already centred, see gravity.prepare_f32), f32 out."""
    if compensated is None:
        compensated = COMPENSATED
    compensated = compensated and d > 1  # one sweep at d==1: nothing to compensate
    nr = pos_local.shape[0]
    nrp = _round_up(max(nr, TI_R), TI_R)
    posT = pos_local.astype(jnp.float32).T
    rowsT = _pad_cols(posT, nrp)
    nsp = _round_up(max(nr, TJ_R), TJ_R)
    srcT = _pad_cols(posT, nsp)
    gm = _pad_cols((jnp.asarray(G, jnp.float32)
                    * mass_local.astype(jnp.float32))[None, :], nsp)
    eps2 = jnp.asarray(eps, jnp.float32).reshape(1, 1) ** 2

    with jax.enable_x64(False):
        outT = pl.pallas_call(
            functools.partial(_ring_kernel, axis=axis, d=d, guarded=guarded,
                              compensated=compensated),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((3, nrp), jnp.float32),
            scratch_shapes=[
                # double-buffered slab; dummy-sized when d==1 (unused)
                pltpu.VMEM((2, 4, nsp) if d > 1 else (1, 1, 128),
                           jnp.float32),
                pltpu.VMEM((3, nrp) if compensated else (1, 1, 128),
                           jnp.float32),                # Kahan comp
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
        )(rowsT, srcT, gm, eps2)
    return outT[:, :nr].T


@functools.partial(
    jax.jit, static_argnames=("axis", "d", "guarded", "compensated"))
def accel_potential_ring(pos_local, mass_local, eps, G=1.0, *, axis: str,
                         d: int, guarded: bool = True, compensated=None):
    """(accel, phi_pair) on this chip's rows from ALL shards via the RDMA
    ring — the sharded-diagnostics force+energy evaluation. When eps > 0
    phi INCLUDES the softened self term -G*m/eps (self pairs have
    u = eps^2 > 0, unmasked); the caller cancels it by adding
    ``gravity.self_phi``, same
    contract as accel_potential_rows."""
    if compensated is None:
        compensated = COMPENSATED
    compensated = compensated and d > 1
    nr = pos_local.shape[0]
    nrp = _round_up(max(nr, TI_R), TI_R)
    posT = pos_local.astype(jnp.float32).T
    rowsT = _pad_cols(posT, nrp)
    nsp = _round_up(max(nr, TJ_R), TJ_R)
    srcT = _pad_cols(posT, nsp)
    gm = _pad_cols((jnp.asarray(G, jnp.float32)
                    * mass_local.astype(jnp.float32))[None, :], nsp)
    eps2 = jnp.asarray(eps, jnp.float32).reshape(1, 1) ** 2

    with jax.enable_x64(False):
        outT, phi = pl.pallas_call(
            functools.partial(_ring_phi_kernel, axis=axis, d=d,
                              guarded=guarded, compensated=compensated),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM)),
            out_shape=(jax.ShapeDtypeStruct((3, nrp), jnp.float32),
                       jax.ShapeDtypeStruct((1, nrp), jnp.float32)),
            scratch_shapes=[
                pltpu.VMEM((2, 4, nsp) if d > 1 else (1, 1, 128),
                           jnp.float32),                # slab
                pltpu.VMEM((3, nrp) if compensated else (1, 1, 128),
                           jnp.float32),                # accel Kahan comp
                pltpu.VMEM((1, nrp) if compensated else (1, 1, 128),
                           jnp.float32),                # phi Kahan comp
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.REGULAR,
            ],
            compiler_params=pltpu.CompilerParams(
                collective_id=0) if d > 1 else None,
            interpret=_interpret_params(),
            cost_estimate=pl.CostEstimate(
                flops=26 * nrp * nsp * d,
                bytes_accessed=(nrp + nsp * d) * 16,
                transcendentals=nrp * nsp * d,
            ),
        )(rowsT, srcT, gm, eps2)
    return outT[:, :nr].T, phi[0, :nr]


@functools.partial(
    jax.jit, static_argnames=("axis", "d", "guarded", "compensated"))
def accel_jerk_ring(pos_local, vel_local, mass_local, eps, G=1.0, *,
                    axis: str, d: int, guarded: bool = True,
                    compensated=None):
    """(accel, jerk) on this chip's rows from ALL shards via the RDMA ring
    (Hermite-4 / block-timestep force evaluation at scale)."""
    if compensated is None:
        compensated = COMPENSATED
    compensated = compensated and d > 1
    nr = pos_local.shape[0]
    nrp = _round_up(max(nr, TI_J), TI_J)
    posT = pos_local.astype(jnp.float32).T
    velT = vel_local.astype(jnp.float32).T
    rowsT = _pad_cols(posT, nrp)
    vrowsT = _pad_cols(velT, nrp)
    nsp = _round_up(max(nr, TJ_J), TJ_J)
    srcT = _pad_cols(jnp.concatenate([posT, velT], axis=0), nsp)
    gm = _pad_cols((jnp.asarray(G, jnp.float32)
                    * mass_local.astype(jnp.float32))[None, :], nsp)
    eps2 = jnp.asarray(eps, jnp.float32).reshape(1, 1) ** 2

    with jax.enable_x64(False):
        accT, jerkT = pl.pallas_call(
            functools.partial(_ring_jerk_kernel, axis=axis, d=d,
                              guarded=guarded, compensated=compensated),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM)),
            out_shape=(jax.ShapeDtypeStruct((3, nrp), jnp.float32),
                       jax.ShapeDtypeStruct((3, nrp), jnp.float32)),
            scratch_shapes=[
                pltpu.VMEM((2, 7, nsp) if d > 1 else (1, 1, 128),
                           jnp.float32),                # pos+vel+gm slab
                pltpu.VMEM((3, nrp) if compensated else (1, 1, 128),
                           jnp.float32),                # accel Kahan comp
                pltpu.VMEM((3, nrp) if compensated else (1, 1, 128),
                           jnp.float32),                # jerk Kahan comp
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.REGULAR,
            ],
            compiler_params=pltpu.CompilerParams(
                collective_id=0) if d > 1 else None,
            interpret=_interpret_params(),
            cost_estimate=pl.CostEstimate(
                flops=50 * nrp * nsp * d,
                bytes_accessed=(nrp + nsp * d) * 32,
                transcendentals=nrp * nsp * d,
            ),
        )(rowsT, vrowsT, srcT, gm, eps2)
    return accT[:, :nr].T, jerkT[:, :nr].T
