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
  * sweeps the row tiles against slot k%2 (VPU force kernel, identical
    arithmetic to ops/pallas_gravity), overlapping the transfer,
  * waits send+recv, then tells its LEFT neighbour the just-swept slot is
    free to receive into at step k+1.

The explicit free-slot handshake (a REGULAR semaphore) is what bounds ring
skew: without it a fast left neighbour could overwrite a slot the local
chip is still sweeping (a genuine RDMA race — the interpret-mode test runs
with InterpretParams(detect_races=True) to prove the protocol).

LAYOUT: every per-particle vector array that persists across the ring —
rows in, accel/jerk out, Kahan compensation scratch — is stored TRANSPOSED
as (3, N). A (N, 3) f32 array in VMEM is tiled (8, 128) with 125 dead
lanes: 32 MiB at N=65536 (measured: two (N,3) comp scratches alone blew
the 16 MiB scoped-VMEM stack by 52 MiB). The (3, N) form pads sublanes
3->8 instead: 2 MiB. The row sweep needs (TI,1) column vectors, so each
row tile does a few (1,TI)<->(TI,1) relayout reshapes — O(TI) data
movement per O(TI*Ns) tile sweep, measured to lower and round-trip
correctly on hardware. The wrappers transpose at the XLA level (cheap,
outside the kernel) so the public API stays (N, 3).

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
    _inv_r, _round_up, _two_sum, COMPENSATED)

# Ring-jerk tiles: smaller than both the accel tiles (512x2048) and the
# plain jerk tiles (256x2048) — the jerk sweep holds ~2x more live (TI,TJ)
# temporaries than the accel sweep and the ring kernel adds its slab +
# compensation scratch on the same scoped stack (measured on hardware:
# 512x2048 needs 30.75M, 256x2048 needs 17.47M, vs the 16M limit).
TI_J = int(_os.environ.get("OCN_PALLAS_TI_RJ", 256))
TJ_J = int(_os.environ.get("OCN_PALLAS_TJ_RJ", 1024))

# Ring-accel tiles: the plain accel tiles (512x2048) hold ~3.6 live (TI,TJ)
# temporaries = 14.5 MiB, which together with the ring slab + comp scratch
# (~5 MiB at Ns=65536) exceeds the 16 MiB scoped stack (measured: 19.51M).
TI_R = int(_os.environ.get("OCN_PALLAS_TI_R", 256))
TJ_R = int(_os.environ.get("OCN_PALLAS_TJ_R", 2048))


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


def _accumulate(outT_ref, compT_ref, i0, ti, tileT, first, compensated):
    """Add a (3,TI) tile into the transposed accumulator (+ Kahan comp)."""
    sl = pl.ds(i0, ti)
    if first:
        outT_ref[:, sl] = tileT
        if compensated:
            compT_ref[:, sl] = jnp.zeros_like(tileT)
    elif compensated:
        t, c = _two_sum(outT_ref[:, sl], compT_ref[:, sl], tileT)
        outT_ref[:, sl] = t
        compT_ref[:, sl] = c
    else:
        outT_ref[:, sl] = outT_ref[:, sl] + tileT


def _ring_kernel(rowsT_ref, src_ref, gm_ref, eps2_ref, outT_ref,
                 buf_ref, compT_ref, send_sem, recv_sem, free_sem, *,
                 axis, d, guarded, compensated):
    """One invocation per chip; rowsT/src/gm are the chip's local shards
    in the transposed (components, N) layout."""
    ni = rowsT_ref.shape[1] // TI_R
    nsp = src_ref.shape[1]
    nj = nsp // TJ_R
    eps2 = eps2_ref[0, 0]

    # slot 0 <- local shard (positions rows 0-2, G*mass row 3)
    buf_ref[0, 0:3, :] = src_ref[:]
    buf_ref[0, 3:4, :] = gm_ref[:]

    right, left = _ring_enter(axis, d)

    def sweep(slot, first):
        """Accumulate forces on all row tiles from buf[slot] into outT."""
        def row_body(i, _):
            i0 = i * TI_R
            xi = rowsT_ref[0:1, pl.ds(i0, TI_R)].reshape(TI_R, 1)
            yi = rowsT_ref[1:2, pl.ds(i0, TI_R)].reshape(TI_R, 1)
            zi = rowsT_ref[2:3, pl.ds(i0, TI_R)].reshape(TI_R, 1)

            def j_body(j, carry):
                ax, ay, az = carry
                j0 = j * TJ_R
                dx = buf_ref[slot, 0:1, pl.ds(j0, TJ_R)] - xi
                dy = buf_ref[slot, 1:2, pl.ds(j0, TJ_R)] - yi
                dz = buf_ref[slot, 2:3, pl.ds(j0, TJ_R)] - zi
                u = dx * dx + dy * dy + dz * dz + eps2
                inv = _inv_r(u, guarded)
                w = buf_ref[slot, 3:4, pl.ds(j0, TJ_R)] * (inv * inv * inv)
                ax = ax + jnp.sum(w * dx, axis=1, keepdims=True)
                ay = ay + jnp.sum(w * dy, axis=1, keepdims=True)
                az = az + jnp.sum(w * dz, axis=1, keepdims=True)
                return ax, ay, az

            zero = jnp.zeros((TI_R, 1), jnp.float32)
            ax, ay, az = lax.fori_loop(0, nj, j_body, (zero, zero, zero))
            tileT = jnp.concatenate(
                [ax.reshape(1, TI_R), ay.reshape(1, TI_R),
                 az.reshape(1, TI_R)], axis=0)
            _accumulate(outT_ref, compT_ref, i0, TI_R, tileT, first,
                        compensated)
            return 0

        lax.fori_loop(0, ni, row_body, 0)

    _ring_steps(d, right, left, buf_ref, send_sem, recv_sem, free_sem,
                sweep)


def _ring_jerk_kernel(rowsT_ref, vrowsT_ref, src_ref, gm_ref, eps2_ref,
                      outT_ref, joutT_ref, buf_ref, acompT_ref, jcompT_ref,
                      send_sem, recv_sem, free_sem, *,
                      axis, d, guarded, compensated):
    """accel+jerk variant: the circulating slab carries positions (0-2),
    velocities (3-5) and G*mass (6); same handshake as _ring_kernel."""
    ni = rowsT_ref.shape[1] // TI_J
    nsp = src_ref.shape[1]
    nj = nsp // TJ_J
    eps2 = eps2_ref[0, 0]

    buf_ref[0, 0:6, :] = src_ref[:]
    buf_ref[0, 6:7, :] = gm_ref[:]

    right, left = _ring_enter(axis, d)

    def sweep(slot, first):
        def row_body(i, _):
            i0 = i * TI_J
            xi = rowsT_ref[0:1, pl.ds(i0, TI_J)].reshape(TI_J, 1)
            yi = rowsT_ref[1:2, pl.ds(i0, TI_J)].reshape(TI_J, 1)
            zi = rowsT_ref[2:3, pl.ds(i0, TI_J)].reshape(TI_J, 1)
            vxi = vrowsT_ref[0:1, pl.ds(i0, TI_J)].reshape(TI_J, 1)
            vyi = vrowsT_ref[1:2, pl.ds(i0, TI_J)].reshape(TI_J, 1)
            vzi = vrowsT_ref[2:3, pl.ds(i0, TI_J)].reshape(TI_J, 1)

            def j_body(j, carry):
                ax, ay, az, jx, jy, jz = carry
                j0 = j * TJ_J
                dx = buf_ref[slot, 0:1, pl.ds(j0, TJ_J)] - xi
                dy = buf_ref[slot, 1:2, pl.ds(j0, TJ_J)] - yi
                dz = buf_ref[slot, 2:3, pl.ds(j0, TJ_J)] - zi
                dvx = buf_ref[slot, 3:4, pl.ds(j0, TJ_J)] - vxi
                dvy = buf_ref[slot, 4:5, pl.ds(j0, TJ_J)] - vyi
                dvz = buf_ref[slot, 5:6, pl.ds(j0, TJ_J)] - vzi
                u = dx * dx + dy * dy + dz * dz + eps2
                inv = _inv_r(u, guarded)
                w = buf_ref[slot, 6:7, pl.ds(j0, TJ_J)] * (inv * inv * inv)
                rv = dx * dvx + dy * dvy + dz * dvz
                s = (jnp.float32(3.0) * rv) * w * (inv * inv)
                ax = ax + jnp.sum(w * dx, axis=1, keepdims=True)
                ay = ay + jnp.sum(w * dy, axis=1, keepdims=True)
                az = az + jnp.sum(w * dz, axis=1, keepdims=True)
                jx = jx + jnp.sum(w * dvx - s * dx, axis=1, keepdims=True)
                jy = jy + jnp.sum(w * dvy - s * dy, axis=1, keepdims=True)
                jz = jz + jnp.sum(w * dvz - s * dz, axis=1, keepdims=True)
                return ax, ay, az, jx, jy, jz

            zero = jnp.zeros((TI_J, 1), jnp.float32)
            ax, ay, az, jx, jy, jz = lax.fori_loop(
                0, nj, j_body, (zero,) * 6)
            atileT = jnp.concatenate(
                [ax.reshape(1, TI_J), ay.reshape(1, TI_J),
                 az.reshape(1, TI_J)], axis=0)
            jtileT = jnp.concatenate(
                [jx.reshape(1, TI_J), jy.reshape(1, TI_J),
                 jz.reshape(1, TI_J)], axis=0)
            _accumulate(outT_ref, acompT_ref, i0, TI_J, atileT, first,
                        compensated)
            _accumulate(joutT_ref, jcompT_ref, i0, TI_J, jtileT, first,
                        compensated)
            return 0

        lax.fori_loop(0, ni, row_body, 0)

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
                pltpu.VMEM((2, 4, nsp), jnp.float32),   # double buffer
                pltpu.VMEM((3, nrp), jnp.float32),      # Kahan comp
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
def accel_jerk_ring(pos_local, vel_local, mass_local, eps, G=1.0, *,
                    axis: str, d: int, guarded: bool = True,
                    compensated=None):
    """(accel, jerk) on this chip's rows from ALL shards via the RDMA ring
    (Hermite-4 / block-timestep force evaluation at scale)."""
    if compensated is None:
        compensated = COMPENSATED
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
                pltpu.VMEM((2, 7, nsp), jnp.float32),   # pos+vel+gm slab
                pltpu.VMEM((3, nrp), jnp.float32),      # accel Kahan comp
                pltpu.VMEM((3, nrp), jnp.float32),      # jerk Kahan comp
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
