"""Pallas TPU kernels for the O(N²) pairwise force (SURVEY.md §7 M5).

The TPU-native equivalent of the reference's native inner loop
(BASELINE.json:5 "tiled Pallas MXU kernel"). Design notes:

  * **Layouts.** Sources live in VMEM as (3, N) + (1, N) G·mass — the lane
    dimension is N, so a source tile broadcasts along lanes with zero
    relayout. Row tiles arrive as (TI, 3) blocks (sublane dimension TI), so
    per-row scalars are natural (TI, 1) columns. Positions for N=131k are
    only 1.6 MB — the entire source set stays VMEM-resident; no HBM traffic
    inside the sweep.
  * **VPU, not MXU, for r².** The |r_i|²+|r_j|²−2r_i·r_j matmul
    formulation loses ~4 decimal digits to cancellation (measured,
    SURVEY.md §6) and needs 6-pass f32 MXU matmuls. Direct
    dx = x_j − x_i subtraction on the VPU is exact in f32 and the ~20
    flops/pair run at VPU rate, which already exceeds the 1e10
    interactions/s target by an order of magnitude.
  * **Accumulation.** Per j-tile partial sums are reduced by XLA's tree
    reduction along lanes and accumulated across tiles in f32 carries;
    error growth ~ sqrt(num_tiles)·eps_f32 ≈ 1e-6 relative — inside the
    |dE/E| < 1e-6 budget once the O(N) state math is f64.
  * Softened self-pairs (r = 0) produce exactly 0 via the u > 0 guard, so
    rows may overlap sources freely — the same contract as
    ops.gravity.accel_rows, making these kernels drop-in for the
    single-chip and shard_map paths alike.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from oc_nbody_tpu.ops.gravity import prepare_f32, self_phi

# Row/source tile sizes. TI*TJ f32 temporaries must fit the 16 MB scoped
# VMEM (measured limit: 512x1024 and 256x4096 jerk tiles OOM at 18/26 MB).
# Chain-timed sweep on the v5 lite (bench/tile_sweep.py, N=65536, jerk):
#   256x1024 53.7 ms | 256x2048 52.2 ms | 128x2048 52.1 ms | 128x4096 58.2 ms
# -> 256x2048 default (+3% over round 1). Env-overridable for sweeps.
import os as _os

TI = int(_os.environ.get("OCN_PALLAS_TI", 256))
TJ = int(_os.environ.get("OCN_PALLAS_TJ", 2048))
# accel-only tiles: fewer live temporaries than the jerk kernel, so larger
# tiles fit VMEM and measure ~3.5% faster (chain-timed sweep, v5e)
TI_A = int(_os.environ.get("OCN_PALLAS_TI_A", 512))
TJ_A = int(_os.environ.get("OCN_PALLAS_TJ_A", 2048))

# pallas_call, invoked with x64 disabled: kernel data is all-f32 and Mosaic
# requires i32 index arithmetic, which x64 tracing would promote to i64.
# OCN_PALLAS_INTERPRET=1 runs the kernels through the Pallas interpreter
# (CPU-runnable: tests/unit/test_pallas_interpret.py and the sharded-pallas
# tests in tests/distributed/). The env var is read at CALL time, so tests
# and dryrun_multichip can flip it after import — one switch, no import-time
# snapshot to rot.
def _call(kernel, **kwargs):
    if _os.environ.get("OCN_PALLAS_INTERPRET") == "1":
        kwargs["interpret"] = True
    return pl.pallas_call(kernel, **kwargs)


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _pad_rows(a, n_pad):
    n = a.shape[0]
    if n == n_pad:
        return a
    return jnp.pad(a, ((0, n_pad - n),) + ((0, 0),) * (a.ndim - 1))


def _src_layout(src_pos, src_mass, G, tj=None):
    """(3, NSp) positions and (1, NSp) G·mass, zero-padded to a TJ multiple."""
    tj = tj or TJ
    ns = src_pos.shape[0]
    nsp = _round_up(max(ns, tj), tj)
    srcT = jnp.pad(src_pos.T, ((0, 0), (0, nsp - ns)))
    gm = jnp.pad((G * src_mass)[None, :], ((0, 0), (0, nsp - ns)))
    return srcT, gm, nsp


def _inv_r(u, guarded: bool):
    """Zero-guarded rsqrt. guarded=False is valid only when eps > 0 (then
    u >= eps^2 > 0 everywhere) and saves a compare+select+max per pair."""
    if guarded:
        tiny = jnp.float32(1.1754944e-38)
        return jnp.where(u > 0, jax.lax.rsqrt(jnp.maximum(u, tiny)), 0.0)
    return jax.lax.rsqrt(u)


# --------------------------------------------------------------------------
# accel
# --------------------------------------------------------------------------

def _accel_kernel(rows_ref, src_ref, gm_ref, eps2_ref, out_ref, *, guarded):
    ti = rows_ref.shape[0]
    ns = src_ref.shape[1]
    TJ = TJ_A
    xi = rows_ref[:, 0:1]
    yi = rows_ref[:, 1:2]
    zi = rows_ref[:, 2:3]
    eps2 = eps2_ref[0, 0]

    def body(j, carry):
        ax, ay, az = carry
        j0 = j * TJ
        sx = src_ref[0:1, pl.ds(j0, TJ)]
        sy = src_ref[1:2, pl.ds(j0, TJ)]
        sz = src_ref[2:3, pl.ds(j0, TJ)]
        dx = sx - xi
        dy = sy - yi
        dz = sz - zi
        u = dx * dx + dy * dy + dz * dz + eps2
        inv = _inv_r(u, guarded)
        w = gm_ref[0:1, pl.ds(j0, TJ)] * (inv * inv * inv)
        ax = ax + jnp.sum(w * dx, axis=1, keepdims=True)
        ay = ay + jnp.sum(w * dy, axis=1, keepdims=True)
        az = az + jnp.sum(w * dz, axis=1, keepdims=True)
        return ax, ay, az

    zero = jnp.zeros((ti, 1), jnp.float32)
    ax, ay, az = jax.lax.fori_loop(0, ns // TJ, body, (zero, zero, zero))
    out_ref[:] = jnp.concatenate([ax, ay, az], axis=1)


@functools.partial(jax.jit, static_argnames=("guarded",))
def accel_rows(pos_rows, src_pos, src_mass, eps, G=1.0, chunk: int = 0,
               guarded: bool = True):
    """Pallas accel on rows from sources; f32 in, f32 out. Drop-in for
    ops.gravity.accel_rows (``chunk`` accepted and ignored). Source sets
    beyond STREAM_N dispatch to the HBM-streaming variant (static shape
    check, so the choice is baked in at trace time)."""
    if src_pos.shape[0] > STREAM_N:
        return accel_rows_streamed(pos_rows, src_pos, src_mass, eps, G,
                                   chunk, guarded)
    nr = pos_rows.shape[0]
    nrp = _round_up(max(nr, TI_A), TI_A)
    rows = _pad_rows(pos_rows, nrp)
    srcT, gm, nsp = _src_layout(src_pos, src_mass, jnp.asarray(G, jnp.float32),
                                tj=TJ_A)
    eps2 = jnp.asarray(eps, jnp.float32).reshape(1, 1) ** 2

    with jax.enable_x64(False):
        out = _call(
        functools.partial(_accel_kernel, guarded=guarded),
        grid=(nrp // TI_A,),
        in_specs=[
            pl.BlockSpec((TI_A, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((TI_A, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nrp, 3), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=22 * nrp * nsp, bytes_accessed=(nrp + nsp) * 16,
            transcendentals=nrp * nsp,
        ),
    )(rows, srcT, gm, eps2)
    return out[:nr]


# --------------------------------------------------------------------------
# accel + potential
# --------------------------------------------------------------------------

def _accel_phi_kernel(rows_ref, src_ref, gm_ref, eps2_ref, out_ref, phi_ref, *, guarded):
    ti = rows_ref.shape[0]
    ns = src_ref.shape[1]
    xi = rows_ref[:, 0:1]
    yi = rows_ref[:, 1:2]
    zi = rows_ref[:, 2:3]
    eps2 = eps2_ref[0, 0]

    def body(j, carry):
        ax, ay, az, ph = carry
        j0 = j * TJ
        sx = src_ref[0:1, pl.ds(j0, TJ)]
        sy = src_ref[1:2, pl.ds(j0, TJ)]
        sz = src_ref[2:3, pl.ds(j0, TJ)]
        dx = sx - xi
        dy = sy - yi
        dz = sz - zi
        u = dx * dx + dy * dy + dz * dz + eps2
        inv = _inv_r(u, guarded)
        gminv = gm_ref[0:1, pl.ds(j0, TJ)] * inv
        w = gminv * (inv * inv)
        ax = ax + jnp.sum(w * dx, axis=1, keepdims=True)
        ay = ay + jnp.sum(w * dy, axis=1, keepdims=True)
        az = az + jnp.sum(w * dz, axis=1, keepdims=True)
        ph = ph - jnp.sum(gminv, axis=1, keepdims=True)
        return ax, ay, az, ph

    zero = jnp.zeros((ti, 1), jnp.float32)
    ax, ay, az, ph = jax.lax.fori_loop(0, ns // TJ, body, (zero, zero, zero, zero))
    out_ref[:] = jnp.concatenate([ax, ay, az], axis=1)
    phi_ref[:] = ph


@functools.partial(jax.jit, static_argnames=("guarded",))
def accel_potential_rows(pos_rows, src_pos, src_mass, eps, G=1.0, chunk: int = 0,
                         guarded: bool = True):
    """(accel, phi) on rows; phi includes the softened self term when rows
    overlap sources (caller adds ``self_phi``) — same contract as jnp."""
    if src_pos.shape[0] > STREAM_N:
        return accel_potential_rows_streamed(pos_rows, src_pos, src_mass,
                                             eps, G, chunk, guarded)
    nr = pos_rows.shape[0]
    nrp = _round_up(max(nr, TI), TI)
    rows = _pad_rows(pos_rows, nrp)
    srcT, gm, nsp = _src_layout(src_pos, src_mass, jnp.asarray(G, jnp.float32))
    eps2 = jnp.asarray(eps, jnp.float32).reshape(1, 1) ** 2

    with jax.enable_x64(False):
        acc, phi = _call(
        functools.partial(_accel_phi_kernel, guarded=guarded),
        grid=(nrp // TI,),
        in_specs=[
            pl.BlockSpec((TI, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((TI, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TI, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nrp, 3), jnp.float32),
            jax.ShapeDtypeStruct((nrp, 1), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=26 * nrp * nsp, bytes_accessed=(nrp + nsp) * 20,
            transcendentals=nrp * nsp,
        ),
    )(rows, srcT, gm, eps2)
    return acc[:nr], phi[:nr, 0]


# --------------------------------------------------------------------------
# accel + jerk (Hermite)
# --------------------------------------------------------------------------

def _accel_jerk_kernel(rows_ref, vrows_ref, src_ref, svel_ref, gm_ref,
                       eps2_ref, out_ref, jout_ref, *, guarded):
    ti = rows_ref.shape[0]
    ns = src_ref.shape[1]
    xi = rows_ref[:, 0:1]
    yi = rows_ref[:, 1:2]
    zi = rows_ref[:, 2:3]
    vxi = vrows_ref[:, 0:1]
    vyi = vrows_ref[:, 1:2]
    vzi = vrows_ref[:, 2:3]
    eps2 = eps2_ref[0, 0]

    def body(j, carry):
        ax, ay, az, jx, jy, jz = carry
        j0 = j * TJ
        dx = src_ref[0:1, pl.ds(j0, TJ)] - xi
        dy = src_ref[1:2, pl.ds(j0, TJ)] - yi
        dz = src_ref[2:3, pl.ds(j0, TJ)] - zi
        dvx = svel_ref[0:1, pl.ds(j0, TJ)] - vxi
        dvy = svel_ref[1:2, pl.ds(j0, TJ)] - vyi
        dvz = svel_ref[2:3, pl.ds(j0, TJ)] - vzi
        u = dx * dx + dy * dy + dz * dz + eps2
        inv = _inv_r(u, guarded)
        w = gm_ref[0:1, pl.ds(j0, TJ)] * (inv * inv * inv)
        rv = dx * dvx + dy * dvy + dz * dvz
        # s = 3 w rv / u == 3 rv w inv^2 (inv is already zero-guarded)
        s = (jnp.float32(3.0) * rv) * w * (inv * inv)
        ax = ax + jnp.sum(w * dx, axis=1, keepdims=True)
        ay = ay + jnp.sum(w * dy, axis=1, keepdims=True)
        az = az + jnp.sum(w * dz, axis=1, keepdims=True)
        jx = jx + jnp.sum(w * dvx - s * dx, axis=1, keepdims=True)
        jy = jy + jnp.sum(w * dvy - s * dy, axis=1, keepdims=True)
        jz = jz + jnp.sum(w * dvz - s * dz, axis=1, keepdims=True)
        return ax, ay, az, jx, jy, jz

    zero = jnp.zeros((ti, 1), jnp.float32)
    ax, ay, az, jx, jy, jz = jax.lax.fori_loop(0, ns // TJ, body, (zero,) * 6)
    out_ref[:] = jnp.concatenate([ax, ay, az], axis=1)
    jout_ref[:] = jnp.concatenate([jx, jy, jz], axis=1)


@functools.partial(jax.jit, static_argnames=("guarded",))
def accel_jerk_rows(pos_rows, vel_rows, src_pos, src_vel, src_mass, eps,
                    G=1.0, chunk: int = 0, guarded: bool = True):
    if src_pos.shape[0] > STREAM_N:
        return accel_jerk_rows_streamed(pos_rows, vel_rows, src_pos, src_vel,
                                        src_mass, eps, G, chunk, guarded)
    nr = pos_rows.shape[0]
    nrp = _round_up(max(nr, TI), TI)
    rows = _pad_rows(pos_rows, nrp)
    vrows = _pad_rows(vel_rows, nrp)
    srcT, gm, nsp = _src_layout(src_pos, src_mass, jnp.asarray(G, jnp.float32))
    svelT = jnp.pad(src_vel.T, ((0, 0), (0, nsp - src_vel.shape[0])))
    eps2 = jnp.asarray(eps, jnp.float32).reshape(1, 1) ** 2

    with jax.enable_x64(False):
        acc, jerk = _call(
        functools.partial(_accel_jerk_kernel, guarded=guarded),
        grid=(nrp // TI,),
        in_specs=[
            pl.BlockSpec((TI, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TI, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((TI, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TI, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nrp, 3), jnp.float32),
            jax.ShapeDtypeStruct((nrp, 3), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=50 * nrp * nsp, bytes_accessed=(nrp + nsp) * 32,
            transcendentals=nrp * nsp,
        ),
    )(rows, vrows, srcT, svelT, gm, eps2)
    return acc[:nr], jerk[:nr]


# --------------------------------------------------------------------------
# source-streaming variants (N >= ~1M): sources stay in HBM and stream
# through VMEM tile by tile
# --------------------------------------------------------------------------
#
# The VMEM-resident kernels above cap the source count at what fits on-chip
# (VERDICT round-1 Missing #2). Here the j (source) loop moves from a
# fori_loop over a resident buffer into the SECOND GRID DIMENSION: Pallas's
# pipeline machinery then double-buffers each (3, TJ) source tile HBM→VMEM
# automatically while the previous tile computes. The output row block's
# index map ignores j, so it stays VMEM-resident across the whole source
# sweep and accumulates in place (matmul-reduction pattern). Arithmetic
# intensity per tile is ~22·TI flops/byte (≈10⁴) — far above the roofline
# knee, so the stream is compute-bound, not HBM-bound.
#
# Sources beyond OCN_PALLAS_STREAM_N (default 262144) dispatch here
# automatically from accel_rows / accel_potential_rows / accel_jerk_rows.

STREAM_N = int(_os.environ.get("OCN_PALLAS_STREAM_N", 262144))


def _accel_stream_kernel(rows_ref, src_ref, gm_ref, eps2_ref, out_ref, *,
                         guarded):
    j = pl.program_id(1)
    xi = rows_ref[:, 0:1]
    yi = rows_ref[:, 1:2]
    zi = rows_ref[:, 2:3]
    eps2 = eps2_ref[0, 0]
    dx = src_ref[0:1, :] - xi
    dy = src_ref[1:2, :] - yi
    dz = src_ref[2:3, :] - zi
    u = dx * dx + dy * dy + dz * dz + eps2
    inv = _inv_r(u, guarded)
    w = gm_ref[0:1, :] * (inv * inv * inv)
    partial = jnp.concatenate(
        [jnp.sum(w * dx, axis=1, keepdims=True),
         jnp.sum(w * dy, axis=1, keepdims=True),
         jnp.sum(w * dz, axis=1, keepdims=True)], axis=1)

    @pl.when(j == 0)
    def _init():
        out_ref[:] = partial

    @pl.when(j != 0)
    def _accumulate():
        out_ref[:] = out_ref[:] + partial


@functools.partial(jax.jit, static_argnames=("guarded",))
def accel_rows_streamed(pos_rows, src_pos, src_mass, eps, G=1.0,
                        chunk: int = 0, guarded: bool = True):
    """accel_rows with HBM-resident sources (no VMEM source cap)."""
    nr = pos_rows.shape[0]
    nrp = _round_up(max(nr, TI_A), TI_A)
    rows = _pad_rows(pos_rows, nrp)
    srcT, gm, nsp = _src_layout(src_pos, src_mass, jnp.asarray(G, jnp.float32),
                                tj=TJ_A)
    eps2 = jnp.asarray(eps, jnp.float32).reshape(1, 1) ** 2

    with jax.enable_x64(False):
        out = _call(
            functools.partial(_accel_stream_kernel, guarded=guarded),
            grid=(nrp // TI_A, nsp // TJ_A),
            in_specs=[
                pl.BlockSpec((TI_A, 3), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, TJ_A), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TJ_A), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((TI_A, 3), lambda i, j: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nrp, 3), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
            cost_estimate=pl.CostEstimate(
                flops=22 * nrp * nsp, bytes_accessed=nrp * 16 * (nsp // TJ_A)
                + nsp * 16, transcendentals=nrp * nsp,
            ),
        )(rows, srcT, gm, eps2)
    return out[:nr]


def _accel_phi_stream_kernel(rows_ref, src_ref, gm_ref, eps2_ref,
                             out_ref, phi_ref, *, guarded):
    j = pl.program_id(1)
    xi = rows_ref[:, 0:1]
    yi = rows_ref[:, 1:2]
    zi = rows_ref[:, 2:3]
    eps2 = eps2_ref[0, 0]
    dx = src_ref[0:1, :] - xi
    dy = src_ref[1:2, :] - yi
    dz = src_ref[2:3, :] - zi
    u = dx * dx + dy * dy + dz * dz + eps2
    inv = _inv_r(u, guarded)
    gminv = gm_ref[0:1, :] * inv
    w = gminv * (inv * inv)
    partial = jnp.concatenate(
        [jnp.sum(w * dx, axis=1, keepdims=True),
         jnp.sum(w * dy, axis=1, keepdims=True),
         jnp.sum(w * dz, axis=1, keepdims=True)], axis=1)
    ph = -jnp.sum(gminv, axis=1, keepdims=True)

    @pl.when(j == 0)
    def _init():
        out_ref[:] = partial
        phi_ref[:] = ph

    @pl.when(j != 0)
    def _accumulate():
        out_ref[:] = out_ref[:] + partial
        phi_ref[:] = phi_ref[:] + ph


@functools.partial(jax.jit, static_argnames=("guarded",))
def accel_potential_rows_streamed(pos_rows, src_pos, src_mass, eps, G=1.0,
                                  chunk: int = 0, guarded: bool = True):
    nr = pos_rows.shape[0]
    nrp = _round_up(max(nr, TI), TI)
    rows = _pad_rows(pos_rows, nrp)
    srcT, gm, nsp = _src_layout(src_pos, src_mass, jnp.asarray(G, jnp.float32))
    eps2 = jnp.asarray(eps, jnp.float32).reshape(1, 1) ** 2

    with jax.enable_x64(False):
        acc, phi = _call(
            functools.partial(_accel_phi_stream_kernel, guarded=guarded),
            grid=(nrp // TI, nsp // TJ),
            in_specs=[
                pl.BlockSpec((TI, 3), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, TJ), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TJ), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=(
                pl.BlockSpec((TI, 3), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TI, 1), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((nrp, 3), jnp.float32),
                jax.ShapeDtypeStruct((nrp, 1), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
            cost_estimate=pl.CostEstimate(
                flops=26 * nrp * nsp, bytes_accessed=nrp * 20 * (nsp // TJ)
                + nsp * 16, transcendentals=nrp * nsp,
            ),
        )(rows, srcT, gm, eps2)
    return acc[:nr], phi[:nr, 0]


def _accel_jerk_stream_kernel(rows_ref, vrows_ref, src_ref, svel_ref, gm_ref,
                              eps2_ref, out_ref, jout_ref, *, guarded):
    j = pl.program_id(1)
    xi = rows_ref[:, 0:1]
    yi = rows_ref[:, 1:2]
    zi = rows_ref[:, 2:3]
    vxi = vrows_ref[:, 0:1]
    vyi = vrows_ref[:, 1:2]
    vzi = vrows_ref[:, 2:3]
    eps2 = eps2_ref[0, 0]
    dx = src_ref[0:1, :] - xi
    dy = src_ref[1:2, :] - yi
    dz = src_ref[2:3, :] - zi
    dvx = svel_ref[0:1, :] - vxi
    dvy = svel_ref[1:2, :] - vyi
    dvz = svel_ref[2:3, :] - vzi
    u = dx * dx + dy * dy + dz * dz + eps2
    inv = _inv_r(u, guarded)
    w = gm_ref[0:1, :] * (inv * inv * inv)
    rv = dx * dvx + dy * dvy + dz * dvz
    s = (jnp.float32(3.0) * rv) * w * (inv * inv)
    pa = jnp.concatenate(
        [jnp.sum(w * dx, axis=1, keepdims=True),
         jnp.sum(w * dy, axis=1, keepdims=True),
         jnp.sum(w * dz, axis=1, keepdims=True)], axis=1)
    pj = jnp.concatenate(
        [jnp.sum(w * dvx - s * dx, axis=1, keepdims=True),
         jnp.sum(w * dvy - s * dy, axis=1, keepdims=True),
         jnp.sum(w * dvz - s * dz, axis=1, keepdims=True)], axis=1)

    @pl.when(j == 0)
    def _init():
        out_ref[:] = pa
        jout_ref[:] = pj

    @pl.when(j != 0)
    def _accumulate():
        out_ref[:] = out_ref[:] + pa
        jout_ref[:] = jout_ref[:] + pj


@functools.partial(jax.jit, static_argnames=("guarded",))
def accel_jerk_rows_streamed(pos_rows, vel_rows, src_pos, src_vel, src_mass,
                             eps, G=1.0, chunk: int = 0, guarded: bool = True):
    nr = pos_rows.shape[0]
    nrp = _round_up(max(nr, TI), TI)
    rows = _pad_rows(pos_rows, nrp)
    vrows = _pad_rows(vel_rows, nrp)
    srcT, gm, nsp = _src_layout(src_pos, src_mass, jnp.asarray(G, jnp.float32))
    svelT = jnp.pad(src_vel.T, ((0, 0), (0, nsp - src_vel.shape[0])))
    eps2 = jnp.asarray(eps, jnp.float32).reshape(1, 1) ** 2

    with jax.enable_x64(False):
        acc, jerk = _call(
            functools.partial(_accel_jerk_stream_kernel, guarded=guarded),
            grid=(nrp // TI, nsp // TJ),
            in_specs=[
                pl.BlockSpec((TI, 3), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TI, 3), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, TJ), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, TJ), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TJ), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=(
                pl.BlockSpec((TI, 3), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TI, 3), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((nrp, 3), jnp.float32),
                jax.ShapeDtypeStruct((nrp, 3), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
            cost_estimate=pl.CostEstimate(
                flops=50 * nrp * nsp, bytes_accessed=nrp * 32 * (nsp // TJ)
                + nsp * 32, transcendentals=nrp * nsp,
            ),
        )(rows, vrows, srcT, svelT, gm, eps2)
    return acc[:nr], jerk[:nr]


# --------------------------------------------------------------------------
# single-chip wrappers (same API as ops.gravity)
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("guarded",))
def accel(pos, mass, eps=0.0, G=1.0, guarded: bool = True):
    pos_c, mass_c = prepare_f32(pos, mass)
    out = accel_rows(pos_c, pos_c, mass_c, jnp.asarray(eps, jnp.float32),
                     jnp.asarray(G, jnp.float32), 0, guarded)
    return out.astype(pos.dtype)


@functools.partial(jax.jit, static_argnames=("guarded",))
def accel_potential(pos, mass, eps=0.0, G=1.0, guarded: bool = True):
    pos_c, mass_c = prepare_f32(pos, mass)
    eps32 = jnp.asarray(eps, jnp.float32)
    G32 = jnp.asarray(G, jnp.float32)
    acc, phi = accel_potential_rows(pos_c, pos_c, mass_c, eps32, G32, 0, guarded)
    phi = phi + self_phi(mass_c, eps32, G32)
    return acc.astype(pos.dtype), phi.astype(pos.dtype)


@functools.partial(jax.jit, static_argnames=("guarded",))
def accel_jerk(pos, vel, mass, eps=0.0, G=1.0, guarded: bool = True):
    pos_c, mass_c, vel_c = prepare_f32(pos, mass, vel=vel)
    acc, jerk = accel_jerk_rows(pos_c, vel_c, pos_c, vel_c, mass_c,
                                jnp.asarray(eps, jnp.float32),
                                jnp.asarray(G, jnp.float32), 0, guarded)
    return acc.astype(pos.dtype), jerk.astype(pos.dtype)
