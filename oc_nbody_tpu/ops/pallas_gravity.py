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
    reduction along lanes; the serial accumulation ACROSS tiles is
    Kahan-compensated in the streamed kernels (default; see COMPENSATED
    below), holding cross-tile error at O(eps_f32) regardless of N instead
    of growing ~ sqrt(num_tiles)·eps_f32.
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
# the factored pair-physics core (specs + generated sym/cross/chunked/
# batched forms + shared helpers) — see ops/pallas_pair.py
from oc_nbody_tpu.ops.pallas_pair import (  # noqa: F401
    _OP_A, _OP_AX, _OP_J, _OP_JX, _OP_P, _OP_PX, _call, _chunk_check,
    _chunked_batch, _chunked_jerk_batch, _chunked_phi_batch,
    _chunked_x_batch, _chunked_x_phi_batch, _chunked_xj_batch,
    _cross_call, _inv_r, _padT, _pipelined_batches, _prep_f32_T,
    _prep_x_T, _round_up, _split_pairs, _split_rows, _sym_call,
    _sym_chunked_generic,
)

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

# Kahan-compensated cross-tile accumulation. Per-tile partial sums are
# exact-ish tree reductions; the error that grows with N is the serial
# accumulation ACROSS source tiles (~sqrt(n_tiles)*eps_f32). Measured on the
# v5 lite vs an f64 oracle:
#   * streamed, N=1,048,576 (512 tiles): max rel err 8.1e-7 -> 3.5e-7,
#     rms 3.3e-7 -> 6.7e-8, for 2.2% wall (6.71 -> 6.86 s/eval). DEFAULT ON.
#   * resident, N=65,536 (32 tiles): error unchanged at 3.9e-6 — the TPU's
#     f32 rsqrt (~1.1e-6/pair, same in fused jnp) dominates below ~256
#     tiles — while the doubled fori_loop carry costs 7.5% (26.6 -> 28.6
#     ms). DEFAULT OFF.
# OCN_PALLAS_COMPENSATED: "stream" (default) | "all" | "0".
_COMP_ENV = _os.environ.get("OCN_PALLAS_COMPENSATED", "stream")
COMPENSATED = _COMP_ENV in ("stream", "all", "1")
COMPENSATED_RESIDENT = _COMP_ENV == "all"


def _two_sum(acc, comp, partial):
    """One Kahan step: returns (acc', comp') with acc'+comp' ~= acc+comp+partial.
    Relies on XLA/Mosaic not reassociating float arithmetic (they do not;
    verified on hardware: compensated and uncompensated outputs differ)."""
    y = partial - comp
    t = acc + y
    comp = (t - acc) - y
    return t, comp


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


# --------------------------------------------------------------------------
# accel
# --------------------------------------------------------------------------

def _accel_kernel(rows_ref, src_ref, gm_ref, eps2_ref, out_ref, *, guarded,
                  compensated):
    ti = rows_ref.shape[0]
    ns = src_ref.shape[1]
    TJ = TJ_A
    xi = rows_ref[:, 0:1]
    yi = rows_ref[:, 1:2]
    zi = rows_ref[:, 2:3]
    eps2 = eps2_ref[0, 0]

    def body(j, carry):
        ax, ay, az, cx, cy, cz = carry
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
        px = jnp.sum(w * dx, axis=1, keepdims=True)
        py = jnp.sum(w * dy, axis=1, keepdims=True)
        pz = jnp.sum(w * dz, axis=1, keepdims=True)
        if compensated:
            ax, cx = _two_sum(ax, cx, px)
            ay, cy = _two_sum(ay, cy, py)
            az, cz = _two_sum(az, cz, pz)
        else:
            ax, ay, az = ax + px, ay + py, az + pz
        return ax, ay, az, cx, cy, cz

    zero = jnp.zeros((ti, 1), jnp.float32)
    ax, ay, az, _, _, _ = jax.lax.fori_loop(0, ns // TJ, body, (zero,) * 6)
    out_ref[:] = jnp.concatenate([ax, ay, az], axis=1)


@functools.partial(jax.jit, static_argnames=("guarded", "compensated"))
def accel_rows(pos_rows, src_pos, src_mass, eps, G=1.0, chunk: int = 0,
               guarded: bool = True, compensated=None):
    """Pallas accel on rows from sources; f32 in, f32 out. Drop-in for
    ops.gravity.accel_rows (``chunk`` accepted and ignored). Source sets
    beyond STREAM_N dispatch to the HBM-streaming variant (static shape
    check, so the choice is baked in at trace time)."""
    if src_pos.shape[0] > STREAM_N:
        return accel_rows_streamed(pos_rows, src_pos, src_mass, eps, G,
                                   chunk, guarded, compensated)
    if compensated is None:
        compensated = COMPENSATED_RESIDENT
    if (_resident_t() and not compensated
            and src_pos.shape[0] >= RT_MIN_ACCEL
            and pos_rows.shape[0] <= RT_MAX_ROWS):
        # transposed monolithic variant: measured faster above the
        # crossover (see the "transposed monolithic kernels" section); the
        # grid kernel remains for small N and compensated-resident.
        return accel_rows_t(pos_rows, src_pos, src_mass, eps, G, guarded)
    nr = pos_rows.shape[0]
    nrp = _round_up(max(nr, TI_A), TI_A)
    rows = _pad_rows(pos_rows, nrp)
    srcT, gm, nsp = _src_layout(src_pos, src_mass, jnp.asarray(G, jnp.float32),
                                tj=TJ_A)
    eps2 = jnp.asarray(eps, jnp.float32).reshape(1, 1) ** 2

    with jax.enable_x64(False):
        out = _call(
        functools.partial(_accel_kernel, guarded=guarded,
                          compensated=compensated),
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

def _accel_phi_kernel(rows_ref, src_ref, gm_ref, eps2_ref, out_ref, phi_ref, *,
                      guarded, compensated):
    ti = rows_ref.shape[0]
    ns = src_ref.shape[1]
    xi = rows_ref[:, 0:1]
    yi = rows_ref[:, 1:2]
    zi = rows_ref[:, 2:3]
    eps2 = eps2_ref[0, 0]

    def body(j, carry):
        ax, ay, az, ph, cx, cy, cz, cp = carry
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
        px = jnp.sum(w * dx, axis=1, keepdims=True)
        py = jnp.sum(w * dy, axis=1, keepdims=True)
        pz = jnp.sum(w * dz, axis=1, keepdims=True)
        pp = -jnp.sum(gminv, axis=1, keepdims=True)
        if compensated:
            ax, cx = _two_sum(ax, cx, px)
            ay, cy = _two_sum(ay, cy, py)
            az, cz = _two_sum(az, cz, pz)
            ph, cp = _two_sum(ph, cp, pp)
        else:
            ax, ay, az, ph = ax + px, ay + py, az + pz, ph + pp
        return ax, ay, az, ph, cx, cy, cz, cp

    zero = jnp.zeros((ti, 1), jnp.float32)
    ax, ay, az, ph, _, _, _, _ = jax.lax.fori_loop(
        0, ns // TJ, body, (zero,) * 8)
    out_ref[:] = jnp.concatenate([ax, ay, az], axis=1)
    phi_ref[:] = ph


@functools.partial(jax.jit, static_argnames=("guarded", "compensated"))
def accel_potential_rows(pos_rows, src_pos, src_mass, eps, G=1.0, chunk: int = 0,
                         guarded: bool = True, compensated=None):
    """(accel, phi) on rows; phi includes the softened self term when rows
    overlap sources (caller adds ``self_phi``) — same contract as jnp."""
    if src_pos.shape[0] > STREAM_N:
        return accel_potential_rows_streamed(pos_rows, src_pos, src_mass,
                                             eps, G, chunk, guarded,
                                             compensated)
    if compensated is None:
        compensated = COMPENSATED_RESIDENT
    if (_resident_t() and not compensated
            and src_pos.shape[0] >= RT_MIN_ACCEL
            and pos_rows.shape[0] <= RT_MAX_ROWS):
        return accel_potential_rows_t(pos_rows, src_pos, src_mass, eps, G,
                                      guarded)
    nr = pos_rows.shape[0]
    nrp = _round_up(max(nr, TI), TI)
    rows = _pad_rows(pos_rows, nrp)
    srcT, gm, nsp = _src_layout(src_pos, src_mass, jnp.asarray(G, jnp.float32))
    eps2 = jnp.asarray(eps, jnp.float32).reshape(1, 1) ** 2

    with jax.enable_x64(False):
        acc, phi = _call(
        functools.partial(_accel_phi_kernel, guarded=guarded,
                          compensated=compensated),
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
                       eps2_ref, out_ref, jout_ref, *, guarded, compensated):
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
        ax, ay, az, jx, jy, jz, cax, cay, caz, cjx, cjy, cjz = carry
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
        pax = jnp.sum(w * dx, axis=1, keepdims=True)
        pay = jnp.sum(w * dy, axis=1, keepdims=True)
        paz = jnp.sum(w * dz, axis=1, keepdims=True)
        pjx = jnp.sum(w * dvx - s * dx, axis=1, keepdims=True)
        pjy = jnp.sum(w * dvy - s * dy, axis=1, keepdims=True)
        pjz = jnp.sum(w * dvz - s * dz, axis=1, keepdims=True)
        if compensated:
            ax, cax = _two_sum(ax, cax, pax)
            ay, cay = _two_sum(ay, cay, pay)
            az, caz = _two_sum(az, caz, paz)
            jx, cjx = _two_sum(jx, cjx, pjx)
            jy, cjy = _two_sum(jy, cjy, pjy)
            jz, cjz = _two_sum(jz, cjz, pjz)
        else:
            ax, ay, az = ax + pax, ay + pay, az + paz
            jx, jy, jz = jx + pjx, jy + pjy, jz + pjz
        return ax, ay, az, jx, jy, jz, cax, cay, caz, cjx, cjy, cjz

    zero = jnp.zeros((ti, 1), jnp.float32)
    ax, ay, az, jx, jy, jz = jax.lax.fori_loop(
        0, ns // TJ, body, (zero,) * 12)[:6]
    out_ref[:] = jnp.concatenate([ax, ay, az], axis=1)
    jout_ref[:] = jnp.concatenate([jx, jy, jz], axis=1)


@functools.partial(jax.jit, static_argnames=("guarded", "compensated"))
def accel_jerk_rows(pos_rows, vel_rows, src_pos, src_vel, src_mass, eps,
                    G=1.0, chunk: int = 0, guarded: bool = True,
                    compensated=None):
    if src_pos.shape[0] > STREAM_N:
        return accel_jerk_rows_streamed(pos_rows, vel_rows, src_pos, src_vel,
                                        src_mass, eps, G, chunk, guarded,
                                        compensated)
    if compensated is None:
        compensated = COMPENSATED_RESIDENT
    if (_resident_t() and not compensated
            and src_pos.shape[0] >= RT_MIN_JERK
            and pos_rows.shape[0] <= RT_MAX_ROWS):
        return accel_jerk_rows_t(pos_rows, vel_rows, src_pos, src_vel,
                                 src_mass, eps, G, guarded)
    nr = pos_rows.shape[0]
    nrp = _round_up(max(nr, TI), TI)
    rows = _pad_rows(pos_rows, nrp)
    vrows = _pad_rows(vel_rows, nrp)
    srcT, gm, nsp = _src_layout(src_pos, src_mass, jnp.asarray(G, jnp.float32))
    svelT = jnp.pad(src_vel.T, ((0, 0), (0, nsp - src_vel.shape[0])))
    eps2 = jnp.asarray(eps, jnp.float32).reshape(1, 1) ** 2

    with jax.enable_x64(False):
        acc, jerk = _call(
        functools.partial(_accel_jerk_kernel, guarded=guarded,
                          compensated=compensated),
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


def _accel_stream_kernel(rows_ref, src_ref, gm_ref, eps2_ref, out_ref,
                         comp_ref, *, guarded, compensated):
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
        if compensated:
            comp_ref[:] = jnp.zeros_like(comp_ref)

    @pl.when(j != 0)
    def _accumulate():
        if compensated:
            t, c = _two_sum(out_ref[:], comp_ref[:], partial)
            out_ref[:] = t
            comp_ref[:] = c
        else:
            out_ref[:] = out_ref[:] + partial


@functools.partial(jax.jit, static_argnames=("guarded", "compensated"))
def accel_rows_streamed(pos_rows, src_pos, src_mass, eps, G=1.0,
                        chunk: int = 0, guarded: bool = True,
                        compensated=None):
    """accel_rows with HBM-resident sources (no VMEM source cap)."""
    if compensated is None:
        compensated = COMPENSATED
    nr = pos_rows.shape[0]
    nrp = _round_up(max(nr, TI_A), TI_A)
    rows = _pad_rows(pos_rows, nrp)
    srcT, gm, nsp = _src_layout(src_pos, src_mass, jnp.asarray(G, jnp.float32),
                                tj=TJ_A)
    eps2 = jnp.asarray(eps, jnp.float32).reshape(1, 1) ** 2

    with jax.enable_x64(False):
        out = _call(
            functools.partial(_accel_stream_kernel, guarded=guarded,
                              compensated=compensated),
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
            scratch_shapes=[pltpu.VMEM((TI_A, 3), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
            cost_estimate=pl.CostEstimate(
                flops=22 * nrp * nsp, bytes_accessed=nrp * 16 * (nsp // TJ_A)
                + nsp * 16, transcendentals=nrp * nsp,
            ),
        )(rows, srcT, gm, eps2)
    return out[:nr]


def _accel_phi_stream_kernel(rows_ref, src_ref, gm_ref, eps2_ref,
                             out_ref, phi_ref, comp_ref, pcomp_ref, *,
                             guarded, compensated):
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
        if compensated:
            comp_ref[:] = jnp.zeros_like(comp_ref)
            pcomp_ref[:] = jnp.zeros_like(pcomp_ref)

    @pl.when(j != 0)
    def _accumulate():
        if compensated:
            t, c = _two_sum(out_ref[:], comp_ref[:], partial)
            out_ref[:] = t
            comp_ref[:] = c
            tp, cp = _two_sum(phi_ref[:], pcomp_ref[:], ph)
            phi_ref[:] = tp
            pcomp_ref[:] = cp
        else:
            out_ref[:] = out_ref[:] + partial
            phi_ref[:] = phi_ref[:] + ph


@functools.partial(jax.jit, static_argnames=("guarded", "compensated"))
def accel_potential_rows_streamed(pos_rows, src_pos, src_mass, eps, G=1.0,
                                  chunk: int = 0, guarded: bool = True,
                                  compensated=None):
    if compensated is None:
        compensated = COMPENSATED
    nr = pos_rows.shape[0]
    nrp = _round_up(max(nr, TI), TI)
    rows = _pad_rows(pos_rows, nrp)
    srcT, gm, nsp = _src_layout(src_pos, src_mass, jnp.asarray(G, jnp.float32))
    eps2 = jnp.asarray(eps, jnp.float32).reshape(1, 1) ** 2

    with jax.enable_x64(False):
        acc, phi = _call(
            functools.partial(_accel_phi_stream_kernel, guarded=guarded,
                              compensated=compensated),
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
            scratch_shapes=[pltpu.VMEM((TI, 3), jnp.float32),
                            pltpu.VMEM((TI, 1), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
            cost_estimate=pl.CostEstimate(
                flops=26 * nrp * nsp, bytes_accessed=nrp * 20 * (nsp // TJ)
                + nsp * 16, transcendentals=nrp * nsp,
            ),
        )(rows, srcT, gm, eps2)
    return acc[:nr], phi[:nr, 0]


def _accel_jerk_stream_kernel(rows_ref, vrows_ref, src_ref, svel_ref, gm_ref,
                              eps2_ref, out_ref, jout_ref, acomp_ref,
                              jcomp_ref, *, guarded, compensated):
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
        if compensated:
            acomp_ref[:] = jnp.zeros_like(acomp_ref)
            jcomp_ref[:] = jnp.zeros_like(jcomp_ref)

    @pl.when(j != 0)
    def _accumulate():
        if compensated:
            ta, ca = _two_sum(out_ref[:], acomp_ref[:], pa)
            out_ref[:] = ta
            acomp_ref[:] = ca
            tj, cj = _two_sum(jout_ref[:], jcomp_ref[:], pj)
            jout_ref[:] = tj
            jcomp_ref[:] = cj
        else:
            out_ref[:] = out_ref[:] + pa
            jout_ref[:] = jout_ref[:] + pj


@functools.partial(jax.jit, static_argnames=("guarded", "compensated"))
def accel_jerk_rows_streamed(pos_rows, vel_rows, src_pos, src_vel, src_mass,
                             eps, G=1.0, chunk: int = 0, guarded: bool = True,
                             compensated=None):
    if compensated is None:
        compensated = COMPENSATED
    nr = pos_rows.shape[0]
    nrp = _round_up(max(nr, TI), TI)
    rows = _pad_rows(pos_rows, nrp)
    vrows = _pad_rows(vel_rows, nrp)
    srcT, gm, nsp = _src_layout(src_pos, src_mass, jnp.asarray(G, jnp.float32))
    svelT = jnp.pad(src_vel.T, ((0, 0), (0, nsp - src_vel.shape[0])))
    eps2 = jnp.asarray(eps, jnp.float32).reshape(1, 1) ** 2

    with jax.enable_x64(False):
        acc, jerk = _call(
            functools.partial(_accel_jerk_stream_kernel, guarded=guarded,
                              compensated=compensated),
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
            scratch_shapes=[pltpu.VMEM((TI, 3), jnp.float32),
                            pltpu.VMEM((TI, 3), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
            cost_estimate=pl.CostEstimate(
                flops=50 * nrp * nsp, bytes_accessed=nrp * 32 * (nsp // TJ)
                + nsp * 32, transcendentals=nrp * nsp,
            ),
        )(rows, vrows, srcT, svelT, gm, eps2)
    return acc[:nr], jerk[:nr]


# --------------------------------------------------------------------------
# transposed monolithic kernels
# --------------------------------------------------------------------------
#
# Same arithmetic as the grid kernels above, two structural changes:
#
#   * Row positions and outputs are stored TRANSPOSED, (3, N) instead of
#     (N, 3). A (N, 3) f32 VMEM array is tiled (8, 128) with 125 dead lanes
#     — 32 MiB at N=65k; the (3, N) form pads sublanes 3->8 instead (2 MiB).
#     Each row tile pays a handful of (1,TI)<->(TI,1) relayout reshapes,
#     O(TI) movement against the O(TI*N) sweep.
#   * One monolithic kernel body (fori_loop over row tiles) instead of a
#     grid — there is nothing for the Pallas pipeline machinery to do when
#     everything is VMEM-resident.
#
# Measured (slope-timed in one jit, N=65536, 1x v5 lite): accel 21.0 ms /
# 2.04e11 int/s (grid kernel: 23.6 ms), accel+phi 25.2 ms (grid: 27.6),
# jerk 43.7 ms / 9.8e10 (grid: 50.3). Tile sweep: accel 256x2048 21.0 |
# 512x2048 22.4 | 512x1024 22.9 | 256x1024 23.2; jerk 256x1024 43.7 |
# 512x512 48.0 | {256,128}x2048 50.1 — defaults are the measured optima.
# The sweep bodies are shared with the RDMA ring kernels
# (ops/pallas_ring.py), which read sources from their circulating slab via
# the same `read` closure these kernels bind to the input refs.

TI_T = int(_os.environ.get("OCN_PALLAS_TI_T", 256))
TJ_T = int(_os.environ.get("OCN_PALLAS_TJ_T", 2048))
TI_JT = int(_os.environ.get("OCN_PALLAS_TI_JT", 256))
TJ_JT = int(_os.environ.get("OCN_PALLAS_TJ_JT", 1024))

# Measured crossovers vs the grid kernels (slope-timed): below these source
# counts the grid kernels win (8192: grid accel 0.32 vs T 0.36-0.55 ms,
# grid jerk 0.41-0.78 vs T 0.83; 16384: T jerk 2.85-3.00 vs grid 3.34-3.37
# but accel within noise). The transposed win grows with N (+12-15% at 65k).
RT_MIN_ACCEL = int(_os.environ.get("OCN_PALLAS_RT_MIN_A", 32768))
RT_MIN_JERK = int(_os.environ.get("OCN_PALLAS_RT_MIN_J", 16384))

# Row-count ceiling for the VMEM-RESIDENT monolithic variants (the
# transposed `_t` family here and the resident `_x` extended family):
# those kernels keep the ENTIRE row set and its outputs on the kernel
# stack, so oversized row chunks OOM scoped VMEM at compile time —
# measured on this chip: accel_rows_t at rows=262,144 × src=65,536
# allocated 16.14 MiB against the 16.00 MiB scoped limit (the 1M pruned
# macro path, round 4). 65,536 rows is the validated envelope (the 65k
# escape-pruning bench drove every rows-kernel at that size on
# hardware). Row counts past the cap fall back to the row-GRIDDED /
# streamed families, which block rows at TI_* and are row-unbounded.
RT_MAX_ROWS = int(_os.environ.get("OCN_PALLAS_RT_MAX_ROWS", 65536))


def _resident_t() -> bool:
    """Route the self-interaction wrappers through the transposed kernels
    (read at call time so tests/benches can flip it without re-import)."""
    return _os.environ.get("OCN_PALLAS_RESIDENT_T", "1") == "1"


def _accumulate_t(outT_ref, compT_ref, i0, ti, tileT, first, compensated):
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


def _sweep_t_accel(rowsT_ref, read, outT_ref, compT_ref, eps2, *, ti, tj,
                   nj, first, guarded, compensated):
    """Accel sweep of all row tiles against one source set. ``read(c, j0)``
    returns the (1, tj) source slice for component c (0-2 position, 3 is
    G*mass) — bound to input refs here, to the ring slab in pallas_ring."""
    ni = rowsT_ref.shape[1] // ti

    def row_body(i, _):
        i0 = i * ti
        xi = rowsT_ref[0:1, pl.ds(i0, ti)].reshape(ti, 1)
        yi = rowsT_ref[1:2, pl.ds(i0, ti)].reshape(ti, 1)
        zi = rowsT_ref[2:3, pl.ds(i0, ti)].reshape(ti, 1)

        def j_body(j, carry):
            ax, ay, az = carry
            j0 = j * tj
            dx = read(0, j0) - xi
            dy = read(1, j0) - yi
            dz = read(2, j0) - zi
            u = dx * dx + dy * dy + dz * dz + eps2
            inv = _inv_r(u, guarded)
            w = read(3, j0) * (inv * inv * inv)
            ax = ax + jnp.sum(w * dx, axis=1, keepdims=True)
            ay = ay + jnp.sum(w * dy, axis=1, keepdims=True)
            az = az + jnp.sum(w * dz, axis=1, keepdims=True)
            return ax, ay, az

        zero = jnp.zeros((ti, 1), jnp.float32)
        ax, ay, az = jax.lax.fori_loop(0, nj, j_body, (zero, zero, zero))
        tileT = jnp.concatenate(
            [ax.reshape(1, ti), ay.reshape(1, ti), az.reshape(1, ti)],
            axis=0)
        _accumulate_t(outT_ref, compT_ref, i0, ti, tileT, first, compensated)
        return 0

    jax.lax.fori_loop(0, ni, row_body, 0)


def _sweep_t_jerk(rowsT_ref, vrowsT_ref, read, outT_ref, joutT_ref,
                  acompT_ref, jcompT_ref, eps2, *, ti, tj, nj, first,
                  guarded, compensated):
    """Accel+jerk sweep; ``read`` components: 0-2 position, 3-5 velocity,
    6 G*mass."""
    ni = rowsT_ref.shape[1] // ti

    def row_body(i, _):
        i0 = i * ti
        xi = rowsT_ref[0:1, pl.ds(i0, ti)].reshape(ti, 1)
        yi = rowsT_ref[1:2, pl.ds(i0, ti)].reshape(ti, 1)
        zi = rowsT_ref[2:3, pl.ds(i0, ti)].reshape(ti, 1)
        vxi = vrowsT_ref[0:1, pl.ds(i0, ti)].reshape(ti, 1)
        vyi = vrowsT_ref[1:2, pl.ds(i0, ti)].reshape(ti, 1)
        vzi = vrowsT_ref[2:3, pl.ds(i0, ti)].reshape(ti, 1)

        def j_body(j, carry):
            ax, ay, az, jx, jy, jz = carry
            j0 = j * tj
            dx = read(0, j0) - xi
            dy = read(1, j0) - yi
            dz = read(2, j0) - zi
            dvx = read(3, j0) - vxi
            dvy = read(4, j0) - vyi
            dvz = read(5, j0) - vzi
            u = dx * dx + dy * dy + dz * dz + eps2
            inv = _inv_r(u, guarded)
            w = read(6, j0) * (inv * inv * inv)
            rv = dx * dvx + dy * dvy + dz * dvz
            s = (jnp.float32(3.0) * rv) * w * (inv * inv)
            ax = ax + jnp.sum(w * dx, axis=1, keepdims=True)
            ay = ay + jnp.sum(w * dy, axis=1, keepdims=True)
            az = az + jnp.sum(w * dz, axis=1, keepdims=True)
            jx = jx + jnp.sum(w * dvx - s * dx, axis=1, keepdims=True)
            jy = jy + jnp.sum(w * dvy - s * dy, axis=1, keepdims=True)
            jz = jz + jnp.sum(w * dvz - s * dz, axis=1, keepdims=True)
            return ax, ay, az, jx, jy, jz

        zero = jnp.zeros((ti, 1), jnp.float32)
        ax, ay, az, jx, jy, jz = jax.lax.fori_loop(
            0, nj, j_body, (zero,) * 6)
        atileT = jnp.concatenate(
            [ax.reshape(1, ti), ay.reshape(1, ti), az.reshape(1, ti)],
            axis=0)
        jtileT = jnp.concatenate(
            [jx.reshape(1, ti), jy.reshape(1, ti), jz.reshape(1, ti)],
            axis=0)
        _accumulate_t(outT_ref, acompT_ref, i0, ti, atileT, first,
                      compensated)
        _accumulate_t(joutT_ref, jcompT_ref, i0, ti, jtileT, first,
                      compensated)
        return 0

    jax.lax.fori_loop(0, ni, row_body, 0)


def _accel_kernel_t(rowsT_ref, src_ref, gm_ref, eps2_ref, outT_ref, *,
                    guarded):
    def read(c, j0):
        if c == 3:
            return gm_ref[0:1, pl.ds(j0, TJ_T)]
        return src_ref[c:c + 1, pl.ds(j0, TJ_T)]

    _sweep_t_accel(rowsT_ref, read, outT_ref, None, eps2_ref[0, 0],
                   ti=TI_T, tj=TJ_T, nj=src_ref.shape[1] // TJ_T,
                   first=True, guarded=guarded, compensated=False)


def _sweep_t_phi(rowsT_ref, read, outT_ref, phi_ref, acompT_ref,
                 pcomp_ref, eps2, *, ti, tj, nj, first, guarded,
                 compensated):
    """Accel+potential sweep; phi accumulates as a (1, N) lane vector.
    ``read`` components: 0-2 position, 3 G*mass."""
    ni = rowsT_ref.shape[1] // ti

    def row_body(i, _):
        i0 = i * ti
        xi = rowsT_ref[0:1, pl.ds(i0, ti)].reshape(ti, 1)
        yi = rowsT_ref[1:2, pl.ds(i0, ti)].reshape(ti, 1)
        zi = rowsT_ref[2:3, pl.ds(i0, ti)].reshape(ti, 1)

        def j_body(j, carry):
            ax, ay, az, ph = carry
            j0 = j * tj
            dx = read(0, j0) - xi
            dy = read(1, j0) - yi
            dz = read(2, j0) - zi
            u = dx * dx + dy * dy + dz * dz + eps2
            inv = _inv_r(u, guarded)
            gminv = read(3, j0) * inv
            w = gminv * (inv * inv)
            ax = ax + jnp.sum(w * dx, axis=1, keepdims=True)
            ay = ay + jnp.sum(w * dy, axis=1, keepdims=True)
            az = az + jnp.sum(w * dz, axis=1, keepdims=True)
            ph = ph - jnp.sum(gminv, axis=1, keepdims=True)
            return ax, ay, az, ph

        zero = jnp.zeros((ti, 1), jnp.float32)
        ax, ay, az, ph = jax.lax.fori_loop(0, nj, j_body, (zero,) * 4)
        atileT = jnp.concatenate(
            [ax.reshape(1, ti), ay.reshape(1, ti), az.reshape(1, ti)],
            axis=0)
        ptileT = ph.reshape(1, ti)
        _accumulate_t(outT_ref, acompT_ref, i0, ti, atileT, first,
                      compensated)
        _accumulate_t(phi_ref, pcomp_ref, i0, ti, ptileT, first,
                      compensated)
        return 0

    jax.lax.fori_loop(0, ni, row_body, 0)


def _accel_phi_kernel_t(rowsT_ref, src_ref, gm_ref, eps2_ref, outT_ref,
                        phi_ref, *, guarded):
    def read(c, j0):
        if c == 3:
            return gm_ref[0:1, pl.ds(j0, TJ_T)]
        return src_ref[c:c + 1, pl.ds(j0, TJ_T)]

    _sweep_t_phi(rowsT_ref, read, outT_ref, phi_ref, None, None,
                 eps2_ref[0, 0], ti=TI_T, tj=TJ_T,
                 nj=src_ref.shape[1] // TJ_T, first=True, guarded=guarded,
                 compensated=False)


def _accel_jerk_kernel_t(rowsT_ref, vrowsT_ref, src_ref, svel_ref, gm_ref,
                         eps2_ref, outT_ref, joutT_ref, *, guarded):
    def read(c, j0):
        if c < 3:
            return src_ref[c:c + 1, pl.ds(j0, TJ_JT)]
        if c < 6:
            return svel_ref[c - 3:c - 2, pl.ds(j0, TJ_JT)]
        return gm_ref[0:1, pl.ds(j0, TJ_JT)]

    _sweep_t_jerk(rowsT_ref, vrowsT_ref, read, outT_ref, joutT_ref,
                  None, None, eps2_ref[0, 0],
                  ti=TI_JT, tj=TJ_JT, nj=src_ref.shape[1] // TJ_JT,
                  first=True, guarded=guarded, compensated=False)


@functools.partial(jax.jit, static_argnames=("guarded",))
def accel_rows_t(pos_rows, src_pos, src_mass, eps, G=1.0,
                 guarded: bool = True):
    """Transposed monolithic accel: rows vs resident sources, f32 in/out.
    Same contract as accel_rows (rows may overlap sources)."""
    nr = pos_rows.shape[0]
    nrp = _round_up(max(nr, TI_T), TI_T)
    rowsT = jnp.pad(pos_rows.T, ((0, 0), (0, nrp - nr)))
    srcT, gm, nsp = _src_layout(src_pos, src_mass,
                                jnp.asarray(G, jnp.float32), tj=TJ_T)
    eps2 = jnp.asarray(eps, jnp.float32).reshape(1, 1) ** 2

    with jax.enable_x64(False):
        outT = _call(
            functools.partial(_accel_kernel_t, guarded=guarded),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((3, nrp), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=22 * nrp * nsp, bytes_accessed=(nrp + nsp) * 16,
                transcendentals=nrp * nsp,
            ),
        )(rowsT, srcT, gm, eps2)
    return outT[:, :nr].T


@functools.partial(jax.jit, static_argnames=("guarded",))
def accel_potential_rows_t(pos_rows, src_pos, src_mass, eps, G=1.0,
                           guarded: bool = True):
    """Transposed monolithic (accel, phi): rows vs resident sources.
    Same contract as accel_potential_rows (caller adds ``self_phi``)."""
    nr = pos_rows.shape[0]
    nrp = _round_up(max(nr, TI_T), TI_T)
    rowsT = jnp.pad(pos_rows.T, ((0, 0), (0, nrp - nr)))
    srcT, gm, nsp = _src_layout(src_pos, src_mass,
                                jnp.asarray(G, jnp.float32), tj=TJ_T)
    eps2 = jnp.asarray(eps, jnp.float32).reshape(1, 1) ** 2

    with jax.enable_x64(False):
        outT, phi = _call(
            functools.partial(_accel_phi_kernel_t, guarded=guarded),
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
            cost_estimate=pl.CostEstimate(
                flops=26 * nrp * nsp, bytes_accessed=(nrp + nsp) * 16,
                transcendentals=nrp * nsp,
            ),
        )(rowsT, srcT, gm, eps2)
    return outT[:, :nr].T, phi[0, :nr]


@functools.partial(jax.jit, static_argnames=("guarded",))
def accel_jerk_rows_t(pos_rows, vel_rows, src_pos, src_vel, src_mass, eps,
                      G=1.0, guarded: bool = True):
    """Transposed monolithic accel+jerk: rows vs resident sources."""
    nr = pos_rows.shape[0]
    nrp = _round_up(max(nr, TI_JT), TI_JT)
    rowsT = jnp.pad(pos_rows.T, ((0, 0), (0, nrp - nr)))
    vrowsT = jnp.pad(vel_rows.T, ((0, 0), (0, nrp - nr)))
    srcT, gm, nsp = _src_layout(src_pos, src_mass,
                                jnp.asarray(G, jnp.float32), tj=TJ_JT)
    svelT = jnp.pad(src_vel.T, ((0, 0), (0, nsp - src_vel.shape[0])))
    eps2 = jnp.asarray(eps, jnp.float32).reshape(1, 1) ** 2

    with jax.enable_x64(False):
        accT, jerkT = _call(
            functools.partial(_accel_jerk_kernel_t, guarded=guarded),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
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
            cost_estimate=pl.CostEstimate(
                flops=50 * nrp * nsp, bytes_accessed=(nrp + nsp) * 32,
                transcendentals=nrp * nsp,
            ),
        )(rowsT, vrowsT, srcT, svelT, gm, eps2)
    return accT[:, :nr].T, jerkT[:, :nr].T


# --------------------------------------------------------------------------
# extended-precision transposed kernel (hi/lo split positions)
# --------------------------------------------------------------------------
#
# The TPU-native answer to "more force accuracy than f32 without emulated
# f64": positions enter as (hi, lo) f32 splits of the f64 state, pair
# separations get the lo correction (d = hi_j - hi_i exactly rounded,
# e = lo_j - lo_i), r^2 carries the first-order 2*d.e cross term, and the
# hardware rsqrt (~1.1e-6/pair, measured) gets one plain-f32 Newton step.
# Error-free transformations verified EXACT inside Mosaic kernels on
# hardware (no XLA algebraic simplifier in the kernel body — unlike the
# jnp tier in ops/df32.py, which needs bitmask splits + barriers).
#
# Accuracy/cost target: ~10x lower per-pair force error than the f32
# kernels at ~1.7x ops. The jnp twin (ops/df32.py accel_extended) is the
# oracle.

TI_X = int(_os.environ.get("OCN_PALLAS_TI_X", 256))
TJ_X = int(_os.environ.get("OCN_PALLAS_TJ_X", 1024))


def _accel_kernel_x(rhiT_ref, rloT_ref, shi_ref, slo_ref, gm_ref,
                    eps2_ref, outT_ref, *, guarded):
    ti, tj = TI_X, TJ_X
    nsp = shi_ref.shape[1]
    nj = nsp // tj
    ni = rhiT_ref.shape[1] // ti
    eps2 = eps2_ref[0, 0]

    def row_body(i, _):
        i0 = i * ti
        xi = rhiT_ref[0:1, pl.ds(i0, ti)].reshape(ti, 1)
        yi = rhiT_ref[1:2, pl.ds(i0, ti)].reshape(ti, 1)
        zi = rhiT_ref[2:3, pl.ds(i0, ti)].reshape(ti, 1)
        xli = rloT_ref[0:1, pl.ds(i0, ti)].reshape(ti, 1)
        yli = rloT_ref[1:2, pl.ds(i0, ti)].reshape(ti, 1)
        zli = rloT_ref[2:3, pl.ds(i0, ti)].reshape(ti, 1)

        def j_body(j, carry):
            ax, ay, az = carry
            j0 = j * tj
            dx = shi_ref[0:1, pl.ds(j0, tj)] - xi
            dy = shi_ref[1:2, pl.ds(j0, tj)] - yi
            dz = shi_ref[2:3, pl.ds(j0, tj)] - zi
            ex = slo_ref[0:1, pl.ds(j0, tj)] - xli
            ey = slo_ref[1:2, pl.ds(j0, tj)] - yli
            ez = slo_ref[2:3, pl.ds(j0, tj)] - zli
            dd = dx * dx + dy * dy + dz * dz
            de = dx * ex + dy * ey + dz * ez
            u = dd + (jnp.float32(2.0) * de + eps2)
            inv = _inv_r(u, guarded)
            # Newton step: removes the VPU rsqrt's ~1.1e-6/pair error
            inv = inv * (jnp.float32(1.5)
                         - (jnp.float32(0.5) * u) * (inv * inv))
            w = gm_ref[0:1, pl.ds(j0, tj)] * (inv * inv * inv)
            ax = ax + jnp.sum(w * (dx + ex), axis=1, keepdims=True)
            ay = ay + jnp.sum(w * (dy + ey), axis=1, keepdims=True)
            az = az + jnp.sum(w * (dz + ez), axis=1, keepdims=True)
            return ax, ay, az

        zero = jnp.zeros((ti, 1), jnp.float32)
        ax, ay, az = jax.lax.fori_loop(0, nj, j_body, (zero, zero, zero))
        outT_ref[:, pl.ds(i0, ti)] = jnp.concatenate(
            [ax.reshape(1, ti), ay.reshape(1, ti), az.reshape(1, ti)],
            axis=0)
        return 0

    jax.lax.fori_loop(0, ni, row_body, 0)


@functools.partial(jax.jit, static_argnames=("guarded",))
def accel_x(pos, mass, eps=0.0, G=1.0, guarded: bool = True):
    """Extended-precision pairwise accel on TPU: f64 in/out, hi/lo split
    outside the kernel (cheap XLA O(N)); Pallas sweep inside. At resident
    production sizes the pair-symmetric variant runs (22.3 vs 44.0 ms at
    65k); past STREAM_N the chunked sym variant (1M: 6.27 vs 12.45 s
    streamed one-sided hilo, +98% — bench/chunked_sym.json); otherwise
    dispatches through accel_rows_x_hilo (round-2 Missing #1)."""
    n = pos.shape[0]
    if SYM_MIN <= n and _sym_enabled():
        if n <= STREAM_N:
            return accel_sym_x(pos, mass, eps, G, guarded=guarded)
        return accel_sym_x_chunked(pos, mass, eps, G, guarded=guarded)
    center = jnp.mean(pos, axis=0)
    hi, lo = _split_rows(pos, center)
    gm = (jnp.asarray(G, jnp.float64)
          * jnp.asarray(mass, jnp.float64)).astype(jnp.float32)
    return accel_rows_x_hilo(hi, lo, hi, lo, gm, eps,
                             guarded=guarded).astype(pos.dtype)


def _accel_phi_kernel_x(rhiT_ref, rloT_ref, shi_ref, slo_ref, gm_ref,
                        eps2_ref, outT_ref, phi_ref, *, guarded):
    """Extended-precision accel+potential sweep (diagnostics tier)."""
    ti, tj = TI_X, TJ_X
    nsp = shi_ref.shape[1]
    nj = nsp // tj
    ni = rhiT_ref.shape[1] // ti
    eps2 = eps2_ref[0, 0]

    def row_body(i, _):
        i0 = i * ti

        def col(ref, c):
            return ref[c:c + 1, pl.ds(i0, ti)].reshape(ti, 1)

        xi = [col(rhiT_ref, c) for c in range(3)]
        xli = [col(rloT_ref, c) for c in range(3)]

        def j_body(j, carry):
            ax, ay, az, ph = carry
            j0 = j * tj
            sl = pl.ds(j0, tj)
            d = [shi_ref[c:c + 1, sl] - xi[c] for c in range(3)]
            e = [slo_ref[c:c + 1, sl] - xli[c] for c in range(3)]
            dd = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
            de = d[0] * e[0] + d[1] * e[1] + d[2] * e[2]
            u = dd + (jnp.float32(2.0) * de + eps2)
            inv = _inv_r(u, guarded)
            inv = inv * (jnp.float32(1.5)
                         - (jnp.float32(0.5) * u) * (inv * inv))
            gminv = gm_ref[0:1, sl] * inv
            w = gminv * (inv * inv)
            ax = ax + jnp.sum(w * (d[0] + e[0]), axis=1, keepdims=True)
            ay = ay + jnp.sum(w * (d[1] + e[1]), axis=1, keepdims=True)
            az = az + jnp.sum(w * (d[2] + e[2]), axis=1, keepdims=True)
            ph = ph - jnp.sum(gminv, axis=1, keepdims=True)
            return ax, ay, az, ph

        zero = jnp.zeros((ti, 1), jnp.float32)
        ax, ay, az, ph = jax.lax.fori_loop(0, nj, j_body, (zero,) * 4)
        outT_ref[:, pl.ds(i0, ti)] = jnp.concatenate(
            [ax.reshape(1, ti), ay.reshape(1, ti), az.reshape(1, ti)],
            axis=0)
        phi_ref[:, pl.ds(i0, ti)] = ph.reshape(1, ti)
        return 0

    jax.lax.fori_loop(0, ni, row_body, 0)


@functools.partial(jax.jit, static_argnames=("guarded",))
def accel_potential_x(pos, mass, eps=0.0, G=1.0, guarded: bool = True):
    """Extended-precision (accel, phi_pair) on TPU; f64 in/out. When
    eps > 0 phi INCLUDES the softened self term -G*m/eps (the caller's
    contract adds self_phi to cancel, same as the other kernels).
    Pair-symmetric at production sizes (same dispatch rule as accel_x);
    past STREAM_N the chunked sym variant; otherwise the one-sided hilo
    sweep (streamed from HBM past STREAM_N)."""
    n = pos.shape[0]
    if SYM_MIN <= n and _sym_enabled():
        if n <= STREAM_N:
            return accel_potential_sym_x(pos, mass, eps, G, guarded=guarded)
        return accel_potential_sym_x_chunked(pos, mass, eps, G,
                                             guarded=guarded)
    center = jnp.mean(pos, axis=0)
    hi, lo = _split_rows(pos, center)
    gm = (jnp.asarray(G, jnp.float64)
          * jnp.asarray(mass, jnp.float64)).astype(jnp.float32)
    acc, phi = accel_potential_rows_x_hilo(hi, lo, hi, lo, gm, eps,
                                           guarded=guarded)
    return acc.astype(pos.dtype), phi.astype(pos.dtype)


TI_XJ = int(_os.environ.get("OCN_PALLAS_TI_XJ", 128))
TJ_XJ = int(_os.environ.get("OCN_PALLAS_TJ_XJ", 1024))


def _accel_jerk_kernel_x(rhiT_ref, rloT_ref, vhiT_ref, vloT_ref, shi_ref,
                         slo_ref, svhi_ref, svlo_ref, gm_ref, eps2_ref,
                         outT_ref, joutT_ref, *, guarded):
    """Extended-precision accel+jerk sweep: hi/lo positions AND
    velocities; rv carries the first-order lo cross terms."""
    ti, tj = TI_XJ, TJ_XJ
    nsp = shi_ref.shape[1]
    nj = nsp // tj
    ni = rhiT_ref.shape[1] // ti
    eps2 = eps2_ref[0, 0]

    def row_body(i, _):
        i0 = i * ti

        def col(ref, c):
            return ref[c:c + 1, pl.ds(i0, ti)].reshape(ti, 1)

        xi = [col(rhiT_ref, c) for c in range(3)]
        xli = [col(rloT_ref, c) for c in range(3)]
        vi = [col(vhiT_ref, c) for c in range(3)]
        vli = [col(vloT_ref, c) for c in range(3)]

        def j_body(j, carry):
            acc, jrk = carry[:3], carry[3:]
            j0 = j * tj
            sl = pl.ds(j0, tj)
            d = [shi_ref[c:c + 1, sl] - xi[c] for c in range(3)]
            e = [slo_ref[c:c + 1, sl] - xli[c] for c in range(3)]
            dv = [(svhi_ref[c:c + 1, sl] - vi[c])
                  + (svlo_ref[c:c + 1, sl] - vli[c]) for c in range(3)]
            dd = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
            de = d[0] * e[0] + d[1] * e[1] + d[2] * e[2]
            u = dd + (jnp.float32(2.0) * de + eps2)
            inv = _inv_r(u, guarded)
            inv = inv * (jnp.float32(1.5)
                         - (jnp.float32(0.5) * u) * (inv * inv))
            w = gm_ref[0:1, sl] * (inv * inv * inv)
            rv = ((d[0] + e[0]) * dv[0] + (d[1] + e[1]) * dv[1]
                  + (d[2] + e[2]) * dv[2])
            s = (jnp.float32(3.0) * rv) * w * (inv * inv)
            out = []
            for c in range(3):
                out.append(acc[c] + jnp.sum(w * (d[c] + e[c]), axis=1,
                                            keepdims=True))
            for c in range(3):
                out.append(jrk[c] + jnp.sum(
                    w * dv[c] - s * (d[c] + e[c]), axis=1, keepdims=True))
            return tuple(out)

        zero = jnp.zeros((ti, 1), jnp.float32)
        res = jax.lax.fori_loop(0, nj, j_body, (zero,) * 6)
        outT_ref[:, pl.ds(i0, ti)] = jnp.concatenate(
            [res[c].reshape(1, ti) for c in range(3)], axis=0)
        joutT_ref[:, pl.ds(i0, ti)] = jnp.concatenate(
            [res[3 + c].reshape(1, ti) for c in range(3)], axis=0)
        return 0

    jax.lax.fori_loop(0, ni, row_body, 0)


@functools.partial(jax.jit, static_argnames=("guarded",))
def accel_jerk_rows_x(pos_rows, vel_rows, src_pos, src_vel, src_mass,
                      eps=0.0, G=1.0, guarded: bool = True):
    """Extended-precision (accel, jerk) on a row subset vs the full
    source set (the block-timestep active-row evaluation at the extended
    tier); f64 in/out. Rows and sources are centred on the source means
    before splitting so both hi planes share one frame. Streams sources
    from HBM past STREAM_N via the hilo entry point."""
    center = jnp.mean(src_pos, axis=0)
    vcenter = jnp.mean(src_vel, axis=0)
    rhi, rlo = _split_rows(pos_rows, center)
    rvhi, rvlo = _split_rows(vel_rows, vcenter)
    shi, slo = _split_rows(src_pos, center)
    svhi, svlo = _split_rows(src_vel, vcenter)
    gm = (jnp.asarray(G, jnp.float64)
          * jnp.asarray(src_mass, jnp.float64)).astype(jnp.float32)
    acc, jerk = accel_jerk_rows_x_hilo(rhi, rlo, rvhi, rvlo, shi, slo,
                                       svhi, svlo, gm, eps, guarded=guarded)
    return acc.astype(pos_rows.dtype), jerk.astype(pos_rows.dtype)


def accel_jerk_x(pos, vel, mass, eps=0.0, G=1.0, guarded: bool = True):
    """Extended-precision (accel, jerk), self-interaction form (the
    Hermite shared-step force evaluation at the extended tier). At
    resident production sizes the pair-symmetric variant runs (41.7 vs
    78.4 ms at 65k, measured unguarded)."""
    n = pos.shape[0]
    if SYM_MIN <= n and _sym_enabled():
        if n <= STREAM_N:
            return accel_jerk_sym_x(pos, vel, mass, eps, G, guarded=guarded)
        return accel_jerk_sym_x_chunked(pos, vel, mass, eps, G,
                                        guarded=guarded)
    return accel_jerk_rows_x(pos, vel, pos, vel, mass, eps, G, guarded)


# --------------------------------------------------------------------------
# extended tier: HBM-streamed + pre-split (hi, lo)-plane entry points
# --------------------------------------------------------------------------
#
# Round-2 VERDICT Missing #1: the extended tier existed only in the
# single-chip VMEM-resident regime, locking the accuracy lever out of
# exactly the runs where f32 force error accumulates worst (sharded c5,
# streamed c6). Two additions close the seam:
#
#   * STREAMED kernels: hi and lo source planes ride the second grid
#     dimension exactly like the f32 streamed family above; the row block
#     stays VMEM-resident and accumulates ACROSS source tiles with Kahan
#     compensation unconditionally — the tier exists for accuracy, so the
#     cross-tile sum must not grow ~sqrt(n_tiles)·eps_f32 at N=1M.
#   * PRE-SPLIT (hi, lo) planes as the public interface
#     (``*_x_hilo``): the sharded engine (parallel/force.py) splits ONCE
#     under the global source centring outside shard_map and hands each
#     chip its slab, so every chip's hi plane shares one frame — a
#     per-shard centring would break the hi/lo invariant as slabs
#     circulate the ring. Single-chip callers (accel_x and friends)
#     split internally and forward here, which also gives them the
#     streamed dispatch for free.
#
# The jnp twins (ops/df32.accel_rows_x_hilo etc.) are the oracles; tested
# in interpret mode in tests/distributed/test_sharded_extended.py.

TI_XS = int(_os.environ.get("OCN_PALLAS_TI_XS", 256))
TJ_XS = int(_os.environ.get("OCN_PALLAS_TJ_XS", 1024))


def _ext_tile(rows_slc, src_slc, eps2, guarded):
    """Shared extended-pair geometry for one (TI, TJ) tile.

    rows_slc: ((TI,1) hi xyz, (TI,1) lo xyz); src_slc: ((1,TJ) hi xyz,
    (1,TJ) lo xyz). Returns (d, e, inv) with d+e the lo-corrected
    separation and inv the Newton-refined 1/r."""
    (xh, yh, zh), (xl, yl, zl) = rows_slc
    (sxh, syh, szh), (sxl, syl, szl) = src_slc
    d = (sxh - xh, syh - yh, szh - zh)
    e = (sxl - xl, syl - yl, szl - zl)
    dd = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
    de = d[0] * e[0] + d[1] * e[1] + d[2] * e[2]
    u = dd + (jnp.float32(2.0) * de + eps2)
    inv = _inv_r(u, guarded)
    inv = inv * (jnp.float32(1.5) - (jnp.float32(0.5) * u) * (inv * inv))
    return d, e, inv


def _rows_cols(hi_ref, lo_ref):
    return ((hi_ref[:, 0:1], hi_ref[:, 1:2], hi_ref[:, 2:3]),
            (lo_ref[:, 0:1], lo_ref[:, 1:2], lo_ref[:, 2:3]))


def _src_rows(hi_ref, lo_ref):
    return ((hi_ref[0:1, :], hi_ref[1:2, :], hi_ref[2:3, :]),
            (lo_ref[0:1, :], lo_ref[1:2, :], lo_ref[2:3, :]))


def _accel_stream_kernel_x(rhi_ref, rlo_ref, shi_ref, slo_ref, gm_ref,
                           eps2_ref, out_ref, comp_ref, *, guarded):
    j = pl.program_id(1)
    d, e, inv = _ext_tile(_rows_cols(rhi_ref, rlo_ref),
                          _src_rows(shi_ref, slo_ref),
                          eps2_ref[0, 0], guarded)
    w = gm_ref[0:1, :] * (inv * inv * inv)
    partial = jnp.concatenate(
        [jnp.sum(w * (d[c] + e[c]), axis=1, keepdims=True)
         for c in range(3)], axis=1)

    @pl.when(j == 0)
    def _init():
        out_ref[:] = partial
        comp_ref[:] = jnp.zeros_like(comp_ref)

    @pl.when(j != 0)
    def _accumulate():
        t, c = _two_sum(out_ref[:], comp_ref[:], partial)
        out_ref[:] = t
        comp_ref[:] = c


def _accel_phi_stream_kernel_x(rhi_ref, rlo_ref, shi_ref, slo_ref, gm_ref,
                               eps2_ref, out_ref, phi_ref, comp_ref,
                               pcomp_ref, *, guarded):
    j = pl.program_id(1)
    d, e, inv = _ext_tile(_rows_cols(rhi_ref, rlo_ref),
                          _src_rows(shi_ref, slo_ref),
                          eps2_ref[0, 0], guarded)
    gminv = gm_ref[0:1, :] * inv
    w = gminv * (inv * inv)
    partial = jnp.concatenate(
        [jnp.sum(w * (d[c] + e[c]), axis=1, keepdims=True)
         for c in range(3)], axis=1)
    ph = -jnp.sum(gminv, axis=1, keepdims=True)

    @pl.when(j == 0)
    def _init():
        out_ref[:] = partial
        phi_ref[:] = ph
        comp_ref[:] = jnp.zeros_like(comp_ref)
        pcomp_ref[:] = jnp.zeros_like(pcomp_ref)

    @pl.when(j != 0)
    def _accumulate():
        t, c = _two_sum(out_ref[:], comp_ref[:], partial)
        out_ref[:] = t
        comp_ref[:] = c
        tp, cp = _two_sum(phi_ref[:], pcomp_ref[:], ph)
        phi_ref[:] = tp
        pcomp_ref[:] = cp


def _accel_jerk_stream_kernel_x(rhi_ref, rlo_ref, vhi_ref, vlo_ref,
                                shi_ref, slo_ref, svhi_ref, svlo_ref,
                                gm_ref, eps2_ref, out_ref, jout_ref,
                                acomp_ref, jcomp_ref, *, guarded):
    j = pl.program_id(1)
    d, e, inv = _ext_tile(_rows_cols(rhi_ref, rlo_ref),
                          _src_rows(shi_ref, slo_ref),
                          eps2_ref[0, 0], guarded)
    (vh, vl) = _rows_cols(vhi_ref, vlo_ref)
    (svh, svl) = _src_rows(svhi_ref, svlo_ref)
    dv = tuple((svh[c] - vh[c]) + (svl[c] - vl[c]) for c in range(3))
    w = gm_ref[0:1, :] * (inv * inv * inv)
    rv = ((d[0] + e[0]) * dv[0] + (d[1] + e[1]) * dv[1]
          + (d[2] + e[2]) * dv[2])
    s = (jnp.float32(3.0) * rv) * w * (inv * inv)
    pa = jnp.concatenate(
        [jnp.sum(w * (d[c] + e[c]), axis=1, keepdims=True)
         for c in range(3)], axis=1)
    pj = jnp.concatenate(
        [jnp.sum(w * dv[c] - s * (d[c] + e[c]), axis=1, keepdims=True)
         for c in range(3)], axis=1)

    @pl.when(j == 0)
    def _init():
        out_ref[:] = pa
        jout_ref[:] = pj
        acomp_ref[:] = jnp.zeros_like(acomp_ref)
        jcomp_ref[:] = jnp.zeros_like(jcomp_ref)

    @pl.when(j != 0)
    def _accumulate():
        ta, ca = _two_sum(out_ref[:], acomp_ref[:], pa)
        out_ref[:] = ta
        acomp_ref[:] = ca
        tj, cj = _two_sum(jout_ref[:], jcomp_ref[:], pj)
        jout_ref[:] = tj
        jcomp_ref[:] = cj


@functools.partial(jax.jit, static_argnames=("guarded",))
def accel_rows_x_hilo(rhi, rlo, shi, slo, gm, eps, guarded: bool = True):
    """Extended-tier rows-vs-sources accel on pre-split (hi, lo) f32
    planes; all-f32 in/out. Sources beyond STREAM_N dispatch to the
    HBM-streamed kernel; below, the VMEM-resident transposed kernel
    (_accel_kernel_x) runs — the same body as accel_x."""
    nr, ns = rhi.shape[0], shi.shape[0]
    eps2 = jnp.asarray(eps, jnp.float32).reshape(1, 1) ** 2
    if ns > STREAM_N or nr > RT_MAX_ROWS:
        nrp = _round_up(max(nr, TI_XS), TI_XS)
        nsp = _round_up(max(ns, TJ_XS), TJ_XS)
        with jax.enable_x64(False):
            out = _call(
                functools.partial(_accel_stream_kernel_x, guarded=guarded),
                grid=(nrp // TI_XS, nsp // TJ_XS),
                in_specs=[
                    pl.BlockSpec((TI_XS, 3), lambda i, j: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((TI_XS, 3), lambda i, j: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((3, TJ_XS), lambda i, j: (0, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((3, TJ_XS), lambda i, j: (0, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, TJ_XS), lambda i, j: (0, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                ],
                out_specs=pl.BlockSpec((TI_XS, 3), lambda i, j: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((nrp, 3), jnp.float32),
                scratch_shapes=[pltpu.VMEM((TI_XS, 3), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "arbitrary")),
                cost_estimate=pl.CostEstimate(
                    flops=40 * nrp * nsp,
                    bytes_accessed=nrp * 28 * (nsp // TJ_XS) + nsp * 28,
                    transcendentals=nrp * nsp,
                ),
            )(_pad_rows(rhi, nrp), _pad_rows(rlo, nrp), _padT(shi, nsp),
              _padT(slo, nsp), jnp.pad(gm[None, :], ((0, 0), (0, nsp - ns))),
              eps2)
        return out[:nr]
    nrp = _round_up(max(nr, TI_X), TI_X)
    nsp = _round_up(max(ns, TJ_X), TJ_X)
    with jax.enable_x64(False):
        outT = _call(
            functools.partial(_accel_kernel_x, guarded=guarded),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5
                     + [pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((3, nrp), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=36 * nrp * nsp, bytes_accessed=(nrp + nsp) * 32,
                transcendentals=nrp * nsp,
            ),
        )(_padT(rhi, nrp), _padT(rlo, nrp), _padT(shi, nsp),
          _padT(slo, nsp), jnp.pad(gm[None, :], ((0, 0), (0, nsp - ns))),
          eps2)
    return outT[:, :nr].T


@functools.partial(jax.jit, static_argnames=("guarded",))
def accel_potential_rows_x_hilo(rhi, rlo, shi, slo, gm, eps,
                                guarded: bool = True):
    """Extended-tier rows-vs-sources (accel, phi) on pre-split planes;
    f32 in/out. When eps > 0 phi INCLUDES the softened self term for rows
    that are also sources (caller adds gravity.self_phi to cancel)."""
    nr, ns = rhi.shape[0], shi.shape[0]
    eps2 = jnp.asarray(eps, jnp.float32).reshape(1, 1) ** 2
    if ns > STREAM_N or nr > RT_MAX_ROWS:
        nrp = _round_up(max(nr, TI_XS), TI_XS)
        nsp = _round_up(max(ns, TJ_XS), TJ_XS)
        with jax.enable_x64(False):
            acc, phi = _call(
                functools.partial(_accel_phi_stream_kernel_x,
                                  guarded=guarded),
                grid=(nrp // TI_XS, nsp // TJ_XS),
                in_specs=[
                    pl.BlockSpec((TI_XS, 3), lambda i, j: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((TI_XS, 3), lambda i, j: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((3, TJ_XS), lambda i, j: (0, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((3, TJ_XS), lambda i, j: (0, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, TJ_XS), lambda i, j: (0, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                ],
                out_specs=(
                    pl.BlockSpec((TI_XS, 3), lambda i, j: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((TI_XS, 1), lambda i, j: (i, 0),
                                 memory_space=pltpu.VMEM),
                ),
                out_shape=(
                    jax.ShapeDtypeStruct((nrp, 3), jnp.float32),
                    jax.ShapeDtypeStruct((nrp, 1), jnp.float32),
                ),
                scratch_shapes=[pltpu.VMEM((TI_XS, 3), jnp.float32),
                                pltpu.VMEM((TI_XS, 1), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "arbitrary")),
                cost_estimate=pl.CostEstimate(
                    flops=44 * nrp * nsp,
                    bytes_accessed=nrp * 32 * (nsp // TJ_XS) + nsp * 28,
                    transcendentals=nrp * nsp,
                ),
            )(_pad_rows(rhi, nrp), _pad_rows(rlo, nrp), _padT(shi, nsp),
              _padT(slo, nsp),
              jnp.pad(gm[None, :], ((0, 0), (0, nsp - ns))), eps2)
        return acc[:nr], phi[:nr, 0]
    nrp = _round_up(max(nr, TI_X), TI_X)
    nsp = _round_up(max(ns, TJ_X), TJ_X)
    with jax.enable_x64(False):
        outT, phi = _call(
            functools.partial(_accel_phi_kernel_x, guarded=guarded),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5
                     + [pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM)),
            out_shape=(jax.ShapeDtypeStruct((3, nrp), jnp.float32),
                       jax.ShapeDtypeStruct((1, nrp), jnp.float32)),
            cost_estimate=pl.CostEstimate(
                flops=40 * nrp * nsp, bytes_accessed=(nrp + nsp) * 32,
                transcendentals=nrp * nsp,
            ),
        )(_padT(rhi, nrp), _padT(rlo, nrp), _padT(shi, nsp),
          _padT(slo, nsp), jnp.pad(gm[None, :], ((0, 0), (0, nsp - ns))),
          eps2)
    return outT[:, :nr].T, phi[0, :nr]


@functools.partial(jax.jit, static_argnames=("guarded",))
def accel_jerk_rows_x_hilo(rhi, rlo, vhi, vlo, shi, slo, svhi, svlo, gm,
                           eps, guarded: bool = True):
    """Extended-tier rows-vs-sources (accel, jerk) on pre-split position
    AND velocity planes; f32 in/out."""
    nr, ns = rhi.shape[0], shi.shape[0]
    eps2 = jnp.asarray(eps, jnp.float32).reshape(1, 1) ** 2
    if ns > STREAM_N or nr > RT_MAX_ROWS:
        nrp = _round_up(max(nr, TI_XS), TI_XS)
        nsp = _round_up(max(ns, TJ_XS), TJ_XS)
        row_spec = pl.BlockSpec((TI_XS, 3), lambda i, j: (i, 0),
                                memory_space=pltpu.VMEM)
        src_spec = pl.BlockSpec((3, TJ_XS), lambda i, j: (0, j),
                                memory_space=pltpu.VMEM)
        with jax.enable_x64(False):
            acc, jerk = _call(
                functools.partial(_accel_jerk_stream_kernel_x,
                                  guarded=guarded),
                grid=(nrp // TI_XS, nsp // TJ_XS),
                in_specs=[row_spec] * 4 + [src_spec] * 4 + [
                    pl.BlockSpec((1, TJ_XS), lambda i, j: (0, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                ],
                out_specs=(row_spec, row_spec),
                out_shape=(
                    jax.ShapeDtypeStruct((nrp, 3), jnp.float32),
                    jax.ShapeDtypeStruct((nrp, 3), jnp.float32),
                ),
                scratch_shapes=[pltpu.VMEM((TI_XS, 3), jnp.float32),
                                pltpu.VMEM((TI_XS, 3), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "arbitrary")),
                cost_estimate=pl.CostEstimate(
                    flops=74 * nrp * nsp,
                    bytes_accessed=nrp * 52 * (nsp // TJ_XS) + nsp * 52,
                    transcendentals=nrp * nsp,
                ),
            )(_pad_rows(rhi, nrp), _pad_rows(rlo, nrp),
              _pad_rows(vhi, nrp), _pad_rows(vlo, nrp),
              _padT(shi, nsp), _padT(slo, nsp),
              _padT(svhi, nsp), _padT(svlo, nsp),
              jnp.pad(gm[None, :], ((0, 0), (0, nsp - ns))), eps2)
        return acc[:nr], jerk[:nr]
    nrp = _round_up(max(nr, TI_XJ), TI_XJ)
    nsp = _round_up(max(ns, TJ_XJ), TJ_XJ)
    with jax.enable_x64(False):
        outT, joutT = _call(
            functools.partial(_accel_jerk_kernel_x, guarded=guarded),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 9
                     + [pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM)),
            out_shape=(jax.ShapeDtypeStruct((3, nrp), jnp.float32),
                       jax.ShapeDtypeStruct((3, nrp), jnp.float32)),
            cost_estimate=pl.CostEstimate(
                flops=70 * nrp * nsp, bytes_accessed=(nrp + nsp) * 56,
                transcendentals=nrp * nsp,
            ),
        )(_padT(rhi, nrp), _padT(rlo, nrp), _padT(vhi, nrp),
          _padT(vlo, nrp), _padT(shi, nsp), _padT(slo, nsp),
          _padT(svhi, nsp), _padT(svlo, nsp),
          jnp.pad(gm[None, :], ((0, 0), (0, nsp - ns))), eps2)
    return outT[:, :nr].T, joutT[:, :nr].T


# --------------------------------------------------------------------------
# pair-symmetric (Newton's-3rd-law) jerk kernel — W3 prototype
# --------------------------------------------------------------------------
#
# The jerk kernel is the binding perf constraint (round-2 W3: 9.8e10 int/s
# vs accel's 2.04e11; Hermite/block pay it twice per PEC² step). The ~50
# ops/pair + 1 rsqrt/pair roofline explains the gap — so halve the PAIRS:
# each (i, j) tile pair with j > i is computed ONCE and accumulated into
# BOTH blocks. The per-pair force/jerk differ between the two directions
# only by the mass factor and sign:
#     a_i += gm_j·w·d       a_j -= gm_i·w·d         (d = x_j − x_i)
#     j_i += gm_j·w·B       j_j -= gm_i·w·B,   B_c = dv_c − (3rv·inv²)·d_c
# so the expensive geometry (d, dv, r², rsqrt, rv, B) is shared and only
# the two mass-weighted reductions differ: ~60% of the ops and HALF the
# rsqrts per pair vs the one-sided sweep. Diagonal tiles run one-sided
# (self-pairs contribute exactly 0 to accel/jerk: d = dv = 0).
#
# Cost of admission: the j-block contribution is a read-modify-write into
# the resident (3, N) accumulators per tile — sequential fori_loop, so no
# races, but extra VMEM traffic the one-sided kernel doesn't pay. Whether
# the op saving beats the rmw overhead is a MEASUREMENT (bench/jerk_sym
# section in docs/PERFORMANCE.md); the dispatch only uses this kernel if
# OCN_PALLAS_JERK_SYM=1.

# 512 OOMs the 16 MiB scoped-VMEM stack (measured: 17.23M requested — the
# two (3, N) rmw accumulators + ~14 live (t, t) temporaries); 384 fits
# and beats 256 (65k jerk: 33.4 vs 35.2 ms, swept on hardware).
T_SYM = int(_os.environ.get("OCN_PALLAS_T_SYM", 384))

# self-interaction sym dispatch floor: below this the tile triangle is
# too shallow to matter and sub-ms timings are relay-noise dominated
SYM_MIN = int(_os.environ.get("OCN_PALLAS_SYM_MIN", 8192))



def _sym_enabled() -> bool:
    """Pair-symmetric self-interaction dispatch switch (read at trace
    time). OCN_PALLAS_SYM=0 disables all three sym kernels;
    OCN_PALLAS_JERK_SYM is honoured as a legacy alias."""
    v = _os.environ.get("OCN_PALLAS_SYM")
    if v is None:
        v = _os.environ.get("OCN_PALLAS_JERK_SYM", "1")
    return v == "1"


# Square-tile sizes per op (hardware-swept; see each original family's
# notes, condensed): accel-only tiles are larger (fewer live temporaries),
# jerk smallest; the extended (hi/lo) tiers halve again for the extra
# planes. T_SYMX=512 measured 22.29 ms at 65k but OOMs scoped VMEM at
# small npad (the limit interacts with the total padded size) — 384
# compiles everywhere for 1.4%.
T_SYMA = int(_os.environ.get("OCN_PALLAS_T_SYMA", 512))
T_SYMP = int(_os.environ.get("OCN_PALLAS_T_SYMP", 512))
T_SYMX = int(_os.environ.get("OCN_PALLAS_T_SYMX", 384))
T_SYMXP = int(_os.environ.get("OCN_PALLAS_T_SYMXP", 384))
T_SYMXJ = int(_os.environ.get("OCN_PALLAS_T_SYMXJ", 256))

# Chunk sizes for the past-resident-cap (HBM-bound) chunked forms: each
# must be a multiple of its op's tile; sized so the cross kernel's
# resident footprint (2 chunks x planes + outputs + gm rows) stays under
# the 16 MiB scoped-VMEM budget alongside the (t, t) temporaries
# (98304 for the xj family would be 14.9 MB — the same OOM class as
# T_SYMX=512; 73728 = 256*288 keeps it at ~11.2 MB).
CHUNK_SYM = int(_os.environ.get("OCN_PALLAS_CHUNK_SYM", 131072))
CHUNK_SYMJ = int(_os.environ.get("OCN_PALLAS_CHUNK_SYMJ", 98304))
CHUNK_SYMX = int(_os.environ.get("OCN_PALLAS_CHUNK_SYMX", 98304))
CHUNK_SYMXJ = int(_os.environ.get("OCN_PALLAS_CHUNK_SYMXJ", 73728))


# --------------------------------------------------------------------------
# pair-symmetric kernel family, factored (VERDICT round-3 W2)
# --------------------------------------------------------------------------
# The per-op pair-physics specs and the GENERATED {sym, cross, chunked,
# batched} kernel forms live in ops/pallas_pair.py (imported at the top);
# this file keeps the thin public wrappers below, which read the
# hardware-swept tile/chunk constants above at call time (tests
# monkeypatch them on THIS module).

# ---- public wrappers: resident sym forms -----------------------------------

@functools.partial(jax.jit, static_argnames=("guarded",))
def accel_sym(pos, mass, eps=0.0, G=1.0, guarded: bool = True):
    """Pair-symmetric accel, self-interaction form (f32 tolerance vs the
    one-sided oracle: reaction terms arrive column-wise)."""
    n = pos.shape[0]
    npad = _round_up(max(n, T_SYMA), T_SYMA)
    planes, gm, _ = _prep_f32_T(pos, mass, G, npad)
    eps2 = jnp.asarray(eps, jnp.float32).reshape(1, 1) ** 2
    with jax.enable_x64(False):
        (outT,) = _sym_call(_OP_A, T_SYMA, planes, gm, eps2, guarded)
    return outT[:, :n].T.astype(pos.dtype)


@functools.partial(jax.jit, static_argnames=("guarded",))
def accel_potential_sym(pos, mass, eps=0.0, G=1.0, guarded: bool = True):
    """Pair-symmetric (accel, phi_pair), self-interaction form; phi
    follows the one-sided contract (self term included when eps > 0 —
    this wrapper adds self_phi exactly like accel_potential)."""
    n = pos.shape[0]
    npad = _round_up(max(n, T_SYMP), T_SYMP)
    planes, gm, mass_c = _prep_f32_T(pos, mass, G, npad)
    eps32 = jnp.asarray(eps, jnp.float32)
    eps2 = eps32.reshape(1, 1) ** 2
    with jax.enable_x64(False):
        outT, phi = _sym_call(_OP_P, T_SYMP, planes, gm, eps2, guarded)
    acc = outT[:, :n].T
    phi = phi[0, :n] + self_phi(mass_c, eps32, jnp.asarray(G, jnp.float32))
    return acc.astype(pos.dtype), phi.astype(pos.dtype)


@functools.partial(jax.jit, static_argnames=("guarded",))
def accel_jerk_sym(pos, vel, mass, eps=0.0, G=1.0, guarded: bool = True):
    """Pair-symmetric (accel, jerk), self-interaction form. Accumulation
    order differs from the one-sided kernels (reaction terms arrive
    column-wise), so agreement with the oracle is to f32 tolerance, not
    bitwise."""
    n = pos.shape[0]
    npad = _round_up(max(n, T_SYM), T_SYM)
    planes, gm, _ = _prep_f32_T(pos, mass, G, npad, vel=vel)
    eps2 = jnp.asarray(eps, jnp.float32).reshape(1, 1) ** 2
    with jax.enable_x64(False):
        outT, joutT = _sym_call(_OP_J, T_SYM, planes, gm, eps2, guarded)
    return outT[:, :n].T.astype(pos.dtype), joutT[:, :n].T.astype(pos.dtype)


@functools.partial(jax.jit, static_argnames=("guarded",))
def accel_sym_x(pos, mass, eps=0.0, G=1.0, guarded: bool = True):
    """Extended-tier pair-symmetric accel, self-interaction form; f64
    in/out (hi/lo split internally, same frame for both roles). Measured
    at 65k: 22.3 ms vs 44.0 one-sided accel_x (+95%) — extended accuracy
    at the old f32 production price, close-pair error unchanged."""
    n = pos.shape[0]
    npad = _round_up(max(n, T_SYMX), T_SYMX)
    planes, gm = _prep_x_T(pos, mass, G, npad)
    eps2 = jnp.asarray(eps, jnp.float32).reshape(1, 1) ** 2
    with jax.enable_x64(False):
        (outT,) = _sym_call(_OP_AX, T_SYMX, planes, gm, eps2, guarded)
    return outT[:, :n].T.astype(pos.dtype)


@functools.partial(jax.jit, static_argnames=("guarded",))
def accel_potential_sym_x(pos, mass, eps=0.0, G=1.0, guarded: bool = True):
    """Extended-tier pair-symmetric (accel, phi_pair), self-interaction
    form; f64 in/out. RAW phi contract (same as accel_potential_x): when
    eps > 0 phi includes the softened self term; the caller adds
    gravity.self_phi."""
    n = pos.shape[0]
    npad = _round_up(max(n, T_SYMXP), T_SYMXP)
    planes, gm = _prep_x_T(pos, mass, G, npad)
    eps2 = jnp.asarray(eps, jnp.float32).reshape(1, 1) ** 2
    with jax.enable_x64(False):
        outT, phi = _sym_call(_OP_PX, T_SYMXP, planes, gm, eps2, guarded)
    return (outT[:, :n].T.astype(pos.dtype), phi[0, :n].astype(pos.dtype))


@functools.partial(jax.jit, static_argnames=("guarded",))
def accel_jerk_sym_x(pos, vel, mass, eps=0.0, G=1.0, guarded: bool = True):
    """Extended-tier pair-symmetric (accel, jerk), self-interaction form;
    f64 in/out (hi/lo positions AND velocities)."""
    n = pos.shape[0]
    npad = _round_up(max(n, T_SYMXJ), T_SYMXJ)
    planes, gm = _prep_x_T(pos, mass, G, npad, vel=vel)
    eps2 = jnp.asarray(eps, jnp.float32).reshape(1, 1) ** 2
    with jax.enable_x64(False):
        outT, joutT = _sym_call(_OP_JX, T_SYMXJ, planes, gm, eps2, guarded)
    return (outT[:, :n].T.astype(pos.dtype),
            joutT[:, :n].T.astype(pos.dtype))


# ---- public wrappers: chunked (past the resident cap) ----------------------
#
# The resident sym kernels stop at STREAM_N (whole (3, N) + accumulators
# must fit VMEM); the chunked forms keep the pair-halving at 1M+ by
# running each diagonal chunk through the sym kernel and each unordered
# chunk PAIR through the cross kernel — Newton's 3rd law at the chunk
# level, no HBM read-modify-write anywhere. Measured (bench/
# chunked_sym.json): 1M accel 4036 vs 6046 ms one-sided streamed (+50%,
# 2.72e11 N²-eq int/s), phi +41%, jerk +34%.

@functools.partial(jax.jit, static_argnames=("guarded", "chunk"))
def accel_sym_chunked(pos, mass, eps=0.0, G=1.0, guarded: bool = True,
                      chunk: int | None = None):
    """Pair-symmetric self-interaction accel for N past the resident cap.
    Functionally identical to accel_sym (f32 tolerance: chunk
    contributions sum in arrival order)."""
    chunk = CHUNK_SYM if chunk is None else chunk
    _chunk_check(chunk, T_SYMA, "T_SYMA")
    n = pos.shape[0]
    npad = -(-max(n, 1) // chunk) * chunk
    planes, gm, _ = _prep_f32_T(pos, mass, G, npad)
    eps2 = jnp.asarray(eps, jnp.float32).reshape(1, 1) ** 2
    with jax.enable_x64(False):
        (outT,) = _sym_chunked_generic(_OP_A, T_SYMA, chunk, planes, gm,
                                       eps2, guarded)
    return outT[:, :n].T.astype(pos.dtype)


@functools.partial(jax.jit, static_argnames=("guarded", "chunk"))
def accel_potential_sym_chunked(pos, mass, eps=0.0, G=1.0,
                                guarded: bool = True,
                                chunk: int | None = None):
    """Chunked pair-symmetric (accel, phi) past the resident cap — the
    diagnostics-pass twin of accel_sym_chunked. phi follows the one-sided
    contract (softened self term via the diagonal chunks when eps > 0;
    this wrapper adds self_phi like accel_potential)."""
    chunk = CHUNK_SYM if chunk is None else chunk
    _chunk_check(chunk, T_SYMP, "T_SYMP")
    n = pos.shape[0]
    npad = -(-max(n, 1) // chunk) * chunk
    planes, gm, mass_c = _prep_f32_T(pos, mass, G, npad)
    eps32 = jnp.asarray(eps, jnp.float32)
    eps2 = eps32.reshape(1, 1) ** 2
    with jax.enable_x64(False):
        outT, phi = _sym_chunked_generic(_OP_P, T_SYMP, chunk, planes, gm,
                                         eps2, guarded)
    acc = outT[:, :n].T
    phi = phi[0, :n] + self_phi(mass_c, eps32, jnp.asarray(G, jnp.float32))
    return acc.astype(pos.dtype), phi.astype(pos.dtype)


@functools.partial(jax.jit, static_argnames=("guarded", "chunk"))
def accel_jerk_sym_chunked(pos, vel, mass, eps=0.0, G=1.0,
                           guarded: bool = True, chunk: int | None = None):
    """Chunked pair-symmetric (accel, jerk) past the resident cap — the
    Hermite twin of accel_sym_chunked (shared-dt Hermite at N > STREAM_N;
    the block active-row path is rows-vs-sources and keeps the one-sided
    streamed sweep)."""
    chunk = CHUNK_SYMJ if chunk is None else chunk
    _chunk_check(chunk, T_SYM, "T_SYM")
    n = pos.shape[0]
    npad = -(-max(n, 1) // chunk) * chunk
    planes, gm, _ = _prep_f32_T(pos, mass, G, npad, vel=vel)
    eps2 = jnp.asarray(eps, jnp.float32).reshape(1, 1) ** 2
    with jax.enable_x64(False):
        outT, joutT = _sym_chunked_generic(_OP_J, T_SYM, chunk, planes,
                                           gm, eps2, guarded)
    return (outT[:, :n].T.astype(pos.dtype),
            joutT[:, :n].T.astype(pos.dtype))


@functools.partial(jax.jit, static_argnames=("guarded", "chunk"))
def accel_sym_x_chunked(pos, mass, eps=0.0, G=1.0, guarded: bool = True,
                        chunk: int | None = None):
    """Extended-tier chunked pair-symmetric accel past the resident cap;
    f64 in/out, ONE global centring + hi/lo split before chunking."""
    chunk = CHUNK_SYMX if chunk is None else chunk
    _chunk_check(chunk, T_SYMX, "T_SYMX")
    n = pos.shape[0]
    npad = -(-max(n, 1) // chunk) * chunk
    planes, gm = _prep_x_T(pos, mass, G, npad)
    eps2 = jnp.asarray(eps, jnp.float32).reshape(1, 1) ** 2
    with jax.enable_x64(False):
        (outT,) = _sym_chunked_generic(_OP_AX, T_SYMX, chunk, planes, gm,
                                       eps2, guarded)
    return outT[:, :n].T.astype(pos.dtype)


@functools.partial(jax.jit, static_argnames=("guarded", "chunk"))
def accel_potential_sym_x_chunked(pos, mass, eps=0.0, G=1.0,
                                  guarded: bool = True,
                                  chunk: int | None = None):
    """Extended-tier chunked pair-symmetric (accel, phi) past the resident
    cap; f64 in/out. RAW phi contract (caller adds self_phi), matching
    accel_potential_x."""
    chunk = CHUNK_SYMX if chunk is None else chunk
    _chunk_check(chunk, T_SYMXP, "T_SYMXP")
    n = pos.shape[0]
    npad = -(-max(n, 1) // chunk) * chunk
    planes, gm = _prep_x_T(pos, mass, G, npad)
    eps2 = jnp.asarray(eps, jnp.float32).reshape(1, 1) ** 2
    with jax.enable_x64(False):
        outT, phi = _sym_chunked_generic(_OP_PX, T_SYMXP, chunk, planes,
                                         gm, eps2, guarded)
    return (outT[:, :n].T.astype(pos.dtype), phi[0, :n].astype(pos.dtype))


@functools.partial(jax.jit, static_argnames=("guarded", "chunk"))
def accel_jerk_sym_x_chunked(pos, vel, mass, eps=0.0, G=1.0,
                             guarded: bool = True,
                             chunk: int | None = None):
    """Extended-tier chunked pair-symmetric (accel, jerk) past the
    resident cap (the extended Hermite shared-step evaluation at
    N > STREAM_N); f64 in/out, ONE global centring + hi/lo split of
    positions AND velocities before chunking."""
    chunk = CHUNK_SYMXJ if chunk is None else chunk
    _chunk_check(chunk, T_SYMXJ, "T_SYMXJ")
    n = pos.shape[0]
    npad = -(-max(n, 1) // chunk) * chunk
    planes, gm = _prep_x_T(pos, mass, G, npad, vel=vel)
    eps2 = jnp.asarray(eps, jnp.float32).reshape(1, 1) ** 2
    with jax.enable_x64(False):
        outT, joutT = _sym_chunked_generic(_OP_JX, T_SYMXJ, chunk, planes,
                                           gm, eps2, guarded)
    return (outT[:, :n].T.astype(pos.dtype),
            joutT[:, :n].T.astype(pos.dtype))


# ---- public wrappers: batched (multi-dispatch oversized evals) -------------
#
# One full self-interaction eval at N = 4M is a ~60 s XLA program and at
# 8M ~240 s — past runtime watchdogs / pre-emption windows (this
# environment's TPU relay flakes past ~40-90 s) — so the batched forms
# decompose it: batch 0 carries the diagonal sweep (O(C) cheap kernels),
# the padded cross-pair list splits evenly across n_batches same-shape
# dispatches (each compiles once), and partials are host-accumulated
# through the depth-2 pipeline. Functionally identical to the chunked
# forms up to f32 summation order. NOT jittable as a whole (they ARE the
# dispatch splitting); for in-jit stepping use the *_chunked forms.

def _batched_generic(batch_fn, op, t, chunk, planesT, gm, eps2, guarded,
                     n_batches):
    C = planesT[0].shape[1] // chunk
    pair_list, nb, per = _split_pairs(C, n_batches)
    with jax.enable_x64(False):
        return _pipelined_batches(
            lambda b, pairs: batch_fn(tuple(planesT), gm, eps2, pairs,
                                      guarded, chunk, t, b == 0),
            nb, per, pair_list)


def accel_sym_chunked_batched(pos, mass, eps=0.0, G=1.0,
                              guarded: bool = True,
                              chunk: int | None = None,
                              n_batches: int = 1):
    """Batched pair-symmetric accel for oversized evals (MacroKDK)."""
    chunk = CHUNK_SYM if chunk is None else chunk
    _chunk_check(chunk, T_SYMA, "T_SYMA")
    n = pos.shape[0]
    npad = -(-max(n, 1) // chunk) * chunk
    planes, gm, _ = _prep_f32_T(pos, mass, G, npad)
    eps2 = jnp.asarray(eps, jnp.float32).reshape(1, 1) ** 2
    (outT,) = _batched_generic(_chunked_batch, _OP_A, T_SYMA, chunk,
                               planes, gm, eps2, guarded, n_batches)
    return outT[:, :n].T.astype(pos.dtype)


def accel_potential_sym_chunked_batched(pos, mass, eps=0.0, G=1.0,
                                        guarded: bool = True,
                                        chunk: int | None = None,
                                        n_batches: int = 1):
    """Batched (accel, phi) for oversized diagnostics evals; the self
    term from the diagonal sweep is cancelled by self_phi here."""
    chunk = CHUNK_SYM if chunk is None else chunk
    _chunk_check(chunk, T_SYMP, "T_SYMP")
    n = pos.shape[0]
    npad = -(-max(n, 1) // chunk) * chunk
    planes, gm, mass_c = _prep_f32_T(pos, mass, G, npad)
    eps32 = jnp.asarray(eps, jnp.float32)
    eps2 = eps32.reshape(1, 1) ** 2
    outT, phi = _batched_generic(_chunked_phi_batch, _OP_P, T_SYMP, chunk,
                                 planes, gm, eps2, guarded, n_batches)
    acc = outT[:, :n].T
    phi = phi[0, :n] + self_phi(mass_c, eps32, jnp.asarray(G, jnp.float32))
    return acc.astype(pos.dtype), phi.astype(pos.dtype)


def accel_jerk_sym_chunked_batched(pos, vel, mass, eps=0.0, G=1.0,
                                   guarded: bool = True,
                                   chunk: int | None = None,
                                   n_batches: int = 1):
    """Batched (accel, jerk) for oversized evals — a host-stepped
    Hermite's force evaluation."""
    chunk = CHUNK_SYMJ if chunk is None else chunk
    _chunk_check(chunk, T_SYM, "T_SYM")
    n = pos.shape[0]
    npad = -(-max(n, 1) // chunk) * chunk
    planes, gm, _ = _prep_f32_T(pos, mass, G, npad, vel=vel)
    eps2 = jnp.asarray(eps, jnp.float32).reshape(1, 1) ** 2
    outT, joutT = _batched_generic(_chunked_jerk_batch, _OP_J, T_SYM,
                                   chunk, planes, gm, eps2, guarded,
                                   n_batches)
    return (outT[:, :n].T.astype(pos.dtype),
            joutT[:, :n].T.astype(pos.dtype))


def accel_sym_x_chunked_batched(pos, mass, eps=0.0, G=1.0,
                                guarded: bool = True,
                                chunk: int | None = None,
                                n_batches: int = 1):
    """Batched extended-tier accel for oversized evals (precision =
    'extended' through MacroKDK at N >= 4M)."""
    chunk = CHUNK_SYMX if chunk is None else chunk
    _chunk_check(chunk, T_SYMX, "T_SYMX")
    n = pos.shape[0]
    npad = -(-max(n, 1) // chunk) * chunk
    planes, gm = _prep_x_T(pos, mass, G, npad)
    eps2 = jnp.asarray(eps, jnp.float32).reshape(1, 1) ** 2
    (outT,) = _batched_generic(_chunked_x_batch, _OP_AX, T_SYMX, chunk,
                               planes, gm, eps2, guarded, n_batches)
    return outT[:, :n].T.astype(pos.dtype)


def accel_potential_sym_x_chunked_batched(pos, mass, eps=0.0, G=1.0,
                                          guarded: bool = True,
                                          chunk: int | None = None,
                                          n_batches: int = 1):
    """Batched extended-tier (accel, phi) for oversized diagnostics evals.
    RAW phi contract (caller adds self_phi)."""
    chunk = CHUNK_SYMX if chunk is None else chunk
    _chunk_check(chunk, T_SYMXP, "T_SYMXP")
    n = pos.shape[0]
    npad = -(-max(n, 1) // chunk) * chunk
    planes, gm = _prep_x_T(pos, mass, G, npad)
    eps2 = jnp.asarray(eps, jnp.float32).reshape(1, 1) ** 2
    outT, phi = _batched_generic(_chunked_x_phi_batch, _OP_PX, T_SYMXP,
                                 chunk, planes, gm, eps2, guarded,
                                 n_batches)
    return (outT[:, :n].T.astype(pos.dtype), phi[0, :n].astype(pos.dtype))


def accel_jerk_sym_x_chunked_batched(pos, vel, mass, eps=0.0, G=1.0,
                                     guarded: bool = True,
                                     chunk: int | None = None,
                                     n_batches: int = 1):
    """Batched extended-tier (accel, jerk) for oversized evals (a
    host-stepped extended Hermite's force evaluation)."""
    chunk = CHUNK_SYMXJ if chunk is None else chunk
    _chunk_check(chunk, T_SYMXJ, "T_SYMXJ")
    n = pos.shape[0]
    npad = -(-max(n, 1) // chunk) * chunk
    planes, gm = _prep_x_T(pos, mass, G, npad, vel=vel)
    eps2 = jnp.asarray(eps, jnp.float32).reshape(1, 1) ** 2
    outT, joutT = _batched_generic(_chunked_xj_batch, _OP_JX, T_SYMXJ,
                                   chunk, planes, gm, eps2, guarded,
                                   n_batches)
    return (outT[:, :n].T.astype(pos.dtype),
            joutT[:, :n].T.astype(pos.dtype))


# ---- public wrappers: cross-pair (halfring sharded mode) -------------------
#
# ONE call computes BOTH the action on set A and the reaction on set B —
# the pair-symmetric building block between two DISJOINT particle sets
# (two mesh shards). Inputs already globally centred by the caller
# (per-set centring would put A and B in different frames); both sets are
# zero-mass padded to a common tile multiple, padded rows contribute 0 in
# either direction and their output rows are sliced off. VMEM-RESIDENT
# like the sym kernels (good to the same ~262k-per-shard residency class
# as STREAM_N; for larger shards use mode="ring").

def _cross_pad(pos, gm, npad):
    n = pos.shape[0]
    rT = jnp.pad(pos.astype(jnp.float32).T, ((0, 0), (0, npad - n)))
    g = jnp.pad(gm[None, :], ((0, 0), (0, npad - n)))
    return rT, g


@functools.partial(jax.jit, static_argnames=("guarded",))
def accel_cross_pair(posA, posB, massA, massB, eps, G=1.0,
                     guarded: bool = True):
    """(accel on A from B, accel on B from A) in one pair-symmetric sweep
    (each (a, b) pair once, reaction = −action)."""
    nA, nB = posA.shape[0], posB.shape[0]
    G32 = jnp.asarray(G, jnp.float32)
    npad = _round_up(max(nA, nB, T_SYMA), T_SYMA)
    rA, gA = _cross_pad(posA, G32 * massA.astype(jnp.float32), npad)
    rB, gB = _cross_pad(posB, G32 * massB.astype(jnp.float32), npad)
    eps2 = jnp.asarray(eps, jnp.float32).reshape(1, 1) ** 2
    with jax.enable_x64(False):
        oA, oB = _cross_call(_OP_A, T_SYMA, (rA,), gA, (rB,), gB, eps2,
                             guarded)
    return (oA[:, :nA].T.astype(posA.dtype),
            oB[:, :nB].T.astype(posB.dtype))


@functools.partial(jax.jit, static_argnames=("guarded",))
def accel_potential_cross_pair(posA, posB, massA, massB, eps, G=1.0,
                               guarded: bool = True):
    """(accA, phiA, accB, phiB) in one pair-symmetric sweep. A and B are
    disjoint, so neither phi contains a self term — nothing for the caller
    to correct (the self_phi contract applies to rows==sources sums only)."""
    nA, nB = posA.shape[0], posB.shape[0]
    G32 = jnp.asarray(G, jnp.float32)
    npad = _round_up(max(nA, nB, T_SYMP), T_SYMP)
    rA, gA = _cross_pad(posA, G32 * massA.astype(jnp.float32), npad)
    rB, gB = _cross_pad(posB, G32 * massB.astype(jnp.float32), npad)
    eps2 = jnp.asarray(eps, jnp.float32).reshape(1, 1) ** 2
    with jax.enable_x64(False):
        oA, pA, oB, pB = _cross_call(_OP_P, T_SYMP, (rA,), gA, (rB,), gB,
                                     eps2, guarded)
    return (oA[:, :nA].T.astype(posA.dtype), pA[0, :nA].astype(posA.dtype),
            oB[:, :nB].T.astype(posB.dtype), pB[0, :nB].astype(posB.dtype))


@functools.partial(jax.jit, static_argnames=("guarded",))
def accel_jerk_cross_pair(posA, velA, posB, velB, massA, massB, eps, G=1.0,
                          guarded: bool = True):
    """(accA, jerkA, accB, jerkB) in one pair-symmetric sweep (the shared
    bracket B = dv − 3(r·v)inv²·d serves both directions)."""
    nA, nB = posA.shape[0], posB.shape[0]
    G32 = jnp.asarray(G, jnp.float32)
    npad = _round_up(max(nA, nB, T_SYM), T_SYM)
    rA, gA = _cross_pad(posA, G32 * massA.astype(jnp.float32), npad)
    rB, gB = _cross_pad(posB, G32 * massB.astype(jnp.float32), npad)
    vA = jnp.pad(velA.astype(jnp.float32).T, ((0, 0), (0, npad - nA)))
    vB = jnp.pad(velB.astype(jnp.float32).T, ((0, 0), (0, npad - nB)))
    eps2 = jnp.asarray(eps, jnp.float32).reshape(1, 1) ** 2
    with jax.enable_x64(False):
        oA, jA, oB, jB = _cross_call(_OP_J, T_SYM, (rA, vA), gA, (rB, vB),
                                     gB, eps2, guarded)
    return (oA[:, :nA].T.astype(posA.dtype), jA[:, :nA].T.astype(posA.dtype),
            oB[:, :nB].T.astype(posB.dtype), jB[:, :nB].T.astype(posB.dtype))


# extended-tier cross-pair wrappers (halfring + precision="extended"):
# pre-split (hi, lo) f32 planes under ONE global centring (the caller's
# _split_global), gm = G·mass in f32 — same contract as *_x_hilo.

def _cross_pad_x(hi, lo, gm, npad):
    n = hi.shape[0]
    return (_padT(hi, npad), _padT(lo, npad),
            jnp.pad(gm[None, :], ((0, 0), (0, npad - n))))


@functools.partial(jax.jit, static_argnames=("guarded",))
def accel_cross_pair_x_hilo(rAhi, rAlo, rBhi, rBlo, gmA, gmB, eps,
                            guarded: bool = True):
    """Extended-tier (accel on A from B, accel on B from A), one sweep."""
    nA, nB = rAhi.shape[0], rBhi.shape[0]
    npad = _round_up(max(nA, nB, T_SYMX), T_SYMX)
    hA, lA, gA = _cross_pad_x(rAhi, rAlo, gmA, npad)
    hB, lB, gB = _cross_pad_x(rBhi, rBlo, gmB, npad)
    eps2 = jnp.asarray(eps, jnp.float32).reshape(1, 1) ** 2
    with jax.enable_x64(False):
        oA, oB = _cross_call(_OP_AX, T_SYMX, (hA, lA), gA, (hB, lB), gB,
                             eps2, guarded)
    return oA[:, :nA].T, oB[:, :nB].T


@functools.partial(jax.jit, static_argnames=("guarded",))
def accel_potential_cross_pair_x_hilo(rAhi, rAlo, rBhi, rBlo, gmA, gmB,
                                      eps, guarded: bool = True):
    """Extended-tier (accA, phiA, accB, phiB); disjoint sets — neither phi
    contains a self term."""
    nA, nB = rAhi.shape[0], rBhi.shape[0]
    npad = _round_up(max(nA, nB, T_SYMXP), T_SYMXP)
    hA, lA, gA = _cross_pad_x(rAhi, rAlo, gmA, npad)
    hB, lB, gB = _cross_pad_x(rBhi, rBlo, gmB, npad)
    eps2 = jnp.asarray(eps, jnp.float32).reshape(1, 1) ** 2
    with jax.enable_x64(False):
        oA, pA, oB, pB = _cross_call(_OP_PX, T_SYMXP, (hA, lA), gA,
                                     (hB, lB), gB, eps2, guarded)
    return oA[:, :nA].T, pA[0, :nA], oB[:, :nB].T, pB[0, :nB]


@functools.partial(jax.jit, static_argnames=("guarded",))
def accel_jerk_cross_pair_x_hilo(rAhi, rAlo, vAhi, vAlo, rBhi, rBlo,
                                 vBhi, vBlo, gmA, gmB, eps,
                                 guarded: bool = True):
    """Extended-tier (accA, jerkA, accB, jerkB), one sweep."""
    nA, nB = rAhi.shape[0], rBhi.shape[0]
    npad = _round_up(max(nA, nB, T_SYMXJ), T_SYMXJ)
    hA, lA, gA = _cross_pad_x(rAhi, rAlo, gmA, npad)
    hB, lB, gB = _cross_pad_x(rBhi, rBlo, gmB, npad)
    vhA, vlA = _padT(vAhi, npad), _padT(vAlo, npad)
    vhB, vlB = _padT(vBhi, npad), _padT(vBlo, npad)
    eps2 = jnp.asarray(eps, jnp.float32).reshape(1, 1) ** 2
    with jax.enable_x64(False):
        oA, jA, oB, jB = _cross_call(_OP_JX, T_SYMXJ, (hA, lA, vhA, vlA),
                                     gA, (hB, lB, vhB, vlB), gB, eps2,
                                     guarded)
    return (oA[:, :nA].T, jA[:, :nA].T, oB[:, :nB].T, jB[:, :nB].T)


# --------------------------------------------------------------------------
# single-chip wrappers (same API as ops.gravity)
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("guarded",))
def accel(pos, mass, eps=0.0, G=1.0, guarded: bool = True):
    # Self-interaction: pair-symmetric kernel (Newton's 3rd law — half
    # the pairs/rsqrts) wins at every resident production size, measured
    # unguarded slope-timed: 65k 14.7 vs 22.4 ms (+53%), 131k 63.0 vs
    # 89.4, 262k 250.8 vs 355.6 (+42%). Past STREAM_N the chunked sym
    # kernel keeps the same effective rate (1M: 4036 vs 6046 ms one-sided
    # streamed, 2.72e11 N²-eq int/s, +50% — bench/chunked_sym.json).
    # OCN_PALLAS_JERK_SYM=0 reverts all sym dispatches.
    n = pos.shape[0]
    if SYM_MIN <= n and _sym_enabled():
        if n <= STREAM_N:
            return accel_sym(pos, mass, eps, G, guarded=guarded)
        return accel_sym_chunked(pos, mass, eps, G, guarded=guarded)
    pos_c, mass_c = prepare_f32(pos, mass)
    out = accel_rows(pos_c, pos_c, mass_c, jnp.asarray(eps, jnp.float32),
                     jnp.asarray(G, jnp.float32), 0, guarded)
    return out.astype(pos.dtype)


@functools.partial(jax.jit, static_argnames=("guarded",))
def accel_potential(pos, mass, eps=0.0, G=1.0, guarded: bool = True):
    # pair-symmetric diagnostics pass at resident production sizes
    # (65k: 18.7 vs 25.0 ms, measured — same dispatch rule as accel);
    # chunked past STREAM_N (1M: 4.73 vs 6.69 s streamed one-sided, +41% —
    # bench/chunked_sym.json)
    n = pos.shape[0]
    if SYM_MIN <= n and _sym_enabled():
        if n <= STREAM_N:
            return accel_potential_sym(pos, mass, eps, G, guarded=guarded)
        return accel_potential_sym_chunked(pos, mass, eps, G, guarded=guarded)
    pos_c, mass_c = prepare_f32(pos, mass)
    eps32 = jnp.asarray(eps, jnp.float32)
    G32 = jnp.asarray(G, jnp.float32)
    acc, phi = accel_potential_rows(pos_c, pos_c, mass_c, eps32, G32, 0, guarded)
    phi = phi + self_phi(mass_c, eps32, G32)
    return acc.astype(pos.dtype), phi.astype(pos.dtype)


@functools.partial(jax.jit, static_argnames=("guarded",))
def accel_jerk(pos, vel, mass, eps=0.0, G=1.0, guarded: bool = True):
    # Self-interaction: the pair-symmetric kernel wins for resident N at
    # or above the transposed crossover (measured unguarded, slope-timed:
    # 16k 2.39 vs 2.79 ms; 65k 35.2 vs 44.2 ms — +17-26% from halving the
    # pairs/rsqrts; W3); past STREAM_N the chunked sym variant (1M: 9.17
    # vs 12.30 s streamed one-sided, +34% — bench/chunked_sym.json).
    # Below the crossover the one-sided sweep; OCN_PALLAS_JERK_SYM=0
    # reverts.
    n = pos.shape[0]
    if RT_MIN_JERK <= n and _sym_enabled():
        if n <= STREAM_N:
            return accel_jerk_sym(pos, vel, mass, eps, G, guarded=guarded)
        return accel_jerk_sym_chunked(pos, vel, mass, eps, G,
                                      guarded=guarded)
    pos_c, mass_c, vel_c = prepare_f32(pos, mass, vel=vel)
    acc, jerk = accel_jerk_rows(pos_c, vel_c, pos_c, vel_c, mass_c,
                                jnp.asarray(eps, jnp.float32),
                                jnp.asarray(G, jnp.float32), 0, guarded)
    return acc.astype(pos.dtype), jerk.astype(pos.dtype)
