"""Full two-float (df32) pairwise kernels (accel, accel+jerk) on TPU.

Every pair quantity — separation, r², rsqrt, weight, and the cross-tile
accumulation — is a (hi, lo) pair of f32s (~48-bit significand).
Measured accuracy ~1e-10 relative vs the f64 oracle including close
pairs, i.e. f64-class forces on hardware with no native f64.

Honest cost picture vs XLA's software-emulated f64 (slope-timed):
accel 45.5 vs 48.5 ms at N=16384 — df32 wins narrowly; jerk 19.0 vs
12.0 ms at N=8192 — emulated f64 WINS (the ~400 df ops/pair overtake
the emulation). ForceModel's precision="df32" therefore routes accel
here and jerk/potential to emulated f64; both kernels stay available
and tested as the TPU-native two-float reference implementation.

Error-free transformations are verified EXACT inside Mosaic kernels on
this hardware (tests + measured): unlike the XLA-compiled jnp tier
(ops/df32.py), the kernel body sees no algebraic simplifier, so the
classic forms need no optimization barriers; the split still uses the
integer bitmask form (cheaper than Dekker's 3-op split: 2 int ops, no
multiply).

The jnp twin ops/df32.accel_df is the oracle (tests/unit/test_df32.py,
test_pallas_df.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from oc_nbody_tpu.ops.pallas_gravity import _call, _round_up

import os as _os

# df sweep holds ~38 live (TI,TJ) temporaries (measured: 256x512 needs
# 19.16M of the 16M scoped-VMEM stack); TJ must be a power of two for the
# tree reduction
TI_DF = int(_os.environ.get("OCN_PALLAS_TI_DF", 128))
TJ_DF = int(_os.environ.get("OCN_PALLAS_TJ_DF", 512))


# ---- kernel-local EFTs (Mosaic: no barriers needed, measured exact) ----

def _two_sum(a, b):
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _quick_two_sum(a, b):
    s = a + b
    return s, b - (s - a)


def _split(a):
    bits = jax.lax.bitcast_convert_type(a, jnp.uint32)
    hi = jax.lax.bitcast_convert_type(bits & jnp.uint32(0xFFFFF000),
                                      jnp.float32)
    return hi, a - hi


def _two_prod(a, b):
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def _df_add(x, y):
    s, e = _two_sum(x[0], y[0])
    return _quick_two_sum(s, e + (x[1] + y[1]))


def _df_mul(x, y):
    p, e = _two_prod(x[0], y[0])
    return _quick_two_sum(p, e + (x[0] * y[1] + x[1] * y[0]))


def _df_sqr(x):
    p, e = _two_prod(x[0], x[0])
    return _quick_two_sum(p, e + jnp.float32(2.0) * (x[0] * x[1]))


def _df_rsqrt(x, guarded):
    """f32 seed + f32 Newton + one df Newton (see ops/df32.df_rsqrt)."""
    u = x[0]
    if guarded:
        tiny = jnp.float32(1.1754944e-38)
        y0 = jnp.where(u > 0, jax.lax.rsqrt(jnp.maximum(u, tiny)), 0.0)
    else:
        y0 = jax.lax.rsqrt(u)
    y0 = y0 * (jnp.float32(1.5) - (jnp.float32(0.5) * u) * (y0 * y0))
    y = (y0, jnp.zeros_like(y0))
    xy2 = _df_mul(x, _df_sqr(y))
    tm = _df_add((jnp.full_like(y0, 3.0), jnp.zeros_like(y0)),
                 (-xy2[0], -xy2[1]))
    out = _df_mul(y, tm)
    return out[0] * jnp.float32(0.5), out[1] * jnp.float32(0.5)


def _df_reduce_lanes(x):
    """Exact df tree reduction over lanes: (ti, w) -> (ti, 1) by repeated
    halving with df adds (w must be a power of two). A plain f32 lane-sum
    of the hi plane would reintroduce ~1e-7 tree-reduction rounding and
    waste the whole df pipeline (the design error this replaces)."""
    h, l = x
    w = h.shape[1]
    while w > 1:
        half = w // 2
        h, l = _df_add((h[:, :half], l[:, :half]),
                       (h[:, half:], l[:, half:]))
        w = half
    return h, l


def _accel_kernel_df(rhiT_ref, rloT_ref, shi_ref, slo_ref, gmhi_ref,
                     gmlo_ref, eps2_ref, ohiT_ref, oloT_ref, *, guarded):
    ti, tj = TI_DF, TJ_DF
    nsp = shi_ref.shape[1]
    nj = nsp // tj
    ni = rhiT_ref.shape[1] // ti
    e2 = (eps2_ref[0, 0], eps2_ref[0, 1])

    def row_body(i, _):
        i0 = i * ti

        def col(ref, c):
            return ref[c:c + 1, pl.ds(i0, ti)].reshape(ti, 1)

        xi = [col(rhiT_ref, c) for c in range(3)]
        xli = [col(rloT_ref, c) for c in range(3)]

        def j_body(j, carry):
            ah, al = carry[:3], carry[3:]
            j0 = j * tj
            # df separations: exact hi difference + lo, renormalized
            dd = []
            for c in range(3):
                d, e = _two_sum(shi_ref[c:c + 1, pl.ds(j0, tj)], -xi[c])
                e = e + (slo_ref[c:c + 1, pl.ds(j0, tj)] - xli[c])
                dd.append(_two_sum(d, e))
            u = _df_add(_df_add(_df_sqr(dd[0]), _df_sqr(dd[1])),
                        _df_add(_df_sqr(dd[2]), e2))
            inv = _df_rsqrt(u, guarded)
            gm = (gmhi_ref[0:1, pl.ds(j0, tj)],
                  gmlo_ref[0:1, pl.ds(j0, tj)])
            # kept fully df: a first-order w (plain-f32 ih^3 + lo
            # corrections) was measured out — the uncaptured ih^3
            # rounding (~1.8e-7 rel) breaks the tier, and capturing it
            # with two_prods saves only ~4% of kernel ops
            w = _df_mul(gm, _df_mul(_df_sqr(inv), inv))
            out = []
            for c in range(3):
                # accumulate elementwise at FULL (ti, tj) width — the
                # lane reduction is deferred to one exact df tree per
                # row tile (see _df_reduce_lanes)
                t = _df_mul(w, dd[c])
                out.append(_df_add((ah[c], al[c]), t))
            return (out[0][0], out[1][0], out[2][0],
                    out[0][1], out[1][1], out[2][1])

        zero = jnp.zeros((ti, tj), jnp.float32)
        acc = jax.lax.fori_loop(0, nj, j_body, (zero,) * 6)
        his, los = [], []
        for c in range(3):
            h, l = _df_reduce_lanes((acc[c], acc[3 + c]))
            his.append(h.reshape(1, ti))
            los.append(l.reshape(1, ti))
        ohiT_ref[:, pl.ds(i0, ti)] = jnp.concatenate(his, axis=0)
        oloT_ref[:, pl.ds(i0, ti)] = jnp.concatenate(los, axis=0)
        return 0

    jax.lax.fori_loop(0, ni, row_body, 0)


# jerk variant holds ~2x the live temporaries of the accel sweep
TI_DFJ = int(_os.environ.get("OCN_PALLAS_TI_DFJ", 128))
TJ_DFJ = int(_os.environ.get("OCN_PALLAS_TJ_DFJ", 256))


def _accel_jerk_kernel_df(rhiT_ref, rloT_ref, rvhiT_ref, rvloT_ref,
                          shi_ref, slo_ref, svhi_ref, svlo_ref,
                          gmhi_ref, gmlo_ref, eps2_ref,
                          ahiT_ref, aloT_ref, jhiT_ref, jloT_ref, *,
                          guarded):
    ti, tj = TI_DFJ, TJ_DFJ
    nsp = shi_ref.shape[1]
    nj = nsp // tj
    ni = rhiT_ref.shape[1] // ti
    e2 = (eps2_ref[0, 0], eps2_ref[0, 1])

    def row_body(i, _):
        i0 = i * ti

        def col(ref, c):
            return ref[c:c + 1, pl.ds(i0, ti)].reshape(ti, 1)

        xi = [col(rhiT_ref, c) for c in range(3)]
        xli = [col(rloT_ref, c) for c in range(3)]
        vi = [col(rvhiT_ref, c) for c in range(3)]
        vli = [col(rvloT_ref, c) for c in range(3)]

        def pair_df(hi_ref, lo_ref, c, hic, loc, j0):
            d, e = _two_sum(hi_ref[c:c + 1, pl.ds(j0, tj)], -hic)
            e = e + (lo_ref[c:c + 1, pl.ds(j0, tj)] - loc)
            return _two_sum(d, e)

        def j_body(j, carry):
            ah, al = carry[:3], carry[3:6]
            jh, jl = carry[6:9], carry[9:]
            j0 = j * tj
            dd = [pair_df(shi_ref, slo_ref, c, xi[c], xli[c], j0)
                  for c in range(3)]
            vv = [pair_df(svhi_ref, svlo_ref, c, vi[c], vli[c], j0)
                  for c in range(3)]
            u = _df_add(_df_add(_df_sqr(dd[0]), _df_sqr(dd[1])),
                        _df_add(_df_sqr(dd[2]), e2))
            inv = _df_rsqrt(u, guarded)
            gm = (gmhi_ref[0:1, pl.ds(j0, tj)],
                  gmlo_ref[0:1, pl.ds(j0, tj)])
            inv2 = _df_sqr(inv)
            w = _df_mul(gm, _df_mul(inv2, inv))
            rv = _df_add(_df_add(_df_mul(dd[0], vv[0]),
                                 _df_mul(dd[1], vv[1])),
                         _df_mul(dd[2], vv[2]))
            # s = 3 rv w inv^2
            s3 = (jnp.float32(3.0) * rv[0], jnp.float32(3.0) * rv[1])
            s = _df_mul(s3, _df_mul(w, inv2))
            out = []
            for c in range(3):
                out.append(_df_add((ah[c], al[c]), _df_mul(w, dd[c])))
            jtiles = []
            for c in range(3):
                t = _df_add(_df_mul(w, vv[c]),
                            _df_mul((-s[0], -s[1]), dd[c]))
                jtiles.append(_df_add((jh[c], jl[c]), t))
            return (out[0][0], out[1][0], out[2][0],
                    out[0][1], out[1][1], out[2][1],
                    jtiles[0][0], jtiles[1][0], jtiles[2][0],
                    jtiles[0][1], jtiles[1][1], jtiles[2][1])

        zero = jnp.zeros((ti, tj), jnp.float32)
        acc = jax.lax.fori_loop(0, nj, j_body, (zero,) * 12)
        packs = [(ahiT_ref, aloT_ref, 0), (jhiT_ref, jloT_ref, 6)]
        for href, lref, base in packs:
            his, los = [], []
            for c in range(3):
                h, l = _df_reduce_lanes((acc[base + c], acc[base + 3 + c]))
                his.append(h.reshape(1, ti))
                los.append(l.reshape(1, ti))
            href[:, pl.ds(i0, ti)] = jnp.concatenate(his, axis=0)
            lref[:, pl.ds(i0, ti)] = jnp.concatenate(los, axis=0)
        return 0

    jax.lax.fori_loop(0, ni, row_body, 0)


@functools.partial(jax.jit, static_argnames=("guarded",))
def accel_jerk_df_pallas(pos, vel, mass, eps=0.0, G=1.0,
                         guarded: bool = True):
    """Full-df32 (accel, jerk) on TPU; f64 in/out — the Hermite force
    evaluation at the df32 tier."""
    center = jnp.mean(pos, axis=0)
    vcenter = jnp.mean(vel, axis=0)

    def split(a, c):
        d = a - c
        hi = d.astype(jnp.float32)
        return hi, (d - hi.astype(d.dtype)).astype(jnp.float32)

    hi, lo = split(pos, center)
    vhi, vlo = split(vel, vcenter)
    gm64 = jnp.asarray(G, jnp.float64) * jnp.asarray(mass, jnp.float64)
    gm_hi = gm64.astype(jnp.float32)
    gm_lo = (gm64 - gm_hi.astype(jnp.float64)).astype(jnp.float32)
    e2_64 = jnp.asarray(eps, jnp.float64) ** 2
    e2_hi = e2_64.astype(jnp.float32)
    e2_lo = (e2_64 - e2_hi.astype(jnp.float64)).astype(jnp.float32)
    eps2 = jnp.stack([e2_hi, e2_lo]).reshape(1, 2)

    n = pos.shape[0]
    nrp = _round_up(max(n, TI_DFJ), TI_DFJ)
    nsp = _round_up(max(n, TJ_DFJ), TJ_DFJ)
    padT = lambda a, m: jnp.pad(a.T, ((0, 0), (0, m - n)))

    with jax.enable_x64(False):
        ahiT, aloT, jhiT, jloT = _call(
            functools.partial(_accel_jerk_kernel_df, guarded=guarded),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 10
                     + [pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                            for _ in range(4)),
            out_shape=tuple(jax.ShapeDtypeStruct((3, nrp), jnp.float32)
                            for _ in range(4)),
            cost_estimate=pl.CostEstimate(
                flops=400 * nrp * nsp, bytes_accessed=(nrp + nsp) * 112,
                transcendentals=nrp * nsp,
            ),
        )(padT(hi, nrp), padT(lo, nrp), padT(vhi, nrp), padT(vlo, nrp),
          padT(hi, nsp), padT(lo, nsp), padT(vhi, nsp), padT(vlo, nsp),
          jnp.pad(gm_hi[None, :], ((0, 0), (0, nsp - n))),
          jnp.pad(gm_lo[None, :], ((0, 0), (0, nsp - n))), eps2)
    acc = (ahiT[:, :n].T.astype(jnp.float64)
           + aloT[:, :n].T.astype(jnp.float64))
    jerk = (jhiT[:, :n].T.astype(jnp.float64)
            + jloT[:, :n].T.astype(jnp.float64))
    return acc.astype(pos.dtype), jerk.astype(pos.dtype)


@functools.partial(jax.jit, static_argnames=("guarded",))
def accel_df_pallas(pos, mass, eps=0.0, G=1.0, guarded: bool = True):
    """Full-df32 pairwise accel on TPU; f64 in/out. ~1e-10 rel force
    error (close pairs included) at a fraction of emulated-f64 cost."""
    center = jnp.mean(pos, axis=0)
    pc = pos - center
    hi = pc.astype(jnp.float32)
    lo = (pc - hi.astype(pc.dtype)).astype(jnp.float32)
    gm64 = jnp.asarray(G, jnp.float64) * jnp.asarray(mass, jnp.float64)
    gm_hi = gm64.astype(jnp.float32)
    gm_lo = (gm64 - gm_hi.astype(jnp.float64)).astype(jnp.float32)
    e2_64 = jnp.asarray(eps, jnp.float64) ** 2
    e2_hi = e2_64.astype(jnp.float32)
    e2_lo = (e2_64 - e2_hi.astype(jnp.float64)).astype(jnp.float32)
    eps2 = jnp.stack([e2_hi, e2_lo]).reshape(1, 2)

    n = pos.shape[0]
    nrp = _round_up(max(n, TI_DF), TI_DF)
    nsp = _round_up(max(n, TJ_DF), TJ_DF)
    rhiT = jnp.pad(hi.T, ((0, 0), (0, nrp - n)))
    rloT = jnp.pad(lo.T, ((0, 0), (0, nrp - n)))
    shiT = jnp.pad(hi.T, ((0, 0), (0, nsp - n)))
    sloT = jnp.pad(lo.T, ((0, 0), (0, nsp - n)))
    gmh = jnp.pad(gm_hi[None, :], ((0, 0), (0, nsp - n)))
    gml = jnp.pad(gm_lo[None, :], ((0, 0), (0, nsp - n)))

    with jax.enable_x64(False):
        ohiT, oloT = _call(
            functools.partial(_accel_kernel_df, guarded=guarded),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6
                     + [pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM)),
            out_shape=(jax.ShapeDtypeStruct((3, nrp), jnp.float32),
                       jax.ShapeDtypeStruct((3, nrp), jnp.float32)),
            cost_estimate=pl.CostEstimate(
                flops=200 * nrp * nsp, bytes_accessed=(nrp + nsp) * 56,
                transcendentals=nrp * nsp,
            ),
        )(rhiT, rloT, shiT, sloT, gmh, gml, eps2)
    out = (ohiT[:, :n].T.astype(jnp.float64)
           + oloT[:, :n].T.astype(jnp.float64))
    return out.astype(pos.dtype)
