"""Pair-physics kernel specs and the generated pair-symmetric families.

The factored core of the Pallas gravity package (VERDICT round-3 W2):
ONE pair-physics definition per op x tier — {accel, accel+phi,
accel+jerk} x {f32, extended hi/lo} — from which the {sym
self-interaction, cross-pair, chunked, batched} kernel forms are
GENERATED. Previously every cell of that product was a hand-written
kernel (~2,100 lines; each bugfix had to be applied in up to 7 places);
the physics lives in exactly six small pair functions here.

pallas_gravity.py keeps the public wrappers (accel_sym & co.), the
hardware-swept tile/chunk constants (tests monkeypatch them there), and
the row-gridded / streamed / transposed families; it imports everything
in this module. This module imports only ops.gravity — no cycle.

A pair op is a dict with:
  nplanes  — number of (3, n) row-plane refs (pos / pos+vel / hi,lo /
             hi,lo,vhi,vlo)
  ngroups  — (3, n)-shaped output groups (1 = accel, 2 = accel+jerk)
  has_phi  — extra (1, n) potential output
  load(planes, gm_ref, sli, t)      -> i-tile columns (opaque tuple)
  pair(planes, gm_ref, slj, cols, eps2, guarded)
           -> (vecs, w, wi, phiw)
      vecs — 3*ngroups (t_i, t_j) channel arrays (separation s / d,
             then the jerk bracket B when present)
      w    — action weight (gm_j * inv^3 class), rows accumulate
             +sum(w * vec, axis=1)
      wi   — reaction weight (gm_i * inv^3), columns accumulate
             -sum(wi * vec, axis=0)
      phiw — (gmjinv, gmiinv) for the phi row/col sums, or None
  sym_cost / cross_cost — (flops_per_pair, bytes_per_particle) for the
             CostEstimate hints (hardware-measured originals kept)

Numerics are preserved operation-for-operation: the pair functions are
the original kernels' pair_tile bodies verbatim, and the generated
sweeps accumulate in the same order (row carries through the fori_loop,
reaction columns written per j-tile, diagonal/self tile rows-only).
"""
from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from oc_nbody_tpu.ops.gravity import prepare_f32


# ---- small shared helpers (also re-imported by pallas_gravity) ------------

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


def _inv_r(u, guarded: bool):
    """Zero-guarded rsqrt. guarded=False is valid only when eps > 0 (then
    u >= eps^2 > 0 everywhere) and saves a compare+select+max per pair."""
    if guarded:
        tiny = jnp.float32(1.1754944e-38)
        return jnp.where(u > 0, jax.lax.rsqrt(jnp.maximum(u, tiny)), 0.0)
    return jax.lax.rsqrt(u)


def _split_rows(a, center):
    """f64 -> centred (hi, lo) f32 pair."""
    c = a - center
    hi = c.astype(jnp.float32)
    lo = (c - hi.astype(c.dtype)).astype(jnp.float32)
    return hi, lo


def _padT(a, m):
    """(N, k) -> (k, M) transposed zero-pad."""
    return jnp.pad(a.T, ((0, 0), (0, m - a.shape[0])))


def _op(name, nplanes, ngroups, has_phi, load, pair, sym_cost, cross_cost):
    return dict(name=name, nplanes=nplanes, ngroups=ngroups,
                has_phi=has_phi, load=load, pair=pair, sym_cost=sym_cost,
                cross_cost=cross_cost,
                nouts=ngroups + (1 if has_phi else 0))


def _load_pos(planes, gm_ref, sli, t):
    (rT,) = planes
    pi = [rT[c:c + 1, sli].reshape(t, 1) for c in range(3)]
    gmi = gm_ref[0:1, sli].reshape(t, 1)
    return pi, gmi


def _pair_accel(planes, gm_ref, slj, cols, eps2, guarded):
    (rT,) = planes
    pi, gmi = cols
    d = [rT[c:c + 1, slj] - pi[c] for c in range(3)]
    u = d[0] * d[0] + d[1] * d[1] + d[2] * d[2] + eps2
    inv = _inv_r(u, guarded)
    inv3 = inv * (inv * inv)
    return d, gm_ref[0:1, slj] * inv3, gmi * inv3, None


def _pair_phi(planes, gm_ref, slj, cols, eps2, guarded):
    (rT,) = planes
    pi, gmi = cols
    d = [rT[c:c + 1, slj] - pi[c] for c in range(3)]
    u = d[0] * d[0] + d[1] * d[1] + d[2] * d[2] + eps2
    inv = _inv_r(u, guarded)
    inv2 = inv * inv
    gmjinv = gm_ref[0:1, slj] * inv
    gmiinv = gmi * inv
    return d, gmjinv * inv2, gmiinv * inv2, (gmjinv, gmiinv)


def _load_pos_vel(planes, gm_ref, sli, t):
    rT, vT = planes
    pi = [rT[c:c + 1, sli].reshape(t, 1) for c in range(3)]
    vi = [vT[c:c + 1, sli].reshape(t, 1) for c in range(3)]
    gmi = gm_ref[0:1, sli].reshape(t, 1)
    return pi, vi, gmi


def _pair_jerk(planes, gm_ref, slj, cols, eps2, guarded):
    rT, vT = planes
    pi, vi, gmi = cols
    d = [rT[c:c + 1, slj] - pi[c] for c in range(3)]
    dv = [vT[c:c + 1, slj] - vi[c] for c in range(3)]
    u = d[0] * d[0] + d[1] * d[1] + d[2] * d[2] + eps2
    inv = _inv_r(u, guarded)
    inv3 = inv * (inv * inv)
    w = gm_ref[0:1, slj] * inv3
    rv = d[0] * dv[0] + d[1] * dv[1] + d[2] * dv[2]
    uu = (jnp.float32(3.0) * rv) * (inv * inv)
    B = [dv[c] - uu * d[c] for c in range(3)]
    return d + B, w, gmi * inv3, None


def _load_hilo(planes, gm_ref, sli, t):
    hiT, loT = planes
    pi = [hiT[c:c + 1, sli].reshape(t, 1) for c in range(3)]
    li = [loT[c:c + 1, sli].reshape(t, 1) for c in range(3)]
    gmi = gm_ref[0:1, sli].reshape(t, 1)
    return pi, li, gmi


def _hilo_sep_inv(hiT, loT, slj, pi, li, eps2, guarded):
    """The extended tier's shared separation/inverse: lo-corrected u and
    one Newton refinement of rsqrt, then s = d + e."""
    d = [hiT[c:c + 1, slj] - pi[c] for c in range(3)]
    e = [loT[c:c + 1, slj] - li[c] for c in range(3)]
    dd = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
    de = d[0] * e[0] + d[1] * e[1] + d[2] * e[2]
    u = dd + (jnp.float32(2.0) * de + eps2)
    inv = _inv_r(u, guarded)
    inv = inv * (jnp.float32(1.5) - (jnp.float32(0.5) * u) * (inv * inv))
    s = [d[c] + e[c] for c in range(3)]
    return s, inv


def _pair_accel_x(planes, gm_ref, slj, cols, eps2, guarded):
    hiT, loT = planes
    pi, li, gmi = cols
    s, inv = _hilo_sep_inv(hiT, loT, slj, pi, li, eps2, guarded)
    inv3 = inv * (inv * inv)
    return s, gm_ref[0:1, slj] * inv3, gmi * inv3, None


def _pair_phi_x(planes, gm_ref, slj, cols, eps2, guarded):
    hiT, loT = planes
    pi, li, gmi = cols
    s, inv = _hilo_sep_inv(hiT, loT, slj, pi, li, eps2, guarded)
    inv2 = inv * inv
    gmjinv = gm_ref[0:1, slj] * inv
    gmiinv = gmi * inv
    return s, gmjinv * inv2, gmiinv * inv2, (gmjinv, gmiinv)


def _load_hilo_vel(planes, gm_ref, sli, t):
    hiT, loT, vhiT, vloT = planes
    pi = [hiT[c:c + 1, sli].reshape(t, 1) for c in range(3)]
    li = [loT[c:c + 1, sli].reshape(t, 1) for c in range(3)]
    vi = [vhiT[c:c + 1, sli].reshape(t, 1) for c in range(3)]
    vli = [vloT[c:c + 1, sli].reshape(t, 1) for c in range(3)]
    gmi = gm_ref[0:1, sli].reshape(t, 1)
    return pi, li, vi, vli, gmi


def _pair_jerk_x(planes, gm_ref, slj, cols, eps2, guarded):
    hiT, loT, vhiT, vloT = planes
    pi, li, vi, vli, gmi = cols
    dv = [(vhiT[c:c + 1, slj] - vi[c]) + (vloT[c:c + 1, slj] - vli[c])
          for c in range(3)]
    s, inv = _hilo_sep_inv(hiT, loT, slj, pi, li, eps2, guarded)
    inv3 = inv * (inv * inv)
    rv = s[0] * dv[0] + s[1] * dv[1] + s[2] * dv[2]
    uu = (jnp.float32(3.0) * rv) * (inv * inv)
    B = [dv[c] - uu * s[c] for c in range(3)]
    return s + B, gm_ref[0:1, slj] * inv3, gmi * inv3, None


_OP_A = _op("accel", 1, 1, False, _load_pos, _pair_accel,
            (14, 32), (28, 64))
_OP_P = _op("phi", 1, 1, True, _load_pos, _pair_phi, (17, 40), (34, 80))
_OP_J = _op("jerk", 2, 2, False, _load_pos_vel, _pair_jerk,
            (30, 56), (60, 112))
_OP_AX = _op("accel_x", 2, 1, False, _load_hilo, _pair_accel_x,
             (24, 56), (48, 112))
_OP_PX = _op("phi_x", 2, 1, True, _load_hilo, _pair_phi_x,
             (27, 64), (54, 120))
_OP_JX = _op("jerk_x", 4, 2, False, _load_hilo_vel, _pair_jerk_x,
             (42, 104), (84, 208))


def _row_parts(op, vecs, w, phiw):
    parts = [jnp.sum(w * v, axis=1, keepdims=True) for v in vecs]
    if op["has_phi"]:
        parts.append(-jnp.sum(phiw[0], axis=1, keepdims=True))
    return tuple(parts)


def _scatter_cols(op, outs, slj, vecs, wi, phiw):
    for g in range(op["ngroups"]):
        col = jnp.concatenate(
            [-jnp.sum(wi * vecs[3 * g + c], axis=0, keepdims=True)
             for c in range(3)], axis=0)
        outs[g][:, slj] = outs[g][:, slj] + col
    if op["has_phi"]:
        outs[-1][:, slj] = outs[-1][:, slj] - jnp.sum(
            phiw[1], axis=0, keepdims=True)


def _write_rows(op, outs, sli, res, t, add):
    for g in range(op["ngroups"]):
        tile = jnp.concatenate(
            [res[3 * g + c].reshape(1, t) for c in range(3)], axis=0)
        outs[g][:, sli] = (outs[g][:, sli] + tile) if add else tile
    if op["has_phi"]:
        p = res[-1].reshape(1, t)
        outs[-1][:, sli] = (outs[-1][:, sli] + p) if add else p


def _make_sym_kernel(op, t):
    """Self-interaction triangle sweep: the diagonal tile contributes
    rows-only (each in-tile pair appears once per direction across the
    row sweep); off-diagonal tiles j > i contribute action rows AND
    reaction columns — Newton's 3rd law at the tile level."""

    def kernel(*refs, guarded):
        planes = refs[:op["nplanes"]]
        gm_ref = refs[op["nplanes"]]
        eps2 = refs[op["nplanes"] + 1][0, 0]
        outs = refs[op["nplanes"] + 2:]
        nt = planes[0].shape[1] // t
        for o in outs:
            o[:] = jnp.zeros_like(o)

        def i_body(i, _):
            i0 = i * t
            sli = pl.ds(i0, t)
            cols = op["load"](planes, gm_ref, sli, t)
            vecs, w, _, phiw = op["pair"](planes, gm_ref, sli, cols,
                                          eps2, guarded)
            carry0 = _row_parts(op, vecs, w, phiw)

            def j_body(j, carry):
                slj = pl.ds(j * t, t)
                vecs, w, wi, phiw = op["pair"](planes, gm_ref, slj, cols,
                                               eps2, guarded)
                parts = _row_parts(op, vecs, w, phiw)
                _scatter_cols(op, outs, slj, vecs, wi, phiw)
                return tuple(c + p for c, p in zip(carry, parts))

            res = jax.lax.fori_loop(i + 1, nt, j_body, carry0)
            _write_rows(op, outs, sli, res, t, add=True)
            return 0

        jax.lax.fori_loop(0, nt, i_body, 0)

    return kernel


def _make_cross_kernel(op, t):
    """Cross-pair sweep between two DISJOINT sets: every (A-row, B-source)
    pair once; A gets action rows, B gets reaction columns. No diagonal
    special case (disjoint by construction), so self terms never appear
    here — for phi they live entirely in the diagonal/sym kernel."""

    def kernel(*refs, guarded):
        np_ = op["nplanes"]
        planesA = refs[:np_]
        gmA = refs[np_]
        planesB = refs[np_ + 1:2 * np_ + 1]
        gmB = refs[2 * np_ + 1]
        eps2 = refs[2 * np_ + 2][0, 0]
        outsA = refs[2 * np_ + 3:2 * np_ + 3 + op["nouts"]]
        outsB = refs[2 * np_ + 3 + op["nouts"]:]
        ntA = planesA[0].shape[1] // t
        ntB = planesB[0].shape[1] // t
        for o in outsB:
            o[:] = jnp.zeros_like(o)

        def i_body(i, _):
            sli = pl.ds(i * t, t)
            cols = op["load"](planesA, gmA, sli, t)

            def j_body(j, carry):
                slj = pl.ds(j * t, t)
                vecs, w, wi, phiw = op["pair"](planesB, gmB, slj, cols,
                                               eps2, guarded)
                parts = _row_parts(op, vecs, w, phiw)
                _scatter_cols(op, outsB, slj, vecs, wi, phiw)
                return tuple(c + p for c, p in zip(carry, parts))

            zero = tuple(jnp.zeros((t, 1), jnp.float32)
                         for _ in range(3 * op["ngroups"]
                                        + (1 if op["has_phi"] else 0)))
            res = jax.lax.fori_loop(0, ntB, j_body, zero)
            _write_rows(op, outsA, sli, res, t, add=False)
            return 0

        jax.lax.fori_loop(0, ntA, i_body, 0)

    return kernel


def _out_shapes(op, npad):
    shapes = [jax.ShapeDtypeStruct((3, npad), jnp.float32)
              for _ in range(op["ngroups"])]
    if op["has_phi"]:
        shapes.append(jax.ShapeDtypeStruct((1, npad), jnp.float32))
    return shapes


def _sym_call(op, t, planesT, gm, eps2, guarded):
    """op's self-interaction sweep as one pallas_call; returns the output
    tuple (vec groups [+ phi]) in transposed (3/1, npad) layout."""
    npad = planesT[0].shape[1]
    fl, by = op["sym_cost"]
    out = _call(
        functools.partial(_make_sym_kernel(op, t), guarded=guarded),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
                 * (op["nplanes"] + 1)
                 + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in range(op["nouts"])),
        out_shape=tuple(_out_shapes(op, npad)),
        cost_estimate=pl.CostEstimate(
            flops=fl * npad * npad, bytes_accessed=npad * by,
            transcendentals=npad * npad // 2,
        ),
    )(*planesT, gm, eps2)
    return out if isinstance(out, (tuple, list)) else (out,)


def _cross_call(op, t, planesA, gmA, planesB, gmB, eps2, guarded):
    """op's cross-pair sweep; returns (outsA..., outsB...)."""
    npad = planesA[0].shape[1]
    fl, by = op["cross_cost"]
    out = _call(
        functools.partial(_make_cross_kernel(op, t), guarded=guarded),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
                 * (2 * op["nplanes"] + 2)
                 + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in range(2 * op["nouts"])),
        out_shape=tuple(_out_shapes(op, npad) + _out_shapes(op, npad)),
        cost_estimate=pl.CostEstimate(
            flops=fl * npad * npad, bytes_accessed=npad * by,
            transcendentals=npad * npad,
        ),
    )(*planesA, gmA, *planesB, gmB, eps2)
    return tuple(out)


# ---- generic chunked / batched drivers ------------------------------------

def _chunked_diag(op, t, chunk, planesT, gm, eps2, guarded):
    """All diagonal chunks through the sym kernel via lax.map (one trace,
    C sequential calls); returns full-(npad) transposed outputs."""
    npad = planesT[0].shape[1]
    C = npad // chunk

    def ch(a):
        k = a.shape[0]
        return a.reshape(k, C, chunk).transpose(1, 0, 2)

    outs = jax.lax.map(
        lambda ab: _sym_call(op, t, ab[:-1], ab[-1], eps2, guarded),
        tuple(ch(p) for p in planesT) + (ch(gm),))
    return [o.transpose(1, 0, 2).reshape(o.shape[1], npad) for o in outs]


def _zeros_outs(op, planesT):
    outs = [jnp.zeros_like(planesT[0]) for _ in range(op["ngroups"])]
    if op["has_phi"]:
        outs.append(jnp.zeros_like(planesT[0][:1]))
    return outs


def _cross_accumulate(op, t, chunk, planesT, gm, eps2, guarded, outs, ij,
                      valid=None):
    """One cross-pair (chunk i, chunk j) evaluated and accumulated into
    the full-size outputs at both chunks' slots. ``valid`` masks sentinel
    (-1, -1) padding entries in the batched form (the cross call still
    runs on chunk 0 vs chunk 0 — wasted but branch-free)."""
    ia = (jnp.maximum(ij[0], 0) if valid is not None else ij[0]) * chunk
    ja = (jnp.maximum(ij[1], 0) if valid is not None else ij[1]) * chunk

    def sl(a, off):
        return jax.lax.dynamic_slice(a, (0, off), (a.shape[0], chunk))

    res = _cross_call(op, t,
                      tuple(sl(p, ia) for p in planesT), sl(gm, ia),
                      tuple(sl(p, ja) for p in planesT), sl(gm, ja),
                      eps2, guarded)
    resA, resB = res[:op["nouts"]], res[op["nouts"]:]
    w = (jnp.where(valid, jnp.float32(1.0), jnp.float32(0.0))
         if valid is not None else None)
    new = []
    for o, a, b in zip(outs, resA, resB):
        if w is not None:
            a, b = w * a, w * b
        o = jax.lax.dynamic_update_slice(o, sl(o, ia) + a, (0, ia))
        o = jax.lax.dynamic_update_slice(o, sl(o, ja) + b, (0, ja))
        new.append(o)
    return new


def _sym_chunked_generic(op, t, chunk, planesT, gm, eps2, guarded):
    """In-jit chunked self-interaction: diagonal chunks + a lax.scan over
    the static (i, j) cross-pair list (the cross kernel traces ONCE
    regardless of C — 28 pairs at 1M, 528 at 8M)."""
    npad = planesT[0].shape[1]
    C = npad // chunk
    outs = _chunked_diag(op, t, chunk, planesT, gm, eps2, guarded)
    if C > 1:
        pairs = jnp.asarray(
            [(i, j) for i in range(C) for j in range(i + 1, C)], jnp.int32)

        def body(outs, ij):
            return _cross_accumulate(op, t, chunk, planesT, gm, eps2,
                                     guarded, outs, ij), None

        outs, _ = jax.lax.scan(body, outs, pairs)
    return outs


def _make_chunked_batch(op):
    """One dispatch of the batched chunked-sym op: the diagonal sweep
    (when with_diag) plus a PADDED slice of the cross-pair list
    (sentinels (-1, -1) masked to zero contribution)."""

    @functools.partial(jax.jit,
                       static_argnames=("guarded", "chunk", "t",
                                        "with_diag"))
    def batch(planesT, gm, eps2, pairs, guarded, chunk, t, with_diag):
        if with_diag:
            outs = _chunked_diag(op, t, chunk, planesT, gm, eps2, guarded)
        else:
            outs = _zeros_outs(op, planesT)

        def body(outs, ij):
            return _cross_accumulate(op, t, chunk, planesT, gm, eps2,
                                     guarded, outs, ij,
                                     valid=ij[0] >= 0), None

        outs, _ = jax.lax.scan(body, outs, pairs)
        return tuple(outs)

    return batch


_chunked_batch = _make_chunked_batch(_OP_A)
_chunked_phi_batch = _make_chunked_batch(_OP_P)
_chunked_jerk_batch = _make_chunked_batch(_OP_J)
_chunked_x_batch = _make_chunked_batch(_OP_AX)
_chunked_x_phi_batch = _make_chunked_batch(_OP_PX)
_chunked_xj_batch = _make_chunked_batch(_OP_JX)


def _split_pairs(C, n_batches):
    """The padded cross-pair list split evenly: every batch compiles ONCE
    (same shapes); pad entries are (-1, -1) sentinels."""
    pair_list = [(i, j) for i in range(C) for j in range(i + 1, C)]
    nb = max(1, min(n_batches, max(1, len(pair_list))))
    per = -(-len(pair_list) // nb) if pair_list else 0
    pair_list += [(-1, -1)] * (per * nb - len(pair_list))
    return pair_list, nb, per


def _pipelined_batches(dispatch, nb, per, pair_list):
    """Depth-2 pipelined dispatch loop shared by the batched wrappers:
    batch b+1 is SUBMITTED before blocking on batch b, hiding the relay
    round-trip between dispatches, while every host wait stays bounded by
    ~one dispatch (fire-and-forget would queue all nb programs and make
    the final wait nb x longer — the watchdog shape the splitting exists
    to avoid). dispatch(b, pairs) -> array or tuple of arrays; returns
    the elementwise sum across batches."""
    acc = prev = None
    for b in range(nb):
        sl = pair_list[b * per:(b + 1) * per]
        pairs = jnp.asarray(sl if sl else [(-1, -1)], jnp.int32)
        part = dispatch(b, pairs)
        if prev is not None:
            jax.block_until_ready(prev)
        acc = part if acc is None else jax.tree_util.tree_map(
            jnp.add, acc, part)
        prev = part
    jax.block_until_ready(acc)
    return acc


# ---- operand preparation (shared by the thin public wrappers) -------------

def _prep_f32_T(pos, mass, G, npad, vel=None):
    """Transposed zero-padded f32 operands: plane list + gm row."""
    if vel is None:
        pos_c, mass_c = prepare_f32(pos, mass)
        planes = [pos_c.T]
    else:
        pos_c, mass_c, vel_c = prepare_f32(pos, mass, vel=vel)
        planes = [pos_c.T, vel_c.T]
    n = pos.shape[0]
    planes = [jnp.pad(p, ((0, 0), (0, npad - n))) for p in planes]
    gm = jnp.pad((jnp.asarray(G, jnp.float32) * mass_c)[None, :],
                 ((0, 0), (0, npad - n)))
    return planes, gm, mass_c


def _prep_x_T(pos, mass, G, npad, vel=None):
    """Extended-tier operands: ONE global centring, hi/lo split of
    positions (and velocities) BEFORE any chunking — chunk-local centring
    would break the hi/lo invariant across chunks."""
    center = jnp.mean(pos, axis=0)
    hi, lo = _split_rows(pos, center)
    planes = [_padT(hi, npad), _padT(lo, npad)]
    if vel is not None:
        vcenter = jnp.mean(vel, axis=0)
        vhi, vlo = _split_rows(vel, vcenter)
        planes += [_padT(vhi, npad), _padT(vlo, npad)]
    gm0 = (jnp.asarray(G, jnp.float64)
           * jnp.asarray(mass, jnp.float64)).astype(jnp.float32)
    n = pos.shape[0]
    gm = jnp.pad(gm0[None, :], ((0, 0), (0, npad - n)))
    return planes, gm


def _chunk_check(chunk, t, tname):
    if chunk % t != 0:
        raise ValueError(f"chunk {chunk} must be a multiple of {tname} {t}")
