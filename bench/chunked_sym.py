#!/usr/bin/env python
"""Validate + slope-time the chunked pair-symmetric accel past STREAM_N.

The resident sym kernels stop at STREAM_N (262144); beyond that the
default accel falls back to the one-sided HBM-streamed sweep (measured
1.82e11 int/s at 1M). accel_sym_chunked computes each unique pair once
(diagonal chunks through the resident sym kernel, off-diagonal chunk
pairs through the cross-sym kernel) — this script checks it against the
streamed kernel and the blocked-jnp oracle at a non-chunk-multiple N,
then slope-times both at N=1M (production: unguarded, eps>0).

Timing protocol (memory: axon relay): dependent fori_loop chain inside
ONE jit, chain(1+k)-chain(1) slope; any single dispatch kept well under
~40 s.

Usage: python bench/chunked_sym.py [--quick]
Writes bench/chunked_sym.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

from oc_nbody_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax.numpy as jnp  # noqa: E402

from oc_nbody_tpu.ops import gravity, pallas_gravity as pg  # noqa: E402

EPS = 1.0 / 256


def _stream_accel(p, m):
    """One-sided streamed self-interaction accel (the pre-chunked default;
    pg.accel itself now dispatches past STREAM_N to the chunked kernel)."""
    pc, mc = pg.prepare_f32(p, m)
    return pg.accel_rows(pc, pc, mc, jnp.float32(EPS), jnp.float32(1.0),
                         0, False)


def _stream_accel_phi(p, m):
    pc, mc = pg.prepare_f32(p, m)
    acc, phi = pg.accel_potential_rows(pc, pc, mc, jnp.float32(EPS),
                                       jnp.float32(1.0), 0, False)
    return acc, phi + pg.self_phi(mc, jnp.float32(EPS), jnp.float32(1.0))


def _cloud(key, n):
    kp, km = jax.random.split(key)
    pos = jax.random.normal(kp, (n, 3), jnp.float32)
    mass = jax.random.uniform(km, (n,), jnp.float32, 0.5, 1.5) / n
    return pos, mass


def _slope(fn, pos, mass, k):
    @jax.jit
    def chain(p, steps):
        def body(_, q):
            a = fn(q, mass)
            return q + 1e-30 * a
        return jax.lax.fori_loop(0, steps, body, p)

    chain(pos, 1).block_until_ready()  # compile + warm
    t0 = time.perf_counter()
    chain(pos, 1).block_until_ready()
    t1 = time.perf_counter()
    chain(pos, 1 + k).block_until_ready()
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / k


def main():
    if jax.default_backend() == "cpu":
        print("needs a TPU backend; skipping")
        return 0
    quick = "--quick" in sys.argv

    if "--big" in sys.argv:
        # 2,097,152 chunked accel: the largest N whose slope chain stays
        # under the relay's ~40 s single-dispatch flakiness line
        # (chain(2) ≈ 31 s; a one-sided streamed chain would need 2×).
        # Appends to the existing json rather than re-running everything.
        n = 2_097_152
        pos, mass = _cloud(jax.random.PRNGKey(n), n)
        t_chunk = _slope(
            lambda p, m: pg.accel_sym_chunked(p, m, EPS, guarded=False),
            pos, mass, 1)
        path = os.path.join(os.path.dirname(__file__), "chunked_sym.json")
        out = json.load(open(path))
        out["big_row"] = {
            "n": n,
            "chunked_sym_ms": t_chunk * 1e3,
            "chunked_sym_int_per_s_n2eq": n * n / t_chunk,
        }
        json.dump(out, open(path, "w"), indent=1)
        print(f"N={n}: chunked-sym {t_chunk*1e3:.1f} ms "
              f"({n*n/t_chunk:.3e} N2-eq int/s)")
        return 0

    if "--xdiag" in sys.argv:
        # Extended-tier chunked phi + jerk at 1M (round-3 late: the
        # extended diagnostics/Hermite passes previously had only the
        # one-sided streamed hilo sweep past STREAM_N). Appends.
        path = os.path.join(os.path.dirname(__file__), "chunked_sym.json")
        out = json.load(open(path))

        def _split(p):
            center = jnp.mean(p, axis=0)
            d = p - center
            hi = d.astype(jnp.float32)
            lo = (d - hi.astype(d.dtype)).astype(jnp.float32)
            return hi, lo

        def _stream_phi_x(p, m):
            hi, lo = _split(p)
            gm = m.astype(jnp.float32)
            return pg.accel_potential_rows_x_hilo(
                hi, lo, hi, lo, gm, jnp.float32(EPS), guarded=False)

        def _stream_jerk_x(p, v, m):
            return pg.accel_jerk_rows_x(p, v, p, v, m, EPS, 1.0,
                                        guarded=False)

        # correctness at a non-chunk-multiple N past STREAM_N
        nv = 300_001
        kp, kv = jax.random.split(jax.random.PRNGKey(61))
        pos, mass = _cloud(kp, nv)
        pos = pos.astype(jnp.float64)
        mass = mass.astype(jnp.float64)
        vel = 0.3 * jax.random.normal(kv, (nv, 3), jnp.float64)
        ac, pc = pg.accel_potential_sym_x_chunked(pos, mass, EPS,
                                                  guarded=False)
        as_, ps = _stream_phi_x(pos, mass)
        xs = float(jnp.max(jnp.linalg.norm(as_, axis=1)))
        perr = float(jnp.max(jnp.abs(pc - ps)
                             / jnp.maximum(jnp.abs(ps), 1e-30)))
        aerr = float(jnp.max(jnp.linalg.norm(ac - as_, axis=1))) / xs
        jac, jjc = pg.accel_jerk_sym_x_chunked(pos, vel, mass, EPS,
                                               guarded=False)
        jas, jjs = _stream_jerk_x(pos, vel, mass)
        jaerr = float(jnp.max(jnp.linalg.norm(jac - jas, axis=1))) / float(
            jnp.max(jnp.linalg.norm(jas, axis=1)))
        jjerr = float(jnp.max(jnp.linalg.norm(jjc - jjs, axis=1))) / float(
            jnp.max(jnp.linalg.norm(jjs, axis=1)))
        out["xdiag_rel_err_vs_streamed"] = {
            "phi_accel": aerr, "phi": perr, "jerk_accel": jaerr,
            "jerk": jjerr}
        print(f"N={nv}: x-chunked vs streamed-hilo rel err: phi-accel "
              f"{aerr:.2e} phi {perr:.2e} jerk-accel {jaerr:.2e} "
              f"jerk {jjerr:.2e}")

        # slope timing at 1M
        n = 1_048_576
        kp, kv = jax.random.split(jax.random.PRNGKey(n + 5))
        pos, mass = _cloud(kp, n)
        pos = pos.astype(jnp.float64)
        mass = mass.astype(jnp.float64)
        vel = 0.3 * jax.random.normal(kv, (n, 3), jnp.float64)

        def _slope_pair(fn, k, with_vel=False):
            @jax.jit
            def chain(p, steps):
                def body(_, q):
                    if with_vel:
                        a, b = fn(q, vel, mass)
                    else:
                        a, b = fn(q, mass)
                    return q + 1e-30 * a + 1e-30 * jnp.mean(b) * a
                return jax.lax.fori_loop(0, steps, body, p)

            chain(pos, 1).block_until_ready()
            t0 = time.perf_counter()
            chain(pos, 1).block_until_ready()
            t1 = time.perf_counter()
            chain(pos, 1 + k).block_until_ready()
            t2 = time.perf_counter()
            return ((t2 - t1) - (t1 - t0)) / k

        t_ps = _slope_pair(_stream_phi_x, 1)
        t_pc = _slope_pair(
            lambda p, m: pg.accel_potential_sym_x_chunked(
                p, m, EPS, guarded=False), 2)
        out["extended_phi_1m"] = {
            "streamed_hilo_ms": t_ps * 1e3,
            "chunked_sym_x_ms": t_pc * 1e3,
            "speedup": t_ps / t_pc,
        }
        print(f"N={n} extended accel+phi: streamed-hilo {t_ps*1e3:.1f} ms"
              f" | chunked-sym-x {t_pc*1e3:.1f} ms -> {t_ps/t_pc:.2f}x")
        t_js = _slope_pair(_stream_jerk_x, 1, with_vel=True)
        t_jc = _slope_pair(
            lambda p, v, m: pg.accel_jerk_sym_x_chunked(
                p, v, m, EPS, guarded=False), 1, with_vel=True)
        out["extended_jerk_1m"] = {
            "streamed_ms": t_js * 1e3,
            "chunked_sym_x_ms": t_jc * 1e3,
            "speedup": t_js / t_jc,
        }
        print(f"N={n} extended jerk: streamed {t_js*1e3:.1f} ms | "
              f"chunked-sym-xj {t_jc*1e3:.1f} ms -> {t_js/t_jc:.2f}x")
        json.dump(out, open(path, "w"), indent=1)
        return 0

    if "--hugex" in sys.argv:
        # 4M extended-tier full eval via the batched path (the extended
        # MacroKDK force evaluation). Appends.
        import numpy as np
        path = os.path.join(os.path.dirname(__file__), "chunked_sym.json")
        out = json.load(open(path))
        n, nb = 4_194_304, 8
        pos, mass = _cloud(jax.random.PRNGKey(n), n)
        pos = pos.astype(jnp.float64)
        mass = mass.astype(jnp.float64)
        t = None
        for rep in range(2):
            t0 = time.perf_counter()
            a = pg.accel_sym_x_chunked_batched(pos, mass, EPS,
                                               guarded=False, n_batches=nb)
            np.asarray(a)
            t = time.perf_counter() - t0
            pos = pos + 1e-30 * a
        out["huge_x_row"] = {"n": n, "n_batches": nb, "wall_s": t,
                             "int_per_s_n2eq": n * n / t}
        print(f"N={n}: batched extended full eval {t:.1f} s "
              f"({n*n/t:.3e} N2-eq int/s, {nb} dispatches)")
        json.dump(out, open(path, "w"), indent=1)
        return 0

    if "--huge" in sys.argv:
        # Full 4M / 8M single-chip evals via the multi-dispatch batched
        # path (a monolithic eval at these N is a 60-240 s XLA program —
        # past this environment's relay watchdog). Wall includes the
        # host readback; the second (warm) eval with perturbed positions
        # is the recorded number. Appends to the existing json.
        import numpy as np
        path = os.path.join(os.path.dirname(__file__), "chunked_sym.json")
        out = json.load(open(path))
        out["huge_rows"] = []
        for n, nb in ((4_194_304, 4), (8_388_608, 8)):
            pos, mass = _cloud(jax.random.PRNGKey(n), n)
            t = None
            for rep in range(2):  # rep 0 warms the compile
                t0 = time.perf_counter()
                a = pg.accel_sym_chunked_batched(pos, mass, EPS,
                                                 guarded=False,
                                                 n_batches=nb)
                np.asarray(a)  # force full readback
                t = time.perf_counter() - t0
                pos = pos + 1e-30 * a.astype(pos.dtype)
            row = {"n": n, "n_batches": nb, "wall_s": t,
                   "int_per_s_n2eq": n * n / t}
            out["huge_rows"].append(row)
            print(f"N={n}: batched chunked-sym full eval {t:.1f} s "
                  f"({n*n/t:.3e} N2-eq int/s, {nb} dispatches)")
            json.dump(out, open(path, "w"), indent=1)
        return 0

    out = {"eps": EPS, "chunk": pg.CHUNK_SYM}

    # -- correctness at a non-chunk-multiple N past STREAM_N ------------
    nv = 300_001
    pos, mass = _cloud(jax.random.PRNGKey(7), nv)
    a_chunk = pg.accel_sym_chunked(pos, mass, EPS, 1.0, guarded=False)
    a_stream = _stream_accel(pos, mass)
    a_jnp = gravity.accel(pos, mass, EPS)
    scale = float(jnp.max(jnp.linalg.norm(a_jnp, axis=1)))
    err_vs_stream = float(
        jnp.max(jnp.linalg.norm(a_chunk - a_stream, axis=1))) / scale
    err_vs_jnp = float(
        jnp.max(jnp.linalg.norm(a_chunk - a_jnp, axis=1))) / scale
    out["validate_n"] = nv
    out["rel_err_vs_streamed"] = err_vs_stream
    out["rel_err_vs_jnp_oracle"] = err_vs_jnp
    print(f"N={nv}: chunked vs streamed rel err {err_vs_stream:.2e}, "
          f"vs jnp oracle {err_vs_jnp:.2e}")
    ok = err_vs_stream < 5e-5 and err_vs_jnp < 5e-5
    out["validate_ok"] = ok

    # -- phi variant correctness ---------------------------------------
    ap_chunk, phi_chunk = pg.accel_potential_sym_chunked(
        pos, mass, EPS, 1.0, guarded=False)
    ap_jnp, phi_jnp = gravity.accel_potential(pos, mass, EPS)
    perr = float(jnp.max(jnp.abs(phi_chunk - phi_jnp)
                         / jnp.maximum(jnp.abs(phi_jnp), 1e-30)))
    aerr = float(jnp.max(jnp.linalg.norm(ap_chunk - ap_jnp, axis=1))) / scale
    out["phi_rel_err_vs_jnp"] = perr
    out["phi_accel_rel_err_vs_jnp"] = aerr
    print(f"N={nv}: chunked accel+phi vs jnp oracle: accel {aerr:.2e}, "
          f"phi {perr:.2e}")
    ok = ok and perr < 5e-5 and aerr < 5e-5
    out["validate_ok"] = ok
    if not ok:
        print("VALIDATION FAILED")
        json.dump(out, open(os.path.join(os.path.dirname(__file__),
                                         "chunked_sym.json"), "w"), indent=1)
        return 1

    # -- slope timing at 1M (production: unguarded) ---------------------
    rows = []
    for n in ([1_048_576] if quick else [524_288, 1_048_576]):
        pos, mass = _cloud(jax.random.PRNGKey(n), n)
        k = 3 if n <= 524_288 else 2
        t_stream = _slope(_stream_accel, pos, mass, k)
        t_chunk = _slope(
            lambda p, m: pg.accel_sym_chunked(p, m, EPS, guarded=False),
            pos, mass, k)
        row = {
            "n": n,
            "streamed_ms": t_stream * 1e3,
            "chunked_sym_ms": t_chunk * 1e3,
            "streamed_int_per_s": n * n / t_stream,
            "chunked_sym_int_per_s_n2eq": n * n / t_chunk,
            "speedup": t_stream / t_chunk,
        }
        rows.append(row)
        print(f"N={n}: streamed {t_stream*1e3:.1f} ms "
              f"({n*n/t_stream:.3e} int/s) | chunked-sym "
              f"{t_chunk*1e3:.1f} ms ({n*n/t_chunk:.3e} N2-eq int/s) "
              f"-> {t_stream/t_chunk:.2f}x")
    out["rows"] = rows

    # -- phi variant timing at 1M (the c6 diagnostics pass) -------------
    n = 1_048_576
    pos, mass = _cloud(jax.random.PRNGKey(n + 1), n)

    def _slope2(fn, k=2):
        @jax.jit
        def chain(p, steps):
            def body(_, q):
                a, phi = fn(q, mass)
                return q + 1e-30 * a + 1e-30 * phi[:, None]
            return jax.lax.fori_loop(0, steps, body, p)

        chain(pos, 1).block_until_ready()
        t0 = time.perf_counter()
        chain(pos, 1).block_until_ready()
        t1 = time.perf_counter()
        chain(pos, 1 + k).block_until_ready()
        t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / k

    t_pstream = _slope2(_stream_accel_phi)
    t_pchunk = _slope2(
        lambda p, m: pg.accel_potential_sym_chunked(p, m, EPS,
                                                    guarded=False))
    out["phi_1m"] = {
        "streamed_ms": t_pstream * 1e3,
        "chunked_sym_ms": t_pchunk * 1e3,
        "speedup": t_pstream / t_pchunk,
    }
    print(f"N={n} accel+phi: streamed {t_pstream*1e3:.1f} ms | chunked-sym "
          f"{t_pchunk*1e3:.1f} ms -> {t_pstream/t_pchunk:.2f}x")

    # -- extended tier: correctness + timing ----------------------------
    def _stream_accel_x(p, m):
        """One-sided streamed hilo extended accel (pre-chunked default)."""
        center = jnp.mean(p, axis=0)
        d = p - center
        hi = d.astype(jnp.float32)
        lo = (d - hi.astype(d.dtype)).astype(jnp.float32)
        gm = m.astype(jnp.float32)
        return pg.accel_rows_x_hilo(hi, lo, hi, lo, gm, jnp.float32(EPS),
                                    guarded=False)

    nv2 = 300_001
    pos64, mass64 = _cloud(jax.random.PRNGKey(23), nv2)
    pos64 = pos64.astype(jnp.float64)
    mass64 = mass64.astype(jnp.float64)
    ax_chunk = pg.accel_sym_x_chunked(pos64, mass64, EPS, 1.0,
                                      guarded=False)
    ax_stream = _stream_accel_x(pos64, mass64)
    xscale = float(jnp.max(jnp.linalg.norm(ax_stream, axis=1)))
    xerr = float(jnp.max(jnp.linalg.norm(
        ax_chunk - ax_stream, axis=1))) / xscale
    out["x_rel_err_vs_streamed_hilo"] = xerr
    print(f"N={nv2}: extended chunked vs streamed-hilo rel err {xerr:.2e}")

    n = 1_048_576
    pos64, mass64 = _cloud(jax.random.PRNGKey(n + 2), n)
    pos64 = pos64.astype(jnp.float64)
    mass64 = mass64.astype(jnp.float64)
    t_xstream = _slope(_stream_accel_x, pos64, mass64, 1)
    t_xchunk = _slope(
        lambda p, m: pg.accel_sym_x_chunked(p, m, EPS, guarded=False),
        pos64, mass64, 2)
    out["extended_1m"] = {
        "streamed_hilo_ms": t_xstream * 1e3,
        "chunked_sym_x_ms": t_xchunk * 1e3,
        "speedup": t_xstream / t_xchunk,
    }
    print(f"N={n} extended accel: streamed-hilo {t_xstream*1e3:.1f} ms | "
          f"chunked-sym-x {t_xchunk*1e3:.1f} ms -> "
          f"{t_xstream/t_xchunk:.2f}x")

    # -- jerk: correctness + timing (shared-Hermite past STREAM_N) ------
    def _stream_accel_jerk(p, v, m):
        pc, mc, vc = pg.prepare_f32(p, m, vel=v)
        return pg.accel_jerk_rows(pc, vc, pc, vc, mc, jnp.float32(EPS),
                                  jnp.float32(1.0), 0, False)

    nv3 = 300_001
    kp, kv = jax.random.split(jax.random.PRNGKey(29))
    posj, massj = _cloud(kp, nv3)
    velj = 0.3 * jax.random.normal(kv, (nv3, 3), jnp.float32)
    aj_c, jj_c = pg.accel_jerk_sym_chunked(posj, velj, massj, EPS, 1.0,
                                           guarded=False)
    aj_s, jj_s = _stream_accel_jerk(posj, velj, massj)
    jascale = float(jnp.max(jnp.linalg.norm(aj_s, axis=1)))
    jjscale = float(jnp.max(jnp.linalg.norm(jj_s, axis=1)))
    jaerr = float(jnp.max(jnp.linalg.norm(aj_c - aj_s, axis=1))) / jascale
    jjerr = float(jnp.max(jnp.linalg.norm(jj_c - jj_s, axis=1))) / jjscale
    out["jerk_rel_err_vs_streamed"] = {"accel": jaerr, "jerk": jjerr}
    print(f"N={nv3}: chunked jerk vs streamed rel err accel {jaerr:.2e}, "
          f"jerk {jjerr:.2e}")

    n = 1_048_576
    kp, kv = jax.random.split(jax.random.PRNGKey(n + 3))
    posj, massj = _cloud(kp, n)
    velj = 0.3 * jax.random.normal(kv, (n, 3), jnp.float32)

    def _slope_jerk(fn, k):
        @jax.jit
        def chain(p, steps):
            def body(_, q):
                a, j = fn(q)
                return q + 1e-30 * a + 1e-30 * j
            return jax.lax.fori_loop(0, steps, body, p)

        chain(posj, 1).block_until_ready()
        t0 = time.perf_counter()
        chain(posj, 1).block_until_ready()
        t1 = time.perf_counter()
        chain(posj, 1 + k).block_until_ready()
        t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / k

    t_jstream = _slope_jerk(lambda p: _stream_accel_jerk(p, velj, massj), 1)
    t_jchunk = _slope_jerk(
        lambda p: pg.accel_jerk_sym_chunked(p, velj, massj, EPS,
                                            guarded=False), 2)
    out["jerk_1m"] = {
        "streamed_ms": t_jstream * 1e3,
        "chunked_sym_ms": t_jchunk * 1e3,
        "speedup": t_jstream / t_jchunk,
    }
    print(f"N={n} accel+jerk: streamed {t_jstream*1e3:.1f} ms | "
          f"chunked-sym {t_jchunk*1e3:.1f} ms -> "
          f"{t_jstream/t_jchunk:.2f}x")
    json.dump(out, open(os.path.join(os.path.dirname(__file__),
                                     "chunked_sym.json"), "w"), indent=1)
    print("wrote bench/chunked_sym.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
