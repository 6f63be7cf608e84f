#!/usr/bin/env python
"""Validate the Pallas kernels against the f64 oracle on real TPU hardware.

(The pytest suite runs on emulated CPU devices where Pallas TPU kernels
cannot execute, so kernel/oracle equivalence is checked here and by the
driver's bench runs. SURVEY.md §4.1 "Pallas output ≡ pure-jnp oracle".)

Usage: python bench/validate_pallas.py [--section S]

Sections (default "all"): base (one-sided + resident sym + tiers +
streamed), chunked (f32 chunked family), batched (f32 multi-dispatch),
chunkedx (extended chunked family), batchedx (extended multi-dispatch),
cross (halfring cross-pair wrappers, f32 + extended).
Cold compiles are 1-6 min/program through this environment's remote-
compile relay and a KILLED process does not populate the compile cache —
running section by section lets each process exit cleanly and cache its
programs, so an interrupted full validation never loses more than one
section's work.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

from oc_nbody_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax.numpy as jnp  # noqa: E402

from oc_nbody_tpu.ops import gravity, pallas_gravity  # noqa: E402

TOL = 5e-6


def main():
    if jax.default_backend() == "cpu":
        print("needs a TPU backend; skipping")
        return 0
    sec = "all"
    if "--section" in sys.argv:
        sec = sys.argv[sys.argv.index("--section") + 1]

    def on(name):
        return sec in ("all", name)

    key = jax.random.PRNGKey(0)
    failures = []
    for n in (100, 1000, 3000) if on("base") else ():
        kp, kv = jax.random.split(jax.random.fold_in(key, n))
        pos = jax.random.normal(kp, (n, 3), jnp.float64)
        vel = 0.3 * jax.random.normal(kv, (n, 3), jnp.float64)
        mass = jnp.ones(n) / n

        ref = gravity.accel_direct(pos, mass, eps=0.05)
        out = pallas_gravity.accel(pos, mass, eps=0.05)
        scale = float(jnp.max(jnp.linalg.norm(ref, axis=1)))
        err = float(jnp.max(jnp.linalg.norm(out - ref, axis=1))) / scale
        print(f"N={n:6d} accel   rel err {err:.2e}")
        if err > TOL:
            failures.append(("accel", n, err))

        _, phi_ref = gravity.accel_potential_direct(pos, mass, eps=0.05)
        _, phi = pallas_gravity.accel_potential(pos, mass, eps=0.05)
        err = float(jnp.max(jnp.abs(phi - phi_ref) / jnp.abs(phi_ref)))
        print(f"N={n:6d} phi     rel err {err:.2e}")
        if err > TOL:
            failures.append(("phi", n, err))

        a_ref, j_ref = gravity.accel_jerk_direct(pos, vel, mass, eps=0.05)
        a, j = pallas_gravity.accel_jerk(pos, vel, mass, eps=0.05)
        jscale = float(jnp.max(jnp.linalg.norm(j_ref, axis=1)))
        err = float(jnp.max(jnp.linalg.norm(j - j_ref, axis=1))) / jscale
        print(f"N={n:6d} jerk    rel err {err:.2e}")
        if err > TOL:
            failures.append(("jerk", n, err))

        # pair-symmetric kernels (W3): reaction-accumulated sums
        a_sym = pallas_gravity.accel_sym(pos, mass, eps=0.05)
        err = float(jnp.max(jnp.linalg.norm(a_sym - ref, axis=1))) / scale
        print(f"N={n:6d} accSYM  rel err {err:.2e}")
        if err > TOL:
            failures.append(("accel_sym", n, err))
        _, phi_sym = pallas_gravity.accel_potential_sym(pos, mass, eps=0.05)
        err = float(jnp.max(jnp.abs(phi_sym - phi_ref) / jnp.abs(phi_ref)))
        print(f"N={n:6d} phiSYM  rel err {err:.2e}")
        if err > TOL:
            failures.append(("phi_sym", n, err))
        a_s, j_s = pallas_gravity.accel_jerk_sym(pos, vel, mass, eps=0.05)
        err = max(float(jnp.max(jnp.linalg.norm(a_s - ref, axis=1))) / scale,
                  float(jnp.max(jnp.linalg.norm(j_s - j_ref, axis=1)))
                  / jscale)
        print(f"N={n:6d} jerkSYM rel err {err:.2e}")
        if err > TOL:
            failures.append(("jerk_sym", n, err))

    import oc_nbody_tpu.ops.pallas_gravity as pg
    if on("base"):
        # precision tiers (close-pair cluster: f32 kernels read ~6e-3
        # here). Hardware-only claims: the interpreter degrades the EFTs
        # (see tests/unit/test_pallas_tiers.py).
        from oc_nbody_tpu.ops import pallas_df
        key = jax.random.PRNGKey(9)
        kp, km = jax.random.split(key)
        n = 4096
        pos = jax.random.normal(kp, (n, 3), jnp.float64)
        pos = pos.at[100:200].set(
            pos[:100] + 1e-5 * jax.random.normal(km, (100, 3), jnp.float64))
        mass = jax.random.uniform(km, (n,), jnp.float64, 0.5, 1.5) / n
        ref = gravity.accel_direct(pos, mass, eps=1e-4)
        scale = float(jnp.max(jnp.linalg.norm(ref, axis=1)))
        for name, fn, tol in (
                ("extended", pallas_gravity.accel_x, 2e-5),
                ("extendedSYM", pallas_gravity.accel_sym_x, 2e-5),
                ("df32", pallas_df.accel_df_pallas, 1e-9)):
            out = fn(pos, mass, 1e-4)
            err = float(jnp.max(jnp.linalg.norm(out - ref, axis=1))) / scale
            print(f"tier {name:9s} rel err {err:.2e} (close pairs)")
            if err > tol:
                failures.append((name, n, err))

        # STREAMED extended path on hardware (round-3: hilo kernels stream
        # sources past STREAM_N): force the streamed dispatch at small N
        # and compare against the resident result — same inputs, same tier.
        res = pg.accel_x(pos, mass, 1e-4)
        old_stream_n = pg.STREAM_N
        pg.STREAM_N = 1024
        for f in (pg.accel_x, pg.accel_rows_x_hilo):
            f.clear_cache()
        try:
            stream = pg.accel_x(pos, mass, 1e-4)
        finally:
            pg.STREAM_N = old_stream_n
            for f in (pg.accel_x, pg.accel_rows_x_hilo):
                f.clear_cache()
        err = float(jnp.max(jnp.linalg.norm(stream - res, axis=1))) / scale
        print(f"tier extended-streamed vs resident rel err {err:.2e}")
        if err > 2e-6:
            failures.append(("extended_streamed", n, err))

    # CHUNKED + BATCHED families at a forced small chunk (C = 3: diagonal,
    # cross-pair AND sentinel-padding paths all execute on real Mosaic —
    # the production chunk would give C = 1 at validation N). 1536 is a
    # multiple of every sym tile (T_SYMA/T_SYMP/T_SYM 384-512 divides it).
    ck = 1536
    kp2, kv2, km2 = jax.random.split(jax.random.PRNGKey(21), 3)
    n = 4096
    pos_s = jax.random.normal(kp2, (n, 3), jnp.float64)
    vel_s = 0.3 * jax.random.normal(kv2, (n, 3), jnp.float64)
    mass_s = jax.random.uniform(km2, (n,), jnp.float64, 0.5, 1.5) / n
    ra = gravity.accel_direct(pos_s, mass_s, eps=0.05)
    _, rp = gravity.accel_potential_direct(pos_s, mass_s, eps=0.05)
    ra2, rj = gravity.accel_jerk_direct(pos_s, vel_s, mass_s, eps=0.05)
    asc = float(jnp.max(jnp.linalg.norm(ra, axis=1)))
    psc = float(jnp.max(jnp.abs(rp)))
    jsc = float(jnp.max(jnp.linalg.norm(rj, axis=1)))
    sphi = gravity.self_phi(mass_s, jnp.float64(0.05), jnp.float64(1.0))

    def _chk(name, err, tol):
        print(f"chunk {name:14s} rel err {err:.2e}")
        if err > tol:
            failures.append((name, n, err))

    XTOL = 2e-5  # extended tier: RAW phi contract (self_phi added first)
    if on("chunked"):
        a = pg.accel_sym_chunked(pos_s, mass_s, 0.05, chunk=ck)
        _chk("accel", float(jnp.max(jnp.linalg.norm(a - ra, axis=1))) / asc,
             TOL)
        a, p = pg.accel_potential_sym_chunked(pos_s, mass_s, 0.05, chunk=ck)
        _chk("phi", float(jnp.max(jnp.abs(p - rp))) / psc, TOL)
        a, j = pg.accel_jerk_sym_chunked(pos_s, vel_s, mass_s, 0.05,
                                         chunk=ck)
        _chk("jerk", float(jnp.max(jnp.linalg.norm(j - rj, axis=1))) / jsc,
             TOL)
    if on("batched"):
        a = pg.accel_sym_chunked_batched(pos_s, mass_s, 0.05, chunk=ck,
                                         n_batches=2)
        _chk("accel-bat", float(jnp.max(jnp.linalg.norm(a - ra, axis=1)))
             / asc, TOL)
        a, p = pg.accel_potential_sym_chunked_batched(pos_s, mass_s, 0.05,
                                                      chunk=ck, n_batches=2)
        _chk("phi-bat", float(jnp.max(jnp.abs(p - rp))) / psc, TOL)
        a, j = pg.accel_jerk_sym_chunked_batched(pos_s, vel_s, mass_s, 0.05,
                                                 chunk=ck, n_batches=2)
        _chk("jerk-bat", float(jnp.max(jnp.linalg.norm(j - rj, axis=1)))
             / jsc, TOL)
    if on("chunkedx"):
        a = pg.accel_sym_x_chunked(pos_s, mass_s, 0.05, chunk=ck)
        _chk("accel-x", float(jnp.max(jnp.linalg.norm(a - ra, axis=1)))
             / asc, XTOL)
        a, p = pg.accel_potential_sym_x_chunked(pos_s, mass_s, 0.05,
                                                chunk=ck)
        _chk("phi-x", float(jnp.max(jnp.abs(p + sphi - rp))) / psc, XTOL)
        a, j = pg.accel_jerk_sym_x_chunked(pos_s, vel_s, mass_s, 0.05,
                                           chunk=ck)
        _chk("jerk-x", float(jnp.max(jnp.linalg.norm(j - rj, axis=1)))
             / jsc, XTOL)
    if on("batchedx"):
        a = pg.accel_sym_x_chunked_batched(pos_s, mass_s, 0.05, chunk=ck,
                                           n_batches=2)
        _chk("accel-x-bat", float(jnp.max(jnp.linalg.norm(a - ra, axis=1)))
             / asc, XTOL)
        a, p = pg.accel_potential_sym_x_chunked_batched(
            pos_s, mass_s, 0.05, chunk=ck, n_batches=2)
        _chk("phi-x-bat", float(jnp.max(jnp.abs(p + sphi - rp))) / psc,
             XTOL)
        a, j = pg.accel_jerk_sym_x_chunked_batched(
            pos_s, vel_s, mass_s, 0.05, chunk=ck, n_batches=2)
        _chk("jerk-x-bat", float(jnp.max(jnp.linalg.norm(j - rj, axis=1)))
             / jsc, XTOL)

    if on("cross"):
        # halfring cross-pair wrappers (parallel/force.py mode="halfring"):
        # two disjoint sets; jnp twins are the oracle. Sizes straddle a
        # tile boundary so the zero-mass common-size padding executes.
        # distinct keys per operand: identical vA/vB (or mA/mB) would let an
        # A/B operand swap in the kernels validate as correct
        kpa, kpb, kva, kvb, kma, kmb = jax.random.split(
            jax.random.PRNGKey(33), 6)
        nA, nB = 2048, 2048
        pA = jax.random.normal(kpa, (nA, 3), jnp.float64)
        pB = jax.random.normal(kpb, (nB, 3), jnp.float64) + 0.5
        vA = 0.3 * jax.random.normal(kva, (nA, 3), jnp.float64)
        vB = 0.3 * jax.random.normal(kvb, (nB, 3), jnp.float64)
        mA = jax.random.uniform(kma, (nA,), jnp.float64, 0.5, 1.5) / nA
        mB = jax.random.uniform(kmb, (nB,), jnp.float64, 0.5, 1.5) / nB
        pA32, pB32 = pA.astype(jnp.float32), pB.astype(jnp.float32)
        mA32, mB32 = mA.astype(jnp.float32), mB.astype(jnp.float32)

        raA, raB = gravity.accel_cross_pair(pA32, pB32, mA32, mB32, 0.05)
        oaA, oaB = pg.accel_cross_pair(pA32, pB32, mA32, mB32, 0.05)
        csc = float(jnp.max(jnp.linalg.norm(raA, axis=1)))
        _chk("cross-accel",
             max(float(jnp.max(jnp.abs(oaA - raA))),
                 float(jnp.max(jnp.abs(oaB - raB)))) / csc, TOL)
        r = gravity.accel_potential_cross_pair(pA32, pB32, mA32, mB32, 0.05)
        o = pg.accel_potential_cross_pair(pA32, pB32, mA32, mB32, 0.05)
        _chk("cross-phi",
             max(float(jnp.max(jnp.abs(jnp.asarray(x) - jnp.asarray(y))))
                 for x, y in zip(r, o)) / min(csc, float(jnp.max(jnp.abs(r[1])))),
             TOL)
        r = gravity.accel_jerk_cross_pair(pA32, vA.astype(jnp.float32),
                                          pB32, vB.astype(jnp.float32),
                                          mA32, mB32, 0.05)
        o = pg.accel_jerk_cross_pair(pA32, vA.astype(jnp.float32),
                                     pB32, vB.astype(jnp.float32),
                                     mA32, mB32, 0.05)
        _chk("cross-jerk",
             max(float(jnp.max(jnp.abs(jnp.asarray(x) - jnp.asarray(y))))
                 for x, y in zip(r, o))
             / float(jnp.max(jnp.linalg.norm(r[1], axis=1))), TOL)

        # extended cross-pair (df32 twins are the oracle)
        from oc_nbody_tpu.ops import df32
        def _split(a):
            hi = a.astype(jnp.float32)
            return hi, (a - hi.astype(a.dtype)).astype(jnp.float32)
        rAh, rAl = _split(pA)
        rBh, rBl = _split(pB)
        vAh, vAl = _split(vA)
        vBh, vBl = _split(vB)
        r = df32.accel_cross_pair_x_hilo(rAh, rAl, rBh, rBl, mA32, mB32,
                                         0.05, chunk=256)
        o = pg.accel_cross_pair_x_hilo(rAh, rAl, rBh, rBl, mA32, mB32, 0.05)
        _chk("cross-accel-x",
             max(float(jnp.max(jnp.abs(jnp.asarray(x) - jnp.asarray(y))))
                 for x, y in zip(r, o)) / csc, XTOL)
        r = df32.accel_jerk_cross_pair_x_hilo(
            rAh, rAl, vAh, vAl, rBh, rBl, vBh, vBl, mA32, mB32, 0.05,
            chunk=256)
        o = pg.accel_jerk_cross_pair_x_hilo(
            rAh, rAl, vAh, vAl, rBh, rBl, vBh, vBl, mA32, mB32, 0.05)
        _chk("cross-jerk-x",
             max(float(jnp.max(jnp.abs(jnp.asarray(x) - jnp.asarray(y))))
                 for x, y in zip(r, o))
             / float(jnp.max(jnp.linalg.norm(r[1], axis=1))), XTOL)
        r = df32.accel_potential_cross_pair_x_hilo(
            rAh, rAl, rBh, rBl, mA32, mB32, 0.05, chunk=256)
        o = pg.accel_potential_cross_pair_x_hilo(
            rAh, rAl, rBh, rBl, mA32, mB32, 0.05)
        _chk("cross-phi-x",
             max(float(jnp.max(jnp.abs(jnp.asarray(x) - jnp.asarray(y))))
                 for x, y in zip(r, o))
             / float(jnp.max(jnp.abs(r[1]))), XTOL)

    if failures:
        print("FAILURES:", failures)
        return 1
    print("all pallas kernels match the f64 oracle within", TOL)
    return 0


if __name__ == "__main__":
    sys.exit(main())
