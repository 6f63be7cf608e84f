"""Pallas kernels vs the f64 oracle, on CPU via the Pallas interpreter
(SURVEY.md §4.1 'Pallas output ≡ pure-jnp oracle'). Real-hardware
validation additionally runs in bench/validate_pallas.py."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import oc_nbody_tpu.ops.pallas_gravity as pg
from oc_nbody_tpu.ops import gravity


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    # the env switch is read at CALL time by the shared _call in
    # ops/pallas_pair.py — one knob covers pallas_gravity's own kernels
    # AND the generated pair-spec families (patching pg._call stopped
    # reaching the latter when the factored core moved modules)
    monkeypatch.setenv("OCN_PALLAS_INTERPRET", "1")
    # jitted wrappers cache the traced _call: clear between modes
    jitted = (pg.accel_rows, pg.accel_potential_rows, pg.accel_jerk_rows,
              pg.accel_rows_streamed, pg.accel_potential_rows_streamed,
              pg.accel_jerk_rows_streamed,
              pg.accel_rows_t, pg.accel_potential_rows_t,
              pg.accel_jerk_rows_t,
              pg.accel, pg.accel_potential, pg.accel_jerk)
    for fn in jitted:
        fn.clear_cache()
    yield
    for fn in jitted:
        fn.clear_cache()


def _cluster(n=300):
    key = jax.random.PRNGKey(5)
    kp, kv = jax.random.split(key)
    pos = jax.random.normal(kp, (n, 3), jnp.float64)
    vel = 0.3 * jax.random.normal(kv, (n, 3), jnp.float64)
    mass = jnp.ones(n) / n
    return pos, vel, mass


def test_accel_matches_oracle():
    pos, _, mass = _cluster()
    out = pg.accel(pos, mass, eps=0.05)
    ref = gravity.accel_direct(pos, mass, eps=0.05)
    scale = float(jnp.max(jnp.linalg.norm(ref, axis=1)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-6 * scale)


def test_accel_potential_matches_oracle():
    pos, _, mass = _cluster(257)  # deliberately unaligned
    acc, phi = pg.accel_potential(pos, mass, eps=0.05, G=1.3)
    acc_ref, phi_ref = gravity.accel_potential_direct(pos, mass, eps=0.05, G=1.3)
    np.testing.assert_allclose(np.asarray(phi), np.asarray(phi_ref), rtol=3e-5)


def test_accel_jerk_matches_oracle():
    pos, vel, mass = _cluster(200)
    acc, jerk = pg.accel_jerk(pos, vel, mass, eps=0.05)
    acc_ref, jerk_ref = gravity.accel_jerk_direct(pos, vel, mass, eps=0.05)
    jscale = float(jnp.max(jnp.linalg.norm(jerk_ref, axis=1)))
    np.testing.assert_allclose(np.asarray(jerk), np.asarray(jerk_ref),
                               atol=5e-6 * jscale)


def test_transposed_kernels_match_oracle():
    """The (3,N) transposed monolithic kernels (accel / phi / jerk),
    called directly — the size-thresholded dispatch picks the grid
    kernels at these tiny test sizes, so coverage must be explicit.
    Rows ≠ sources and non-tile-multiple sizes exercise the paddings."""
    pos, vel, mass = _cluster(313)
    rows, vrows = pos[:77], vel[:77]
    f32 = lambda a: a.astype(jnp.float32)
    eps = jnp.float32(0.05)

    out = pg.accel_rows_t(f32(rows), f32(pos), f32(mass), eps)
    ref = gravity.accel_rows(rows, pos, mass, eps=0.05)
    scale = float(jnp.max(jnp.linalg.norm(ref, axis=1)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-6 * scale)

    acc, phi = pg.accel_potential_rows_t(f32(rows), f32(pos), f32(mass),
                                         eps, jnp.float32(1.3))
    acc_ref, phi_ref = gravity.accel_potential_rows(rows, pos, mass,
                                                    eps=0.05, G=1.3)
    np.testing.assert_allclose(np.asarray(phi), np.asarray(phi_ref),
                               rtol=3e-5)

    acc, jerk = pg.accel_jerk_rows_t(f32(rows), f32(vrows), f32(pos),
                                     f32(vel), f32(mass), eps)
    acc_ref, jerk_ref = gravity.accel_jerk_rows(rows, vrows, pos, vel,
                                                mass, eps=0.05)
    jscale = float(jnp.max(jnp.linalg.norm(jerk_ref, axis=1)))
    np.testing.assert_allclose(np.asarray(jerk), np.asarray(jerk_ref),
                               atol=5e-6 * jscale)


def test_rt_dispatch_threshold(monkeypatch):
    """accel_rows routes to the transposed kernel at/above RT_MIN_ACCEL
    sources (and stays on the grid kernel below)."""
    pos, _, mass = _cluster(280)
    monkeypatch.setattr(pg, "RT_MIN_ACCEL", 64)
    pg.accel_rows.clear_cache()
    out = pg.accel_rows(pos.astype(jnp.float32), pos.astype(jnp.float32),
                        mass.astype(jnp.float32), jnp.float32(0.05))
    ref = gravity.accel_direct(pos, mass, eps=0.05)
    scale = float(jnp.max(jnp.linalg.norm(ref, axis=1)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-6 * scale)
    pg.accel_rows.clear_cache()


def test_streamed_accel_matches_resident():
    """HBM-streaming kernel ≡ VMEM-resident kernel ≡ oracle (rows ≠ a tile
    multiple, sources ≠ a tile multiple: exercises both paddings)."""
    pos, _, mass = _cluster(517)
    eps = 0.05
    out_s = pg.accel_rows_streamed(pos.astype(jnp.float32),
                                   pos.astype(jnp.float32),
                                   mass.astype(jnp.float32),
                                   jnp.float32(eps))
    ref = gravity.accel_direct(pos, mass, eps=eps)
    scale = float(jnp.max(jnp.linalg.norm(ref, axis=1)))
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(ref),
                               atol=5e-6 * scale)


def test_streamed_potential_matches_oracle():
    pos, _, mass = _cluster(300)
    acc, phi = pg.accel_potential_rows_streamed(
        pos.astype(jnp.float32), pos.astype(jnp.float32),
        mass.astype(jnp.float32), jnp.float32(0.05), jnp.float32(1.3))
    acc_ref, phi_ref = gravity.accel_potential_direct(pos, mass, eps=0.05,
                                                      G=1.3)
    # streamed phi excludes the self term (same contract as the resident
    # rows kernel); add it back for the comparison
    phi_full = phi + gravity.self_phi(mass.astype(jnp.float32),
                                      jnp.float32(0.05), jnp.float32(1.3))
    np.testing.assert_allclose(np.asarray(phi_full), np.asarray(phi_ref),
                               rtol=3e-5)


def test_streamed_jerk_matches_oracle():
    pos, vel, mass = _cluster(260)
    acc, jerk = pg.accel_jerk_rows_streamed(
        pos.astype(jnp.float32), vel.astype(jnp.float32),
        pos.astype(jnp.float32), vel.astype(jnp.float32),
        mass.astype(jnp.float32), jnp.float32(0.05))
    acc_ref, jerk_ref = gravity.accel_jerk_direct(pos, vel, mass, eps=0.05)
    ascale = float(jnp.max(jnp.linalg.norm(acc_ref, axis=1)))
    jscale = float(jnp.max(jnp.linalg.norm(jerk_ref, axis=1)))
    np.testing.assert_allclose(np.asarray(acc), np.asarray(acc_ref),
                               atol=5e-6 * ascale)
    np.testing.assert_allclose(np.asarray(jerk), np.asarray(jerk_ref),
                               atol=5e-6 * jscale)


def test_stream_dispatch_threshold(monkeypatch):
    """accel_rows transparently dispatches to the streaming kernel past
    STREAM_N sources (static-shape decision)."""
    pos, _, mass = _cluster(280)
    monkeypatch.setattr(pg, "STREAM_N", 128)
    pg.accel_rows.clear_cache()
    out = pg.accel_rows(pos.astype(jnp.float32), pos.astype(jnp.float32),
                        mass.astype(jnp.float32), jnp.float32(0.05))
    ref = gravity.accel_direct(pos, mass, eps=0.05)
    scale = float(jnp.max(jnp.linalg.norm(ref, axis=1)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-6 * scale)
    pg.accel_rows.clear_cache()


def test_compensated_accumulation_beats_plain(monkeypatch):
    """Kahan two-sum across source tiles (default for the streamed kernels)
    must track the f64 oracle strictly better than plain f32 accumulation in
    the many-tile regime it exists for. Shrink the tiles so 300 sources span
    many j-tiles without a big interpret-mode matrix."""
    monkeypatch.setattr(pg, "TI_A", 8)
    monkeypatch.setattr(pg, "TJ_A", 128)
    pg.accel_rows_streamed.clear_cache()
    key = jax.random.PRNGKey(11)
    kp, km = jax.random.split(key)
    n_src = 16384  # 128 tiles at TJ_A=128
    pos = jax.random.normal(kp, (n_src, 3), jnp.float64)
    mass = jax.random.uniform(km, (n_src,), jnp.float64, 0.5, 1.5) / n_src
    rows = pos[:8]
    ref = gravity.accel_rows(rows, pos, mass, 0.05, 1.0, 1024)
    p32 = pos.astype(jnp.float32)
    m32 = mass.astype(jnp.float32)
    r32 = rows.astype(jnp.float32)
    errs = {}
    for comp in (False, True):
        out = pg.accel_rows_streamed(r32, p32, m32, jnp.float32(0.05),
                                     compensated=comp)
        errs[comp] = float(jnp.max(jnp.abs(out - ref)))
    pg.accel_rows_streamed.clear_cache()
    scale = float(jnp.max(jnp.abs(ref)))
    assert errs[True] < errs[False], errs          # strictly more accurate
    assert errs[True] <= 3e-7 * scale, errs        # near f32 rounding floor


def test_resident_compensated_matches_oracle():
    """compensated=True on the VMEM-resident kernels (OCN_PALLAS_COMPENSATED
    =all) stays oracle-correct."""
    pos, vel, mass = _cluster(300)
    out = pg.accel_rows(pos.astype(jnp.float32), pos.astype(jnp.float32),
                        mass.astype(jnp.float32), jnp.float32(0.05),
                        compensated=True)
    ref = gravity.accel_direct(pos, mass, eps=0.05)
    scale = float(jnp.max(jnp.linalg.norm(ref, axis=1)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-6 * scale)
    acc, jerk = pg.accel_jerk_rows(
        pos.astype(jnp.float32), vel.astype(jnp.float32),
        pos.astype(jnp.float32), vel.astype(jnp.float32),
        mass.astype(jnp.float32), jnp.float32(0.05), compensated=True)
    _, jerk_ref = gravity.accel_jerk_direct(pos, vel, mass, eps=0.05)
    jscale = float(jnp.max(jnp.linalg.norm(jerk_ref, axis=1)))
    np.testing.assert_allclose(np.asarray(jerk), np.asarray(jerk_ref),
                               atol=5e-6 * jscale)
    acc2, phi = pg.accel_potential_rows(
        pos.astype(jnp.float32), pos.astype(jnp.float32),
        mass.astype(jnp.float32), jnp.float32(0.05), compensated=True)
    _, phi_ref = gravity.accel_potential_direct(pos, mass, eps=0.05)
    phi_full = phi + gravity.self_phi(mass.astype(jnp.float32),
                                      jnp.float32(0.05), jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(phi_full), np.asarray(phi_ref),
                               rtol=3e-5)


def test_unguarded_matches_guarded():
    pos, _, mass = _cluster(128)
    out_g = pg.accel(pos, mass, eps=0.05, guarded=True)
    out_u = pg.accel(pos, mass, eps=0.05, guarded=False)
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(out_u),
                               rtol=0, atol=1e-7)


def test_pair_symmetric_jerk_matches_oracle(monkeypatch):
    """W3 prototype: the Newton's-3rd-law kernel computes each tile pair
    once and accumulates both directions — must match the one-sided
    oracle to f32 tolerance (summation order differs by construction),
    for both guard modes and with padding (n not a tile multiple)."""
    monkeypatch.setattr(pg, "T_SYM", 64)
    pg.accel_jerk_sym.clear_cache()
    key = jax.random.PRNGKey(3)
    kp, kv, km = jax.random.split(key, 3)
    n = 300   # 5 tiles of 64 with padding
    pos = jax.random.normal(kp, (n, 3), jnp.float64)
    vel = 0.3 * jax.random.normal(kv, (n, 3), jnp.float64)
    mass = jax.random.uniform(km, (n,), jnp.float64, 0.5, 1.5) / n
    for eps, guarded in ((0.05, False), (0.05, True), (0.0, True)):
        a, j = pg.accel_jerk_sym(pos, vel, mass, eps, 1.0, guarded=guarded)
        ra, rj = gravity.accel_jerk(pos, vel, mass, eps, 1.0)
        sa = float(jnp.max(jnp.abs(ra)))
        sj = float(jnp.max(jnp.abs(rj)))
        assert float(jnp.max(jnp.abs(a - ra))) < 1e-6 * sa
        assert float(jnp.max(jnp.abs(j - rj))) < 1e-6 * sj
    pg.accel_jerk_sym.clear_cache()


def test_pair_symmetric_accel_matches_oracle(monkeypatch):
    """Round-3: the pair-symmetric ACCEL kernel (now the self-interaction
    default at production sizes) matches the one-sided oracle to f32
    tolerance, both guard modes, padded N."""
    monkeypatch.setattr(pg, "T_SYMA", 64)
    pg.accel_sym.clear_cache()
    key = jax.random.PRNGKey(5)
    kp, km = jax.random.split(key)
    n = 300
    pos = jax.random.normal(kp, (n, 3), jnp.float64)
    mass = jax.random.uniform(km, (n,), jnp.float64, 0.5, 1.5) / n
    for eps, guarded in ((0.05, False), (0.0, True)):
        a = pg.accel_sym(pos, mass, eps, 1.0, guarded=guarded)
        ra = gravity.accel(pos, mass, eps)
        assert float(jnp.max(jnp.abs(a - ra))) < 1e-6 * float(
            jnp.max(jnp.abs(ra)))
    pg.accel_sym.clear_cache()


def test_chunked_sym_accel_matches_oracle(monkeypatch):
    """Chunked pair-symmetric accel (self-interaction past STREAM_N):
    diagonal chunks through the resident sym kernel, off-diagonal chunk
    pairs through the cross-sym kernel, scan-accumulated. Oracle
    equivalence at an n that is NOT a chunk multiple (pad chunk), both
    guard modes."""
    monkeypatch.setattr(pg, "T_SYMA", 64)
    pg.accel_sym_chunked.clear_cache()
    key = jax.random.PRNGKey(13)
    kp, km = jax.random.split(key)
    n = 300  # chunk=128 -> C=3, last chunk 44 real rows
    pos = jax.random.normal(kp, (n, 3), jnp.float64)
    mass = jax.random.uniform(km, (n,), jnp.float64, 0.5, 1.5) / n
    for eps, guarded in ((0.05, False), (0.0, True)):
        a = pg.accel_sym_chunked(pos, mass, eps, 1.0, guarded=guarded,
                                 chunk=128)
        ra = gravity.accel(pos, mass, eps)
        assert float(jnp.max(jnp.abs(a - ra))) < 1e-6 * float(
            jnp.max(jnp.abs(ra)))
    # single-chunk degenerate case (C == 1, no scan) stays correct
    a1 = pg.accel_sym_chunked(pos, mass, 0.05, 1.0, guarded=False, chunk=512)
    ra = gravity.accel(pos, mass, 0.05)
    assert float(jnp.max(jnp.abs(a1 - ra))) < 1e-6 * float(
        jnp.max(jnp.abs(ra)))
    pg.accel_sym_chunked.clear_cache()


def test_chunked_sym_batched_matches_oracle(monkeypatch):
    """Multi-dispatch batched chunked-sym accel (oversized-eval path):
    the padded cross-pair list split over separate dispatches, diag in
    batch 0, host-summed partials ≡ the in-jit chunked kernel to f32
    order. Covers sentinel padding (3 pairs over 2 batches) and the
    degenerate single-chunk case."""
    monkeypatch.setattr(pg, "T_SYMA", 64)
    pg.accel_sym_chunked.clear_cache()
    pg._chunked_batch.clear_cache()
    key = jax.random.PRNGKey(31)
    kp, km = jax.random.split(key)
    n = 300  # chunk=128 -> C=3, pairs=3 -> batches of 2 with 1 sentinel
    pos = jax.random.normal(kp, (n, 3), jnp.float64)
    mass = jax.random.uniform(km, (n,), jnp.float64, 0.5, 1.5) / n
    ra = gravity.accel(pos, mass, 0.05)
    scale = float(jnp.max(jnp.abs(ra)))
    for nb in (1, 2, 3):
        a = pg.accel_sym_chunked_batched(pos, mass, 0.05, 1.0,
                                         guarded=False, chunk=128,
                                         n_batches=nb)
        assert float(jnp.max(jnp.abs(a - ra))) < 5e-6 * scale
    a1 = pg.accel_sym_chunked_batched(pos, mass, 0.05, 1.0, guarded=False,
                                      chunk=512, n_batches=4)  # C == 1
    assert float(jnp.max(jnp.abs(a1 - ra))) < 5e-6 * scale
    pg.accel_sym_chunked.clear_cache()
    pg._chunked_batch.clear_cache()


def test_chunked_sym_phi_batched_matches_oracle(monkeypatch):
    """Batched chunked-sym accel+phi (oversized diagnostics evals):
    host-summed partials ≡ oracle, incl. the self-term/self_phi
    contract and sentinel padding."""
    monkeypatch.setattr(pg, "T_SYMP", 64)
    pg._chunked_phi_batch.clear_cache()
    key = jax.random.PRNGKey(37)
    kp, km = jax.random.split(key)
    n = 300
    pos = jax.random.normal(kp, (n, 3), jnp.float64)
    mass = jax.random.uniform(km, (n,), jnp.float64, 0.5, 1.5) / n
    ra, rp = gravity.accel_potential_direct(pos, mass, 0.05)
    ascale = float(jnp.max(jnp.abs(ra)))
    pscale = float(jnp.max(jnp.abs(rp)))
    for nb in (1, 2):
        a, p = pg.accel_potential_sym_chunked_batched(
            pos, mass, 0.05, 1.0, guarded=False, chunk=128, n_batches=nb)
        assert float(jnp.max(jnp.abs(a - ra))) < 5e-6 * ascale
        assert float(jnp.max(jnp.abs(p - rp))) < 5e-6 * pscale
    pg._chunked_phi_batch.clear_cache()


def test_dispatch_all_wrappers_chunk_past_stream_n(monkeypatch):
    """accel_potential, accel_jerk, accel_x, accel_potential_x and
    accel_jerk_x all route self-interaction past STREAM_N to their
    chunked pair-symmetric kernels (accel is covered by
    test_accel_dispatch_chunked_sym_past_stream_n)."""
    for tname in ("T_SYMA", "T_SYMP", "T_SYM", "T_SYMX", "T_SYMXP",
                  "T_SYMXJ"):
        monkeypatch.setattr(pg, tname, 64)
    monkeypatch.setattr(pg, "SYM_MIN", 64)
    monkeypatch.setattr(pg, "RT_MIN_JERK", 64)
    monkeypatch.setattr(pg, "STREAM_N", 128)
    for cname in ("CHUNK_SYM", "CHUNK_SYMX", "CHUNK_SYMJ", "CHUNK_SYMXJ"):
        monkeypatch.setattr(pg, cname, 128)
    calls = []
    for fname in ("accel_potential_sym_chunked", "accel_jerk_sym_chunked",
                  "accel_sym_x_chunked", "accel_potential_sym_x_chunked",
                  "accel_jerk_sym_x_chunked"):
        orig = getattr(pg, fname)

        def spy(*a, _orig=orig, _f=fname, **kw):
            calls.append(_f)
            return _orig(*a, **kw)

        monkeypatch.setattr(pg, fname, spy)
    wrappers = (pg.accel_potential, pg.accel_jerk, pg.accel_x,
                pg.accel_potential_x)
    for w in wrappers:
        w.clear_cache()
    pos, vel, mass = _cluster(300)
    pg.accel_potential(pos, mass, eps=0.05)
    pg.accel_jerk(pos, vel, mass, eps=0.05)
    pg.accel_x(pos, mass, eps=0.05)
    pg.accel_potential_x(pos, mass, eps=0.05)
    pg.accel_jerk_x(pos, vel, mass, eps=0.05)
    assert calls == ["accel_potential_sym_chunked",
                     "accel_jerk_sym_chunked", "accel_sym_x_chunked",
                     "accel_potential_sym_x_chunked",
                     "accel_jerk_sym_x_chunked"]
    for w in wrappers:
        w.clear_cache()


def test_chunked_sym_accel_potential_matches_oracle(monkeypatch):
    """Chunked pair-symmetric accel+phi (diagnostics pass past STREAM_N):
    oracle equivalence at a non-chunk-multiple n, both guard modes; phi
    follows the self-term/self_phi contract (self term only from the
    diagonal chunks)."""
    monkeypatch.setattr(pg, "T_SYMP", 64)
    pg.accel_potential_sym_chunked.clear_cache()
    key = jax.random.PRNGKey(17)
    kp, km = jax.random.split(key)
    n = 300  # chunk=128 -> C=3, last chunk 44 real rows
    pos = jax.random.normal(kp, (n, 3), jnp.float64)
    mass = jax.random.uniform(km, (n,), jnp.float64, 0.5, 1.5) / n
    for eps, guarded in ((0.05, False), (0.0, True)):
        a, phi = pg.accel_potential_sym_chunked(pos, mass, eps, 1.0,
                                                guarded=guarded, chunk=128)
        ra, rphi = gravity.accel_potential_direct(pos, mass, eps)
        assert float(jnp.max(jnp.abs(a - ra))) < 5e-6 * float(
            jnp.max(jnp.abs(ra)))
        assert float(jnp.max(jnp.abs(phi - rphi))) < 5e-6 * float(
            jnp.max(jnp.abs(rphi)))
    pg.accel_potential_sym_chunked.clear_cache()


def test_accel_dispatch_chunked_sym_past_stream_n(monkeypatch):
    """The self-interaction accel wrapper routes sources past STREAM_N to
    the chunked pair-symmetric kernel (one unique pair evaluation each)
    instead of the one-sided streamed sweep, and stays oracle-correct."""
    monkeypatch.setattr(pg, "T_SYMA", 64)
    monkeypatch.setattr(pg, "SYM_MIN", 64)
    monkeypatch.setattr(pg, "STREAM_N", 128)
    monkeypatch.setattr(pg, "CHUNK_SYM", 128)
    calls = []
    orig = pg.accel_sym_chunked

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(pg, "accel_sym_chunked", spy)
    pg.accel.clear_cache()
    pos, _, mass = _cluster(300)
    out = pg.accel(pos, mass, eps=0.05)
    ref = gravity.accel_direct(pos, mass, eps=0.05)
    scale = float(jnp.max(jnp.linalg.norm(ref, axis=1)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-6 * scale)
    assert calls, "accel() did not dispatch to accel_sym_chunked"
    pg.accel.clear_cache()
    orig.clear_cache()


def test_pair_symmetric_accel_potential_matches_oracle(monkeypatch):
    """Sym accel+phi (diagnostics pass): oracle equivalence, both guard
    modes, padded N; phi follows the self-term/self_phi contract."""
    monkeypatch.setattr(pg, "T_SYMP", 64)
    pg.accel_potential_sym.clear_cache()
    key = jax.random.PRNGKey(7)
    kp, km = jax.random.split(key)
    n = 300
    pos = jax.random.normal(kp, (n, 3), jnp.float64)
    mass = jax.random.uniform(km, (n,), jnp.float64, 0.5, 1.5) / n
    for eps, guarded in ((0.05, False), (0.0, True)):
        a, p = pg.accel_potential_sym(pos, mass, eps, 1.0, guarded=guarded)
        ra, rp = gravity.accel_potential(pos, mass, eps)
        assert float(jnp.max(jnp.abs(a - ra))) < 1e-6 * float(
            jnp.max(jnp.abs(ra)))
        assert float(jnp.max(jnp.abs(p - rp))) < 1e-6 * float(
            jnp.max(jnp.abs(rp)))
    pg.accel_potential_sym.clear_cache()


def test_pair_symmetric_extended_accel_matches_oracle(monkeypatch):
    """Extended-tier sym accel (resident production default for
    precision='extended'): matches the df32 extended oracle."""
    from oc_nbody_tpu.ops import df32
    monkeypatch.setattr(pg, "T_SYMX", 64)
    pg.accel_sym_x.clear_cache()
    key = jax.random.PRNGKey(11)
    kp, km = jax.random.split(key)
    n = 300
    pos = jax.random.normal(kp, (n, 3), jnp.float64)
    mass = jax.random.uniform(km, (n,), jnp.float64, 0.5, 1.5) / n
    a = pg.accel_sym_x(pos, mass, 0.05, 1.0)
    ref = df32.accel_extended(pos, mass, eps=0.05, chunk=64)
    # interpret mode degrades the in-kernel EFTs (XLA simplifier) — the
    # hardware bound is asserted by bench/validate_pallas.py
    assert float(jnp.max(jnp.abs(a - ref))) < 2e-6 * float(
        jnp.max(jnp.abs(ref)))
    pg.accel_sym_x.clear_cache()


def test_chunked_sym_jerk_matches_oracle(monkeypatch):
    """Chunked pair-symmetric accel+jerk (shared-Hermite past STREAM_N):
    oracle equivalence at a non-chunk-multiple n, both guard modes."""
    monkeypatch.setattr(pg, "T_SYM", 64)
    pg.accel_jerk_sym_chunked.clear_cache()
    key = jax.random.PRNGKey(23)
    kp, kv, km = jax.random.split(key, 3)
    n = 300  # chunk=128 -> C=3, last chunk 44 real rows
    pos = jax.random.normal(kp, (n, 3), jnp.float64)
    vel = 0.3 * jax.random.normal(kv, (n, 3), jnp.float64)
    mass = jax.random.uniform(km, (n,), jnp.float64, 0.5, 1.5) / n
    ra, rj = gravity.accel_jerk_direct(pos, vel, mass, eps=0.05)
    ascale = float(jnp.max(jnp.abs(ra)))
    jscale = float(jnp.max(jnp.abs(rj)))
    for guarded, chunk in ((False, 128), (True, 128), (False, 512)):
        a, j = pg.accel_jerk_sym_chunked(pos, vel, mass, 0.05, 1.0,
                                         guarded=guarded, chunk=chunk)
        assert float(jnp.max(jnp.abs(a - ra))) < 5e-6 * ascale
        assert float(jnp.max(jnp.abs(j - rj))) < 5e-6 * jscale
    pg.accel_jerk_sym_chunked.clear_cache()


def test_chunked_sym_extended_accel_matches_oracle(monkeypatch):
    """Extended-tier chunked pair-symmetric accel (precision='extended'
    past STREAM_N): diag chunks via the resident sym-x kernel, cross
    chunk pairs via the cross-sym-x kernel, one global hi/lo frame.
    Matches the df32 extended oracle at a non-chunk-multiple n."""
    from oc_nbody_tpu.ops import df32
    monkeypatch.setattr(pg, "T_SYMX", 64)
    pg.accel_sym_x_chunked.clear_cache()
    key = jax.random.PRNGKey(19)
    kp, km = jax.random.split(key)
    n = 300  # chunk=128 -> C=3, last chunk 44 real rows
    pos = jax.random.normal(kp, (n, 3), jnp.float64)
    mass = jax.random.uniform(km, (n,), jnp.float64, 0.5, 1.5) / n
    ref = df32.accel_extended(pos, mass, eps=0.05, chunk=64)
    for chunk in (128, 512):  # multi-chunk and single-chunk (C == 1)
        a = pg.accel_sym_x_chunked(pos, mass, 0.05, 1.0, chunk=chunk)
        # interpret mode degrades the in-kernel EFTs (XLA simplifier) —
        # the hardware bound is asserted by bench/validate_pallas.py
        assert float(jnp.max(jnp.abs(a - ref))) < 2e-6 * float(
            jnp.max(jnp.abs(ref)))
    pg.accel_sym_x_chunked.clear_cache()


def test_pair_symmetric_extended_jerk_matches_oracle(monkeypatch):
    """Extended-tier sym accel+jerk (resident default for the extended
    Hermite shared-step evaluation): matches the df32 extended oracle."""
    from oc_nbody_tpu.ops import df32
    monkeypatch.setattr(pg, "T_SYMXJ", 64)
    pg.accel_jerk_sym_x.clear_cache()
    key = jax.random.PRNGKey(13)
    kp, kv, km = jax.random.split(key, 3)
    n = 300
    pos = jax.random.normal(kp, (n, 3), jnp.float64)
    vel = 0.3 * jax.random.normal(kv, (n, 3), jnp.float64)
    mass = jax.random.uniform(km, (n,), jnp.float64, 0.5, 1.5) / n
    a, j = pg.accel_jerk_sym_x(pos, vel, mass, 0.05, 1.0)
    ra, rj = df32.accel_jerk_extended(pos, vel, mass, eps=0.05, chunk=64)
    assert float(jnp.max(jnp.abs(a - ra))) < 2e-6 * float(
        jnp.max(jnp.abs(ra)))
    assert float(jnp.max(jnp.abs(j - rj))) < 2e-6 * float(
        jnp.max(jnp.abs(rj)))
    pg.accel_jerk_sym_x.clear_cache()


def _extended_cluster(n=300, seed=29, vel_scale=0.3):
    key = jax.random.PRNGKey(seed)
    kp, kv, km = jax.random.split(key, 3)
    pos = jax.random.normal(kp, (n, 3), jnp.float64)
    vel = vel_scale * jax.random.normal(kv, (n, 3), jnp.float64)
    mass = jax.random.uniform(km, (n,), jnp.float64, 0.5, 1.5) / n
    return pos, vel, mass


def test_pair_symmetric_extended_phi_matches_oracle(monkeypatch):
    """Extended-tier sym accel+phi (resident diagnostics pass for
    precision='extended'): RAW phi contract — adding self_phi lands on
    the finished oracle phi."""
    monkeypatch.setattr(pg, "T_SYMXP", 64)
    pg.accel_potential_sym_x.clear_cache()
    pos, _, mass = _extended_cluster()
    for eps in (0.05, 0.0):
        a, p = pg.accel_potential_sym_x(pos, mass, eps, 1.3)
        p = p + gravity.self_phi(mass, eps, 1.3)
        ra, rp = gravity.accel_potential_direct(pos, mass, eps, 1.3)
        assert float(jnp.max(jnp.abs(a - ra))) < 2e-6 * float(
            jnp.max(jnp.abs(ra)))
        assert float(jnp.max(jnp.abs(p - rp))) < 2e-6 * float(
            jnp.max(jnp.abs(rp)))
    pg.accel_potential_sym_x.clear_cache()


def test_chunked_sym_extended_phi_matches_oracle(monkeypatch):
    """Extended-tier chunked sym accel+phi (the extended diagnostics pass
    past STREAM_N): multi-chunk and degenerate single-chunk, RAW phi
    contract, non-chunk-multiple n."""
    monkeypatch.setattr(pg, "T_SYMXP", 64)
    pg.accel_potential_sym_x_chunked.clear_cache()
    pos, _, mass = _extended_cluster()
    ra, rp = gravity.accel_potential_direct(pos, mass, 0.05)
    ascale = float(jnp.max(jnp.abs(ra)))
    pscale = float(jnp.max(jnp.abs(rp)))
    for chunk in (128, 512):
        a, p = pg.accel_potential_sym_x_chunked(pos, mass, 0.05, 1.0,
                                                chunk=chunk)
        p = p + gravity.self_phi(mass, 0.05, 1.0)
        assert float(jnp.max(jnp.abs(a - ra))) < 5e-6 * ascale
        assert float(jnp.max(jnp.abs(p - rp))) < 5e-6 * pscale
    pg.accel_potential_sym_x_chunked.clear_cache()


def test_chunked_sym_extended_jerk_matches_oracle(monkeypatch):
    """Extended-tier chunked sym accel+jerk (extended Hermite shared-step
    past STREAM_N): one global hi/lo frame for positions AND velocities,
    multi-chunk and single-chunk."""
    from oc_nbody_tpu.ops import df32
    monkeypatch.setattr(pg, "T_SYMXJ", 64)
    pg.accel_jerk_sym_x_chunked.clear_cache()
    pos, vel, mass = _extended_cluster()
    ra, rj = df32.accel_jerk_extended(pos, vel, mass, eps=0.05, chunk=64)
    ascale = float(jnp.max(jnp.abs(ra)))
    jscale = float(jnp.max(jnp.abs(rj)))
    for chunk in (128, 512):
        a, j = pg.accel_jerk_sym_x_chunked(pos, vel, mass, 0.05, 1.0,
                                           chunk=chunk)
        assert float(jnp.max(jnp.abs(a - ra))) < 5e-6 * ascale
        assert float(jnp.max(jnp.abs(j - rj))) < 5e-6 * jscale
    pg.accel_jerk_sym_x_chunked.clear_cache()


def test_chunked_sym_jerk_batched_matches_oracle(monkeypatch):
    """Batched chunked-sym accel+jerk (oversized Hermite evals): diag in
    batch 0, sentinel-padded cross pairs, host-summed partials ≡ oracle."""
    monkeypatch.setattr(pg, "T_SYM", 64)
    pg._chunked_jerk_batch.clear_cache()
    pos, vel, mass = _extended_cluster(seed=41)
    ra, rj = gravity.accel_jerk_direct(pos, vel, mass, eps=0.05)
    ascale = float(jnp.max(jnp.abs(ra)))
    jscale = float(jnp.max(jnp.abs(rj)))
    for nb in (1, 2):
        a, j = pg.accel_jerk_sym_chunked_batched(
            pos, vel, mass, 0.05, 1.0, guarded=False, chunk=128,
            n_batches=nb)
        assert float(jnp.max(jnp.abs(a - ra))) < 5e-6 * ascale
        assert float(jnp.max(jnp.abs(j - rj))) < 5e-6 * jscale
    # degenerate single-chunk case (C == 1, sentinel-only cross batch)
    a1, j1 = pg.accel_jerk_sym_chunked_batched(
        pos, vel, mass, 0.05, 1.0, guarded=False, chunk=512, n_batches=3)
    assert float(jnp.max(jnp.abs(a1 - ra))) < 5e-6 * ascale
    assert float(jnp.max(jnp.abs(j1 - rj))) < 5e-6 * jscale
    pg._chunked_jerk_batch.clear_cache()


def test_chunked_sym_extended_batched_matches_oracle(monkeypatch):
    """Batched extended-tier chunked-sym accel (precision='extended'
    through the oversized-eval path): host-summed partials match the df32
    extended oracle."""
    from oc_nbody_tpu.ops import df32
    monkeypatch.setattr(pg, "T_SYMX", 64)
    pg._chunked_x_batch.clear_cache()
    pos, _, mass = _extended_cluster(seed=43)
    ref = df32.accel_extended(pos, mass, eps=0.05, chunk=64)
    scale = float(jnp.max(jnp.abs(ref)))
    for nb in (1, 2):
        a = pg.accel_sym_x_chunked_batched(pos, mass, 0.05, 1.0,
                                           guarded=False, chunk=128,
                                           n_batches=nb)
        assert float(jnp.max(jnp.abs(a - ref))) < 5e-6 * scale
    a1 = pg.accel_sym_x_chunked_batched(pos, mass, 0.05, 1.0,
                                        guarded=False, chunk=512,
                                        n_batches=2)  # C == 1
    assert float(jnp.max(jnp.abs(a1 - ref))) < 5e-6 * scale
    pg._chunked_x_batch.clear_cache()


def test_chunked_sym_extended_phi_batched_matches_oracle(monkeypatch):
    """Batched extended-tier chunked-sym accel+phi (extended oversized
    diagnostics): RAW phi contract + sentinel padding."""
    monkeypatch.setattr(pg, "T_SYMXP", 64)
    pg._chunked_x_phi_batch.clear_cache()
    pos, _, mass = _extended_cluster(seed=47)
    ra, rp = gravity.accel_potential_direct(pos, mass, 0.05)
    ascale = float(jnp.max(jnp.abs(ra)))
    pscale = float(jnp.max(jnp.abs(rp)))
    for nb in (1, 2):
        a, p = pg.accel_potential_sym_x_chunked_batched(
            pos, mass, 0.05, 1.0, guarded=False, chunk=128, n_batches=nb)
        p = p + gravity.self_phi(mass, 0.05, 1.0)
        assert float(jnp.max(jnp.abs(a - ra))) < 5e-6 * ascale
        assert float(jnp.max(jnp.abs(p - rp))) < 5e-6 * pscale
    pg._chunked_x_phi_batch.clear_cache()


def test_chunked_sym_extended_jerk_batched_matches_oracle(monkeypatch):
    """Batched extended-tier chunked-sym accel+jerk (host-stepped extended
    Hermite force evals)."""
    from oc_nbody_tpu.ops import df32
    monkeypatch.setattr(pg, "T_SYMXJ", 64)
    pg._chunked_xj_batch.clear_cache()
    pos, vel, mass = _extended_cluster(seed=53)
    ra, rj = df32.accel_jerk_extended(pos, vel, mass, eps=0.05, chunk=64)
    ascale = float(jnp.max(jnp.abs(ra)))
    jscale = float(jnp.max(jnp.abs(rj)))
    for nb in (1, 2):
        a, j = pg.accel_jerk_sym_x_chunked_batched(
            pos, vel, mass, 0.05, 1.0, guarded=False, chunk=128,
            n_batches=nb)
        assert float(jnp.max(jnp.abs(a - ra))) < 5e-6 * ascale
        assert float(jnp.max(jnp.abs(j - rj))) < 5e-6 * jscale
    pg._chunked_xj_batch.clear_cache()


def test_split_pairs_and_pipelined_batches():
    """The shared batched-dispatch plumbing: _split_pairs pads the
    cross-pair list with (-1,-1) sentinels to equal same-shape batches
    (nb clamped to the pair count), and _pipelined_batches sums the
    per-batch pytrees while dispatching strictly in order."""
    calls = []

    def dispatch(b, pairs):
        calls.append((b, np.asarray(pairs).shape))
        return (jnp.asarray([float(b + 1)]),
                jnp.asarray([float(10 * (b + 1))]))

    pair_list, nb, per = pg._split_pairs(4, 3)   # C=4 -> 6 pairs over 3
    assert (nb, per) == (3, 2) and len(pair_list) == 6
    out = pg._pipelined_batches(dispatch, nb, per, pair_list)
    assert [c[0] for c in calls] == [0, 1, 2]
    assert all(shape == (2, 2) for _, shape in calls)
    np.testing.assert_allclose(np.asarray(out[0]), [6.0])
    np.testing.assert_allclose(np.asarray(out[1]), [60.0])
    # nb clamps to the pair count; C=1 has no pairs at all
    assert pg._split_pairs(2, 4)[1] == 1
    pl1, nb1, per1 = pg._split_pairs(1, 4)
    assert (pl1, nb1, per1) == ([], 1, 0)
