"""Pair-aware block rung criterion (integrator.pair_dt).

The Aarseth criterion is built from the AGGREGATE force, which vanishes
through the softened core (a ∝ r for r << eps): an eccentric hard pair
whose pericentre dives inside eps gets its dt *grown* exactly where the
encounter is fastest. The pair criterion caps dt at eta_pair × the
softened two-body encounter timescale min(sqrt(u)/|v_ij|, u^{3/4}/
sqrt(G m_pair)), which stays finite (~eps/v) through the core. Measured
motivation: configs/binaries_8k.toml random-walks |dE/E_int| to ~3.5e-3
by t=6.5 without it (round-4 VERDICT Missing #1).
"""
import jax
import jax.numpy as jnp
import numpy as np

from oc_nbody_tpu.forces import make_force_model
from oc_nbody_tpu.integrators.block import BlockHermite
from oc_nbody_tpu.ops import gravity
from oc_nbody_tpu.state import ParticleState


def test_pair_timescale_oracle():
    rng = np.random.default_rng(5)
    n, m = 48, 32
    pos = rng.normal(size=(n, 3)).astype(np.float32)
    vel = rng.normal(size=(n, 3)).astype(np.float32)
    mass = rng.uniform(0.5, 2.0, size=n).astype(np.float32)
    src_pos, src_vel, src_mass = pos[:m], vel[:m], mass[:m]
    eps, G = 0.05, 1.3

    got = np.asarray(gravity.pair_timescale_rows(
        jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(mass),
        jnp.asarray(src_pos), jnp.asarray(src_vel), jnp.asarray(src_mass),
        eps, G, chunk=16))

    dr = src_pos[None, :, :] - pos[:, None, :]
    dv = src_vel[None, :, :] - vel[:, None, :]
    r2 = np.sum(dr * dr, axis=-1)
    u = r2 + eps * eps
    v2 = np.sum(dv * dv, axis=-1)
    with np.errstate(divide="ignore"):
        t_fly2 = np.where(v2 > 0, u / np.maximum(v2, 1e-300), np.inf)
    gm_pair = G * (mass[:, None] + src_mass[None, :])
    t_ff2 = u ** 1.5 / gm_pair
    tau2 = np.minimum(t_fly2, t_ff2)
    tau2 = np.where(r2 > 0, tau2, np.inf)  # rows 0..31 see themselves
    want = np.sqrt(tau2.min(axis=1))
    np.testing.assert_allclose(got, want, rtol=2e-5)


def _eccentric_pair(a=0.01, e=0.97, m=0.5):
    """Isolated two-body pair at APOCENTRE (so the startup rung derives
    from the slow end of the orbit — the criterion must then dive on its
    own as pericentre approaches)."""
    gm = 2.0 * m
    r_apo = a * (1.0 + e)
    v_apo = np.sqrt(gm * (2.0 / r_apo - 1.0 / a))
    pos = jnp.asarray([[-r_apo / 2, 0, 0], [r_apo / 2, 0, 0]], jnp.float64)
    vel = jnp.asarray([[0, -v_apo / 2, 0], [0, v_apo / 2, 0]], jnp.float64)
    return ParticleState(pos=pos, vel=vel,
                         mass=jnp.asarray([m, m], jnp.float32),
                         ids=jnp.arange(2, dtype=jnp.int32),
                         time=jnp.asarray(0.0, jnp.float64))


def _soft_energy(state, eps, gm_prod):
    ke = 0.5 * float(jnp.sum(state.mass[:, None] * state.vel ** 2))
    r = float(jnp.linalg.norm(state.pos[1] - state.pos[0]))
    return ke - gm_prod / np.sqrt(r * r + eps * eps)


def test_pair_dt_holds_softened_pericentre():
    """r_peri = a(1-e) = 3e-4 << eps = 1.5e-3: passages happen INSIDE the
    softened core. Measured margins (10 periods, natively-compiled XLA —
    an earlier 30x margin was an artifact of foreign-host compilation-
    cache executables, since fixed in conftest): pair ~2.2x better than
    the force-only criterion at e=0.97 (1.4e-5 vs 3.0e-5), shrinking to
    ~neutral by e>=0.99 where the interpolated a2/a3 track the transit
    well enough on their own. Assert the stable facts: an absolute bound
    for the pair run and no-regression vs the force-only control."""
    a, e, m, eps = 0.01, 0.97, 0.5, 1.5e-3
    state = _eccentric_pair(a, e, m)
    period = 2.0 * np.pi * np.sqrt(a ** 3 / (2 * m))
    force = make_force_model(eps=eps, G=1.0, backend="jnp", chunk=8)
    kw = dict(force=force, eta=0.02, eta_init=0.01, dt_max=period / 8,
              n_levels=14, n_buckets=0)
    e0 = _soft_energy(state, eps, m * m)
    t_end = 10.0 * period

    errs = {}
    for name, blk in {
        "aarseth": BlockHermite(**kw),
        "pair": BlockHermite(**kw, pair_dt=True, eta_pair=0.02),
    }.items():
        carry = blk.init(state)
        carry = jax.jit(blk.advance_to)(carry, t_end)
        errs[name] = abs(_soft_energy(carry.state, eps, m * m) - e0) / abs(e0)

    assert errs["pair"] < 5e-5, errs
    assert errs["pair"] < 1.2 * errs["aarseth"], errs


def test_pair_dt_caps_rung_at_core_transit():
    """The MECHANISM, deterministically: for a fast pair DEEP INSIDE the
    softened core, the force-derived startup criterion picks a far
    coarser rung than the encounter timescale (the softened force, and
    with it a/|j|, goes ~0 there) — pair_dt must cap it."""
    m, eps = 0.5, 1.5e-3
    # at the softened-core centre with speed v: fly-by time ~ eps/v
    v = 2.0
    pos = jnp.asarray([[-1e-5, 0, 0], [1e-5, 0, 0]], jnp.float64)
    vel = jnp.asarray([[0, -v / 2, 0], [0, v / 2, 0]], jnp.float64)
    state = ParticleState(pos=pos, vel=vel,
                          mass=jnp.asarray([m, m], jnp.float32),
                          ids=jnp.arange(2, dtype=jnp.int32),
                          time=jnp.asarray(0.0, jnp.float64))
    force = make_force_model(eps=eps, G=1.0, backend="jnp", chunk=8)
    kw = dict(force=force, eta=0.02, eta_init=0.01, dt_max=1.0 / 64,
              n_levels=16, n_buckets=0)
    blk = BlockHermite(**kw, pair_dt=True, eta_pair=0.02)
    dt_pair = np.asarray(blk.init(state).dt_i)
    tau_fly = eps / v
    # the pair cap binds: rungs land at/below eta_pair * tau_fly
    assert dt_pair.max() * blk.dt_min <= 0.02 * tau_fly
    # and the near-field WINDOW makes it inert for a far slow pair (the
    # same speed at 100 eps separation): identical rungs to force-only
    far = ParticleState(
        pos=jnp.asarray([[-0.075, 0, 0], [0.075, 0, 0]], jnp.float64),
        vel=vel, mass=state.mass, ids=state.ids, time=state.time)
    dt_far_pair = np.asarray(blk.init(far).dt_i)
    dt_far_plain = np.asarray(BlockHermite(**kw).init(far).dt_i)
    np.testing.assert_array_equal(dt_far_pair, dt_far_plain)


def test_pair_dt_loose_cap_is_inert():
    # a huge eta_pair never binds -> bitwise-identical trajectory
    state = _eccentric_pair(e=0.5)
    force = make_force_model(eps=1e-3, G=1.0, backend="jnp", chunk=8)
    kw = dict(force=force, eta=0.02, dt_max=1.0 / 256, n_levels=8,
              n_buckets=0)
    base = BlockHermite(**kw)
    loose = BlockHermite(**kw, pair_dt=True, eta_pair=1e6)
    cb = jax.jit(base.advance_to)(base.init(state), 1.0 / 256)
    cl = jax.jit(loose.advance_to)(loose.init(state), 1.0 / 256)
    np.testing.assert_array_equal(np.asarray(cb.state.pos),
                                  np.asarray(cl.state.pos))
    np.testing.assert_array_equal(np.asarray(cb.dt_i), np.asarray(cl.dt_i))


def test_pair_dt_bucketed_matches_masked():
    # the bucketed top_k compaction path must agree with the masked
    # full-row path (n_buckets=0) bitwise — same contract as the force
    # eval's test_bucketed_matches_masked
    from oc_nbody_tpu.models.plummer import plummer
    state = plummer(33, jax.random.PRNGKey(7))
    force = make_force_model(eps=1e-3, G=1.0, backend="jnp", chunk=16)
    kw = dict(force=force, eta=0.02, dt_max=1.0 / 64, n_levels=6,
              pair_dt=True, eta_pair=0.02)
    masked = BlockHermite(**kw, n_buckets=0)
    bucketed = BlockHermite(**kw, n_buckets=3)
    cm = jax.jit(masked.advance_to)(masked.init(state), 1.0 / 64)
    cb = jax.jit(bucketed.advance_to)(bucketed.init(state), 1.0 / 64)
    np.testing.assert_array_equal(np.asarray(cm.state.pos),
                                  np.asarray(cb.state.pos))
    np.testing.assert_array_equal(np.asarray(cm.dt_i), np.asarray(cb.dt_i))


def test_hermite_pair_dt_caps_shared_dt():
    """Shared-adaptive Hermite form: same stable-fact contract as the
    block test (measured at 10 periods: 5.0e-5 vs 7.9e-5 — a ~1.6x win
    at e=0.97, neutral at higher e; see the block test's docstring for
    the compilation-cache history of the earlier larger margins)."""
    from oc_nbody_tpu.integrators.hermite import Hermite4
    a, e, m, eps = 0.01, 0.97, 0.5, 1.5e-3
    state = _eccentric_pair(a, e, m)
    period = 2.0 * np.pi * np.sqrt(a ** 3 / (2 * m))
    force = make_force_model(eps=eps, G=1.0, backend="jnp", chunk=8)
    kw = dict(force=force, eta=0.02, eta_init=0.01, dt_max=period / 8)
    e0 = _soft_energy(state, eps, m * m)
    t_end = 10.0 * period
    errs = {}
    for name, st in {
        "aarseth": Hermite4(**kw),
        "pair": Hermite4(**kw, pair_dt=True, eta_pair=0.02),
    }.items():
        c = st.init(state)
        c = jax.jit(st.advance_to)(c, t_end)
        errs[name] = abs(_soft_energy(c.state, eps, m * m) - e0) / abs(e0)
    assert errs["pair"] < 2e-4, errs
    assert errs["pair"] < 1.2 * errs["aarseth"], errs


def test_hermite_macro_pair_dt_refused():
    from oc_nbody_tpu.config import SimConfig
    from oc_nbody_tpu.scene import build_scene, make_stepper
    import pytest
    cfg = SimConfig.from_dict({
        "ic": {"kind": "plummer", "n": 64, "seed": 0},
        "integrator": {"kind": "hermite", "macro_batches": 2,
                       "pair_dt": True, "eps": 0.01},
        "output": {"out_dir": "/tmp/x", "t_end": 0.1},
    })
    cfg.backend = "jnp"
    scene = build_scene(cfg)
    with pytest.raises(ValueError, match="macro"):
        make_stepper(cfg, scene.force)
