"""Cluster-structure diagnostics: CH85 core radius / central density,
velocity dispersion, virial ratio, half-mass relaxation time.

Validation is against the ANALYTIC Plummer profile (SURVEY.md §4.1 style:
no reference outputs exist — /root/reference is empty — so the oracle is
the closed-form model the sampler is independently tested against).

For stars sampled with number density ∝ ρ(r), sums over stars are
∫·ρ dV integrals, so the estimator expectations are:
    rho_core = Σρ_j²/Σρ_j     →  ∫ρ³ dV / ∫ρ² dV
    r_core²  = Σρ_j²r²/Σρ_j²  →  ∫ρ³ r⁴ dr / ∫ρ³ r² dr
The k=6 kNN estimate adds smoothing (down) and weighting-noise (up ~1/(k−2),
measured 1.30x at N=8192) biases, so the absolute checks use generous bands
while the SCALING checks (a → 2a) are tight. r_core measured within 1.2%
of the integral expectation at N=8192.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.integrate import quad

from oc_nbody_tpu import diagnostics as diag
from oc_nbody_tpu.forces import make_force_model
from oc_nbody_tpu.models.plummer import plummer
from oc_nbody_tpu.state import ParticleState

N = 8192


@pytest.fixture(scope="module")
def plummer_state():
    return plummer(N, jax.random.PRNGKey(11))


def _plummer_expectations(a=1.0, M=1.0):
    rho0 = 3 * M / (4 * np.pi * a**3)
    u = lambda x: (1 + x * x) ** -2.5
    I = lambda p, n: quad(lambda x: u(x) ** p * x**n, 0, np.inf)[0]
    rho_core = rho0 * I(3, 2) / I(2, 2)
    r_core = a * np.sqrt(I(3, 4) / I(3, 2))
    return r_core, rho_core


def test_core_radius_density_plummer(plummer_state):
    r_c, rho_c = diag.core_radius_density(plummer_state)
    # the default sampler is Hénon-scaled: a = 3π/16 (models/plummer.py:21)
    r_exp, rho_exp = _plummer_expectations(a=3 * np.pi / 16)
    assert 0.75 < float(r_c) / r_exp < 1.3
    assert 0.5 < float(rho_c) / rho_exp < 1.8


def test_core_scaling_with_model_radius(plummer_state):
    """a → 2a: r_core doubles, rho_core drops 8x (pure scaling — the
    estimator biases cancel in the ratio)."""
    s = plummer_state
    s2 = ParticleState(pos=s.pos * 2.0, vel=s.vel / jnp.sqrt(2.0),
                       mass=s.mass, ids=s.ids, time=s.time)
    r1, rho1 = diag.core_radius_density(s)
    r2, rho2 = diag.core_radius_density(s2)
    assert float(r2 / r1) == pytest.approx(2.0, rel=1e-5)
    assert float(rho2 / rho1) == pytest.approx(0.125, rel=1e-4)


def test_core_translation_invariance(plummer_state):
    """Galactocentric offsets must not corrupt the (centred, f32) distance
    sweep — SURVEY.md §7 hard part #1."""
    s = plummer_state
    shift = jnp.asarray([8000.0, -3000.0, 150.0])
    s2 = ParticleState(pos=s.pos + shift, vel=s.vel, mass=s.mass,
                       ids=s.ids, time=s.time)
    r1, rho1 = diag.core_radius_density(s)
    r2, rho2 = diag.core_radius_density(s2)
    assert float(r1) == pytest.approx(float(r2), rel=1e-3)
    assert float(rho1) == pytest.approx(float(rho2), rel=1e-3)


def test_local_density_subsampling_consistent(plummer_state):
    """Strided probe/source subsampling (the oversized-N path) stays within
    estimator scatter of the full computation."""
    s = plummer_state
    c = diag.density_center(s)
    rho_full, ps = diag.local_density(s.pos, s.mass, c)
    assert ps == 1 and rho_full.shape == (N,)
    r_c, rho_c = diag.core_radius_density(s)
    r_cs, rho_cs = diag.core_radius_density(s, max_probes=2048,
                                            max_sources=2048)
    assert float(r_cs) == pytest.approx(float(r_c), rel=0.25)
    assert 0.4 < float(rho_cs) / float(rho_c) < 1.6


def test_local_density_matches_exact_knn():
    """The threshold-pass kth-NN scheme (which replaced lax.top_k over the
    full source axis — 40x cheaper at the 65536² sweep cap) must agree
    with an exact numpy nearest-neighbour oracle, including the chunk
    padding path (n=257 pads to 512)."""
    rng = np.random.default_rng(3)
    n, k = 257, 6
    pos = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    mass = jnp.asarray(rng.uniform(0.5, 1.5, size=n), jnp.float32)
    rho, ps = diag.local_density(pos, mass, jnp.zeros(3), k=k)
    assert ps == 1 and rho.shape == (n,)

    p32 = np.asarray(pos, np.float32)
    d2 = np.sum((p32[:, None, :] - p32[None, :, :]) ** 2, axis=-1,
                dtype=np.float32)
    d2[d2 <= 0.0] = np.inf
    order = np.argsort(d2, axis=1)
    rk = np.take_along_axis(d2, order[:, k - 1:k], axis=1)[:, 0]
    mnb = np.asarray(mass, np.float64)[order[:, : k - 1]].sum(axis=1)
    expect = mnb / (4 * np.pi / 3 * np.float64(rk) ** 1.5)
    np.testing.assert_allclose(np.asarray(rho), expect, rtol=1e-6)


def test_core_tiny_n_is_nan():
    s = plummer(5, jax.random.PRNGKey(0))
    r_c, rho_c = diag.core_radius_density(s)
    assert np.isnan(float(r_c)) and np.isnan(float(rho_c))


def test_sigma_1d_matches_virial(plummer_state):
    """Plummer equilibrium: σ_1d = sqrt(−W/3M); in Hénon units W = −1/2,
    so σ_1d = sqrt(1/6)."""
    sigma = diag.velocity_dispersion_1d(plummer_state)
    assert float(sigma) == pytest.approx(np.sqrt(1.0 / 6.0), rel=0.03)


def test_relaxation_time_formula():
    t = diag.half_mass_relaxation_time(1000, 1.0, 0.77, 1.0)
    nb, mbar, rh = 1000.0, 1e-3, 0.77
    expect = 0.138 * np.sqrt(nb) * rh**1.5 / np.sqrt(mbar) / np.log(0.11 * nb)
    assert float(t) == pytest.approx(expect, rel=1e-12)
    assert np.isnan(float(diag.half_mass_relaxation_time(1, 1e-3, 0.77, 1.0)))


def test_rmin_floor_caps_binary_artifact(plummer_state):
    """A single hard binary must not blow up rho_core by orders of
    magnitude (measured 87.8 → 3.1e6 across the core bounce in the
    cc_collapse demo without the floor): with r_min = 2 eps the reported
    density is capped at the resolution-limited value."""
    s = plummer_state
    eps = 1.0 / 256
    # plant a compact multiple (8 stars inside eps/4 — a post-collapse
    # core subsystem: each member's 6th neighbour is another member, so
    # without the floor their rho_j ~ m/(eps/4)^3 dominates the rho^2-
    # weighted sums)
    clump = 0.25 * eps * jax.random.normal(jax.random.PRNGKey(0), (8, 3))
    pos = s.pos.at[:8].set(clump)
    s2 = ParticleState(pos=pos, vel=s.vel, mass=s.mass, ids=s.ids,
                       time=s.time)
    r_raw, rho_raw = diag.core_radius_density(s2)
    r_fl, rho_fl = diag.core_radius_density(s2, r_min=2 * eps)
    r_ref, rho_ref = diag.core_radius_density(plummer_state,
                                              r_min=2 * eps)
    # every floored rho_j is bounded by the analytic resolution cap
    # (k-1) m_bar / V(2 eps), hence so is the rho-weighted rho_core —
    # while the unfloored estimate blows past it by orders of magnitude
    cap = 5 * (1.0 / N) / (4 * np.pi / 3 * (2 * eps) ** 3)
    assert float(rho_raw) > 10 * cap                  # the artifact
    assert float(rho_fl) <= 1.05 * cap                # capped
    assert float(rho_raw) > 50 * float(rho_fl)
    # the floor leaves a normal (clump-free) cluster untouched
    r0, rho0 = diag.core_radius_density(plummer_state)
    assert float(rho_ref) == pytest.approx(float(rho0), rel=1e-6)
    assert float(r_ref) == pytest.approx(float(r0), rel=1e-6)


def test_dissolved_cluster_columns_nan(plummer_state):
    """Empty bound selection: Q_virial and sigma_1d go NaN (not a
    plausible-looking 0.0), matching the lagrangian_radii convention."""
    s = plummer_state
    s2 = ParticleState(pos=s.pos, vel=s.vel * 1e3, mass=s.mass,
                       ids=s.ids, time=s.time)  # everything unbound
    force = make_force_model(eps=1.0 / 64, backend="jnp")
    row = diag.compute_all(s2, force, core=False)
    assert int(row["N_bound"]) == 0
    assert np.isnan(float(row["Q_virial"]))
    assert np.isnan(float(row["sigma_1d"]))
    assert np.isnan(float(row["t_rh"]))


def test_compute_all_new_columns(plummer_state):
    force = make_force_model(eps=1.0 / 64, backend="jnp")
    row = diag.compute_all(plummer_state, force)
    for k in ("Q_virial", "sigma_1d", "t_rh", "r_core", "rho_core"):
        assert k in row and np.isfinite(float(row[k])), k
    # isolated equilibrium: Q ≈ 1/2 (virial), t_rh positive
    assert float(row["Q_virial"]) == pytest.approx(0.5, rel=0.06)
    assert float(row["t_rh"]) > 0
    row_nocore = diag.compute_all(plummer_state, force, core=False)
    assert "r_core" not in row_nocore and "sigma_1d" in row_nocore
