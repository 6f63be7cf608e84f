"""King (1962) empirical profile fit (analysis/profiles.py).

Oracle 1: round-trip — binned data generated from king62_sigma itself is
recovered exactly. Oracle 2: a sampled dynamical King model (models/king.py,
validated elsewhere against its own ODE) fitted with the empirical law
recovers the model's concentration — the classic observational measurement
(the King62 law is an approximation to the model's projected density, so
the band is generous).
"""
import sys
import os

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..",
                                "analysis"))
import profiles  # noqa: E402

from oc_nbody_tpu.models.king import king, solve_king_profile  # noqa: E402


def test_king62_roundtrip():
    rng = np.random.default_rng(3)
    k, rc, rt = 7.3, 0.42, 9.1
    R = np.geomspace(0.03, 12.0, 40)
    S = profiles.king62_sigma(R, k, rc, rt)
    count = np.full(R.shape, 500)
    keep = S > 0
    fit = profiles.fit_king62(R[keep], S[keep], count[keep], r_eff=1.0)
    assert fit is not None and fit["ok"]
    assert np.isfinite([fit["k"], fit["rc"], fit["rt"]]).all()
    assert abs(fit["rc"] / rc - 1) < 1e-4
    assert abs(fit["rt"] / rt - 1) < 1e-3
    assert abs(fit["k"] / k - 1) < 1e-4
    # noisy variant still lands close
    Sn = S[keep] * np.exp(rng.normal(0, 0.05, keep.sum()))
    fit = profiles.fit_king62(R[keep], Sn, count[keep], r_eff=1.0)
    assert abs(fit["rc"] / rc - 1) < 0.15
    assert abs(np.log10(fit["rt"] / fit["rc"]) - np.log10(rt / rc)) < 0.1


def test_king_fit_recovers_model_concentration():
    w0 = 5.0
    prof = solve_king_profile(w0)
    c_true = np.log10(prof["r_t"])  # ODE r is in King radii: c = log10(rt)
    st = king(8192, w0, seed=2)
    pos = np.asarray(st.pos)
    vel = np.asarray(st.vel)
    mass = np.asarray(st.mass)
    pp = profiles.projected_profiles(pos, vel, mass, bins=30)
    fit = profiles.fit_king62(pp["R_mid"], pp["Sigma"], pp["count"],
                              pp["r_eff"])
    assert fit is not None
    # empirical-law vs dynamical-model mismatch + N=8k noise: generous band
    assert abs(fit["c"] - c_true) < 0.2, (fit, c_true)
    # the fitted tidal radius must bracket the sampled cluster's edge
    rmax = np.linalg.norm(pos - pos.mean(0), axis=1).max()
    assert 0.6 * rmax < fit["rt"] < 2.5 * rmax
