"""Allison et al. (2009) MST mass-segregation ratio (analysis/profiles.py).

Oracles are synthetic geometries with known answers: a hand-checkable MST,
an unsegregated random cluster (Λ ≈ 1), and a constructed segregated one
(massive stars confined to the core → Λ >> 1).
"""
import sys
import os

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..",
                                "analysis"))
import profiles  # noqa: E402


def test_mst_length_hand_checked():
    # collinear points: MST is the chain, length = span
    pts = np.array([[0.0, 0, 0], [1.0, 0, 0], [3.0, 0, 0], [6.0, 0, 0]])
    assert profiles.mst_length(pts) == 6.0
    # unit square in 3D: MST = 3 edges of length 1
    sq = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], float)
    assert abs(profiles.mst_length(sq) - 3.0) < 1e-12
    assert profiles.mst_length(pts[:1]) == 0.0


def test_lambda_msr_unsegregated():
    rng = np.random.default_rng(5)
    n = 2000
    pos = rng.normal(size=(n, 3))
    mass = rng.uniform(0.1, 2.0, n)  # masses uncorrelated with position
    lam, sig = profiles.mass_segregation_ratio(pos, mass, seed=1)
    assert abs(lam - 1.0) < 3 * sig
    assert sig < 0.4


def test_lambda_msr_segregated():
    rng = np.random.default_rng(6)
    n = 2000
    pos = rng.normal(size=(n, 3))
    mass = rng.uniform(0.1, 1.0, n)
    # confine the 20 most massive to a tiny core
    idx = np.argsort(mass)[-20:]
    pos[idx] = 0.02 * rng.normal(size=(20, 3))
    lam, sig = profiles.mass_segregation_ratio(pos, mass, seed=1)
    assert lam - 2 * sig > 2.0, (lam, sig)


def test_lambda_msr_degenerate():
    rng = np.random.default_rng(7)
    pos = rng.normal(size=(100, 3))
    assert profiles.mass_segregation_ratio(pos, np.ones(100)) is None
    assert profiles.mass_segregation_ratio(
        pos[:30], rng.uniform(0.1, 1, 30)) is None
