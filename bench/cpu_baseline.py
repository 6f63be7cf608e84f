"""Measured CPU stand-in for the ">100x faster than the CPU reference"
target (BASELINE.json:5; SURVEY.md §6 row 3).

The reference is a CPU code with no published numbers and an empty source
tree (SURVEY.md §0), so its absolute wall-clock is unknowable. As a
defensible stand-in this script times OUR OWN engine's jnp backend on this
host's CPU — an XLA-compiled, vectorised, multi-core O(N²) direct sum,
i.e. a *generous* CPU baseline (a typical numpy/Fortran research loop
would be slower, making the reported ratio a lower bound).

Run standalone (forces the CPU backend in-process before backend init):

    python bench/cpu_baseline.py [--ns 8192 65536] [--repeats 3]

Prints one JSON line per N with interactions/s and the s/Myr for the
north-star configuration scaling (same dt and unit system as the c1/c2
acceptance configs), plus a summary ratio against the recorded TPU number.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# must run before backend init; the environment's sitecustomize overrides
# JAX_PLATFORMS, so the config API is the only reliable way (tests/conftest.py
# does the same)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402


def measure_eval_time(n: int, repeats: int) -> float:
    """Seconds per force evaluation (dependent chain, slope-timed)."""
    from oc_nbody_tpu.forces import make_force_model
    from oc_nbody_tpu.models.plummer import plummer

    state = plummer(n, jax.random.PRNGKey(0))
    force = make_force_model(eps=1.0 / 256, backend="jnp")

    @jax.jit
    def chain(pos, k):
        def body(_, p):
            a = force.accel(p, state.mass)
            return p + 1e-300 * a
        return jax.lax.fori_loop(0, k, body, pos)

    chain(state.pos, 1).block_until_ready()  # compile + warm-up
    t0 = time.perf_counter()
    chain(state.pos, 1).block_until_ready()
    t1 = time.perf_counter()
    chain(state.pos, 1 + repeats).block_until_ready()
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / repeats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ns", type=int, nargs="+", default=[8192, 65536])
    ap.add_argument("--repeats", type=int, default=3)
    # TPU reference point: bench.py on the v5 lite chip (BASELINE.md)
    ap.add_argument("--tpu-int-per-sec", type=float, default=1.807e11)
    args = ap.parse_args()

    assert jax.default_backend() == "cpu", jax.default_backend()

    # north-star config scaling: KDK dt = 1/1024 Hénon units; c1 units are
    # mass 1e3 Msun, r_v 1 pc -> t_hen = 0.471 Myr (UnitSystem.henon)
    from oc_nbody_tpu.utils.units import UnitSystem
    us = UnitSystem.henon(mass_msun=1.0e3, length_pc=1.0)
    dt = 1.0 / 1024.0
    steps_per_myr = 1.0 / (dt * us.time_myr)

    rows = []
    for n in args.ns:
        per_eval = measure_eval_time(n, args.repeats)
        rate = n * n / per_eval
        s_per_myr = per_eval * steps_per_myr  # KDK: one force eval per step
        row = {
            "metric": "cpu_standin_interactions_per_sec",
            "n": n,
            "value": rate,
            "unit": "interactions/s",
            "s_per_eval": per_eval,
            "s_per_myr_kdk_c1_units": s_per_myr,
            "tpu_over_cpu": args.tpu_int_per_sec / rate,
        }
        rows.append(row)
        print(json.dumps(row))
    best = min(r["tpu_over_cpu"] for r in rows)
    print(json.dumps({
        "metric": "tpu_speedup_over_cpu_standin",
        "value": best,
        "unit": "x",
        "vs_baseline": best / 100.0,   # target: >100x (BASELINE.json:5)
    }))


if __name__ == "__main__":
    main()
