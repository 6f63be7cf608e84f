#!/usr/bin/env python
"""Benchmark regression gate: re-measure the headline kernel and compare
against the committed bench/results.json (SURVEY.md §4.5 "benchmark
regression ... tracked per commit").

Exit 0 if current throughput is within --tol (default 10%) of the recorded
value (or faster); exit 1 on a regression. Use after kernel changes:

    python bench/check_regression.py            # N=65536, pallas on TPU
    python bench/check_regression.py --n 16384 --tol 0.15

Refresh the baseline with bench/perf_sweep.py (which rewrites results.json).
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

from oc_nbody_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from perf_sweep import timeit  # noqa: E402

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results.json")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=65536)
    ap.add_argument("--tol", type=float, default=0.10,
                    help="allowed fractional slowdown vs the recorded value")
    ap.add_argument("--repeats", type=int, default=10)
    args = ap.parse_args()

    from oc_nbody_tpu.models.plummer import plummer

    on_tpu = jax.default_backend() != "cpu"
    kernel = "pallas_accel" if on_tpu else "jnp_accel"
    with open(RESULTS) as f:
        recorded = json.load(f)
    row = next((r for r in recorded["rows"] if r["N"] == args.n), None)
    if row is None or kernel not in row:
        print(f"no recorded {kernel} baseline at N={args.n}; "
              f"run bench/perf_sweep.py --ns {args.n} first")
        return 2

    eps = 1.0 / 256
    state = plummer(args.n, jax.random.PRNGKey(0))
    if on_tpu:
        # gate on the PRODUCTION dispatch (guarded=False under eps > 0,
        # matching ForceModel's softened routing) — round-2 W1: the gate
        # must read the same numbers the docs claim
        from oc_nbody_tpu.ops import pallas_gravity as k
        fn = jax.jit(lambda p, m: k.accel(p, m, eps, 1.0, guarded=False))
    else:
        from oc_nbody_tpu.ops import gravity as k
        fn = jax.jit(lambda p, m: k.accel(p, m, eps, 1.0))
    dt = timeit(fn, state.pos, state.mass, repeats=args.repeats)
    now = args.n * args.n / dt
    ref = row[kernel]["ints_per_s"]
    ratio = now / ref
    verdict = "OK" if ratio >= 1.0 - args.tol else "REGRESSION"
    print(json.dumps({
        "kernel": kernel, "N": args.n,
        "ints_per_s": now, "recorded": ref, "ratio": ratio,
        "tol": args.tol, "verdict": verdict,
    }))
    return 0 if verdict == "OK" else 1


if __name__ == "__main__":
    sys.exit(main())
