#!/usr/bin/env python
"""Hardware cost of the precision tiers at production sizes.

Round-3 closure of VERDICT Missing #1's "Done when": the extended tier
now runs resident (N <= STREAM_N) AND HBM-streamed (N = 1M-class), so its
cost must be on record at both scales next to the f32 production kernel.

Slope-timed in one jit (dependent chain — see bench/perf_sweep.timeit).
Usage: python bench/tier_cost.py [--ns 65536 1048576]
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

from oc_nbody_tpu.models.plummer import plummer  # noqa: E402
from perf_sweep import timeit  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ns", nargs="*", type=int, default=[65536, 1048576])
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    if jax.default_backend() == "cpu":
        print("needs a TPU backend; skipping")
        return 0

    from oc_nbody_tpu.ops import pallas_gravity as pg

    eps = 1.0 / 256
    rows = []
    for n in args.ns:
        state = plummer(n, jax.random.PRNGKey(0))
        kernels = {
            "f32_accel": jax.jit(
                lambda p, m: pg.accel(p, m, eps, 1.0, guarded=False)),
            "extended_accel": jax.jit(
                lambda p, m: pg.accel_x(p, m, eps, 1.0, guarded=False)),
        }
        base = None
        for name, fn in kernels.items():
            dt = timeit(fn, state.pos, state.mass, repeats=args.repeats)
            rate = n * n / dt
            if base is None:
                base = dt
            row = {"N": n, "kernel": name, "ms": dt * 1e3,
                   "ints_per_s": rate, "vs_f32": dt / base,
                   "streamed": n > pg.STREAM_N}
            rows.append(row)
            print(f"N={n:8d} {name:16s} {dt*1e3:10.2f} ms "
                  f"{rate:.3e} int/s  {dt/base:.2f}x f32", flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "tier_cost.json")
    with open(out, "w") as f:
        json.dump({"device": str(jax.devices()[0]), "rows": rows}, f,
                  indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    sys.exit(main())
