#!/usr/bin/env python
"""Throughput sweep: pairwise interactions/s vs N for each backend/kernel.

Writes bench/results.json and prints a table (SURVEY.md §2.15).
Usage: python bench/perf_sweep.py [--ns 8192 32768 65536 131072]
"""
import argparse
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

from oc_nbody_tpu.models.plummer import plummer  # noqa: E402


def timeit(fn, *args, repeats=10):
    """Dependent-chain timing: repeated identical dispatches can be
    memoized/overlapped by the runtime (measured), so each evaluation's
    input must depend on the previous output."""
    import jax.numpy as jnp

    @jax.jit
    def chain(pos, k):
        def body(_, p):
            out = fn(p, *args[1:])
            leaves = jax.tree_util.tree_leaves(out)
            if len(leaves) == 1 and leaves[0].shape == p.shape:
                a = leaves[0].astype(p.dtype)
            else:
                # multi-output fn (e.g. a diagnostics dict): depend on EVERY
                # leaf, or XLA dead-code-eliminates the untouched outputs and
                # the chain times only the first column (measured: compute_all
                # "cost" came out ~0/negative with the first-leaf feedback)
                a = sum(jnp.sum(l).astype(p.dtype) for l in leaves)
            return p + jnp.asarray(1e-300, p.dtype) * a
        return jax.lax.fori_loop(0, k, body, pos)

    chain(args[0], 1).block_until_ready()
    t0 = time.perf_counter()
    chain(args[0], 1).block_until_ready()
    t1 = time.perf_counter()
    chain(args[0], 1 + repeats).block_until_ready()
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / repeats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ns", nargs="*", type=int,
                    default=[8192, 32768, 65536, 131072])
    ap.add_argument("--repeats", type=int, default=10)
    args = ap.parse_args()

    on_tpu = jax.default_backend() != "cpu"
    results = {"device": str(jax.devices()[0]), "rows": []}
    eps = 1.0 / 256

    for n in args.ns:
        state = plummer(n, jax.random.PRNGKey(0))
        row = {"N": n}
        kernels = {}
        from oc_nbody_tpu.ops import gravity
        if n <= 262144:
            # the blocked jnp kernel materialises (chunk, N) tiles: fine to
            # ~262k, prohibitive at 1M (4 GB per temporary)
            kernels["jnp_accel"] = jax.jit(
                lambda p, m: gravity.accel(p, m, eps, 1.0))
        if on_tpu:
            from oc_nbody_tpu.ops import pallas_gravity
            # past STREAM_N sources these dispatch to the HBM-streaming
            # kernels automatically — the N=1M large-N path.
            #
            # PRODUCTION guard mode: eps > 0 here, so the driver's
            # ForceModel dispatches guarded=False (softened=True drops the
            # self-pair compare/select). Round-2 W1: the committed sweep
            # measured guarded=True while docs/PERFORMANCE.md quoted the
            # unguarded numbers — the artifacts told opposite stories.
            # The primary columns now measure the production dispatch;
            # the guarded variant is its own column.
            kernels["pallas_accel"] = jax.jit(
                lambda p, m: pallas_gravity.accel(p, m, eps, 1.0,
                                                  guarded=False))
            kernels["pallas_accel_guarded"] = jax.jit(
                lambda p, m: pallas_gravity.accel(p, m, eps, 1.0,
                                                  guarded=True))
            kernels["pallas_accel_jerk"] = jax.jit(
                lambda p, v, m: pallas_gravity.accel_jerk(p, v, m, eps, 1.0,
                                                          guarded=False))
        for name, fn in kernels.items():
            if "jerk" in name:
                dt = timeit(fn, state.pos, state.vel, state.mass,
                            repeats=args.repeats)
            else:
                dt = timeit(fn, state.pos, state.mass, repeats=args.repeats)
            rate = n * n / dt
            row[name] = {"ms": dt * 1e3, "ints_per_s": rate}
            print(f"N={n:7d} {name:18s} {dt*1e3:9.2f} ms  {rate:.3e} int/s")
        results["rows"].append(row)

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "results.json")
    # merge with any existing rows (keyed by N): partial sweeps must not
    # clobber previously measured sizes
    if os.path.exists(out_path):
        try:
            with open(out_path) as f:
                old = json.load(f)
            new_ns = {r["N"] for r in results["rows"]}
            results["rows"] = sorted(
                [r for r in old.get("rows", []) if r["N"] not in new_ns]
                + results["rows"], key=lambda r: r["N"])
        except (json.JSONDecodeError, KeyError):
            pass
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
