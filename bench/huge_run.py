#!/usr/bin/env python
"""8M-particle end-to-end demonstration on ONE chip (round-3 scale proof).

N = 8,388,608 isolated Plummer sphere, KDK leapfrog, with start/end
energy diagnostics. A single in-jit force eval at this N is a ~240 s XLA
program — past this environment's relay watchdog (and the shape of any
production pre-emption window) — so the loop composes the MULTI-DISPATCH
batched chunked-sym kernels on the host: each force eval is 8 same-shape
dispatches (ops/pallas_gravity.accel_sym_chunked_batched), each ~30 s,
with the KDK update as cheap O(N) jitted ops between them. This is the
production decomposition any driver needs once per-program runtime is
bounded; the in-jit superstep path (run.py) remains the default through
N = 2M where one eval fits the window.

Usage: python bench/huge_run.py [--n 8388608] [--steps 4]
Writes bench/huge_run.json and (if --out) a diagnostics H5.
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
import numpy as np  # noqa: E402

from oc_nbody_tpu.models.plummer import plummer  # noqa: E402
from oc_nbody_tpu.ops import pallas_gravity as pg  # noqa: E402

EPS = 1.0 / 256
DT = 1.0 / 256


@jax.jit
def _kick(vel, acc, h):
    return vel + h * acc


@jax.jit
def _drift(pos, vel, h):
    return pos + h * vel


@jax.jit
def _energies(vel, mass, phi):
    ke = 0.5 * jnp.sum(mass * jnp.sum(vel * vel, axis=1))
    pe = 0.5 * jnp.sum(mass * phi)
    return ke, pe


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8_388_608)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--out", default=None, help="optional diagnostics H5")
    args = ap.parse_args()
    if jax.default_backend() == "cpu":
        print("needs a TPU backend; skipping")
        return 0

    t_wall = time.perf_counter()
    state = plummer(args.n, jax.random.PRNGKey(8))
    pos, vel, mass = state.pos, state.vel, state.mass
    jax.block_until_ready(pos)
    print(f"IC: Plummer N={args.n} in {time.perf_counter()-t_wall:.1f} s")

    def accel(p):
        return pg.accel_sym_chunked_batched(p, mass, EPS, guarded=False,
                                            n_batches=args.batches)

    def accel_phi(p):
        return pg.accel_potential_sym_chunked_batched(
            p, mass, EPS, guarded=False, n_batches=args.batches)

    t0 = time.perf_counter()
    acc, phi = accel_phi(pos)
    ke0, pe0 = _energies(vel, mass, phi)
    e0 = float(ke0 + pe0)
    print(f"E0 = {e0:.9e} (KE {float(ke0):.6e}, PE {float(pe0):.6e}) "
          f"[{time.perf_counter()-t0:.1f} s]")

    rows = []
    for s in range(args.steps):
        ts = time.perf_counter()
        vel = _kick(vel, acc, 0.5 * DT)
        pos = _drift(pos, vel, DT)
        acc = accel(pos)
        vel = _kick(vel, acc, 0.5 * DT)
        jax.block_until_ready(vel)
        w = time.perf_counter() - ts
        rows.append(w)
        print(f"step {s+1}/{args.steps}: {w:.1f} s")

    t0 = time.perf_counter()
    _, phi = accel_phi(pos)
    ke1, pe1 = _energies(vel, mass, phi)
    e1 = float(ke1 + pe1)
    de = (e1 - e0) / abs(e0)
    total = time.perf_counter() - t_wall
    print(f"E1 = {e1:.9e}  dE/E = {de:+.3e} over {args.steps} steps "
          f"[{time.perf_counter()-t0:.1f} s]")
    print(f"total wall {total:.1f} s; steady step "
          f"{np.median(rows[1:] or rows):.1f} s")

    out = {
        "n": args.n, "steps": args.steps, "dt": DT, "eps": EPS,
        "n_batches": args.batches, "E0": e0, "E1": e1, "dE_over_E": de,
        "step_walls_s": rows, "total_wall_s": total,
    }
    json.dump(out, open(os.path.join(os.path.dirname(__file__),
                                     "huge_run.json"), "w"), indent=1)
    print("wrote bench/huge_run.json")
    if args.out:
        import h5py
        with h5py.File(args.out, "w") as f:
            f.attrs["n"] = args.n
            f.attrs["dt"] = DT
            f.attrs["eps"] = EPS
            f.create_dataset("E", data=np.asarray([e0, e1]))
            f.create_dataset("t", data=np.asarray([0.0, args.steps * DT]))
            f.create_dataset("step_walls_s", data=np.asarray(rows))
    return 0


if __name__ == "__main__":
    sys.exit(main())
