"""Chain-timed Pallas tile sweep (VERDICT round-1 W2: jerk tiles never swept).

Tile sizes are module-level constants read from the environment at import
(OCN_PALLAS_TI/TJ for jerk+potential, OCN_PALLAS_TI_A/TJ_A for accel), so
each sweep point runs in a subprocess with the env overridden. Results are
appended to bench/tile_sweep.json.

Usage:
    python bench/tile_sweep.py --kernel jerk --n 65536
    python bench/tile_sweep.py --kernel accel --n 1048576 --stream
"""
import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

WORKER = r"""
import json, sys, time
import jax
jax.config.update("jax_enable_x64", True)
sys.path.insert(0, {repo!r})
from oc_nbody_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
import jax.numpy as jnp
from oc_nbody_tpu.models.plummer import plummer
from oc_nbody_tpu.ops import pallas_gravity as pg

n = {n}
kernel = {kernel!r}
state = plummer(n, jax.random.PRNGKey(0))
eps = 1.0 / 256

if kernel == "jerk":
    fn = jax.jit(lambda p, v, m: pg.accel_jerk(p, v, m, eps, 1.0))
    args = (state.pos, state.vel, state.mass)
elif kernel == "jerk_sym":
    fn = jax.jit(
        lambda p, v, m: pg.accel_jerk_sym(p, v, m, eps, 1.0, guarded=False))
    args = (state.pos, state.vel, state.mass)
elif kernel == "jerk_x":
    fn = jax.jit(lambda p, v, m: pg.accel_jerk_x(p, v, m, eps, 1.0))
    args = (state.pos, state.vel, state.mass)
elif kernel == "accel":
    fn = jax.jit(lambda p, m: pg.accel(p, m, eps, 1.0))
    args = (state.pos, state.mass)
elif kernel == "phi_x_sym":
    fn = jax.jit(
        lambda p, m: pg.accel_potential_sym_x(p, m, eps, 1.0,
                                              guarded=False))
    args = (state.pos, state.mass)
else:
    fn = jax.jit(lambda p, m: pg.accel_potential(p, m, eps, 1.0))
    args = (state.pos, state.mass)

@jax.jit
def chain(pos, k):
    def body(_, p):
        out = fn(p, *args[1:])
        a = jax.tree_util.tree_leaves(out)[0]
        return p + jnp.asarray(1e-300, p.dtype) * a.astype(p.dtype)
    return jax.lax.fori_loop(0, k, body, pos)

chain(args[0], 1).block_until_ready()
t0 = time.perf_counter(); chain(args[0], 1).block_until_ready()
t1 = time.perf_counter(); chain(args[0], 1 + {repeats}).block_until_ready()
t2 = time.perf_counter()
dt = ((t2 - t1) - (t1 - t0)) / {repeats}
print("RESULT " + json.dumps(dict(ms=dt * 1e3, ints_per_s=n * n / dt)))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kernel",
                    choices=["jerk", "accel", "phi", "jerk_sym", "jerk_x",
                             "phi_x_sym"],
                    default="jerk")
    ap.add_argument("--n", type=int, default=65536)
    ap.add_argument("--repeats", type=int, default=10)
    ap.add_argument("--tiles", nargs="*", default=None,
                    help="TIxTJ pairs, e.g. 256x1024 512x2048")
    args = ap.parse_args()

    if args.kernel in ("jerk_sym", "phi_x_sym"):
        # square tiles: pass single values (OCN_PALLAS_T_SYM / _T_SYMXP)
        tiles = args.tiles or ["256", "384", "512"]
    else:
        tiles = args.tiles or ["256x1024", "256x2048", "512x1024",
                               "512x2048", "128x2048", "1024x1024"]
    env_ti, env_tj = {
        "accel": ("OCN_PALLAS_TI_A", "OCN_PALLAS_TJ_A"),
        "jerk_x": ("OCN_PALLAS_TI_XJ", "OCN_PALLAS_TJ_XJ"),
        "jerk_sym": ("OCN_PALLAS_T_SYM", None),
        "phi_x_sym": ("OCN_PALLAS_T_SYMXP", None),
    }.get(args.kernel, ("OCN_PALLAS_TI", "OCN_PALLAS_TJ"))

    rows = []
    for pair in tiles:
        if "x" in pair:
            ti, tj = (int(x) for x in pair.split("x"))
        else:
            ti = tj = int(pair)
        env = dict(os.environ, TF_CPP_MIN_LOG_LEVEL="3")
        env[env_ti] = str(ti)
        if env_tj is not None:
            env[env_tj] = str(tj)
        if args.kernel == "jerk":
            # sweep the ONE-SIDED kernel's tiles — accel_jerk otherwise
            # dispatches to the pair-symmetric kernel at resident N
            env["OCN_PALLAS_JERK_SYM"] = "0"
        code = WORKER.format(repo=REPO, n=args.n, kernel=args.kernel,
                             repeats=args.repeats)
        out = subprocess.run([sys.executable, "-c", code], env=env,
                             capture_output=True, text=True, timeout=900)
        line = [ln for ln in out.stdout.splitlines()
                if ln.startswith("RESULT ")]
        if not line:
            print(f"{pair}: FAILED\n{out.stderr[-800:]}")
            rows.append(dict(kernel=args.kernel, n=args.n, ti=ti, tj=tj,
                             error=out.stderr[-300:]))
            continue
        r = json.loads(line[0][len("RESULT "):])
        r.update(kernel=args.kernel, n=args.n, ti=ti, tj=tj)
        rows.append(r)
        print(f"{args.kernel} N={args.n} TI={ti:5d} TJ={tj:5d}: "
              f"{r['ms']:8.2f} ms  {r['ints_per_s']:.3e} int/s")

    path = os.path.join(HERE, "tile_sweep.json")
    old = []
    if os.path.exists(path):
        with open(path) as f:
            old = json.load(f)
    with open(path, "w") as f:
        json.dump(old + rows, f, indent=2)
    print(f"appended {len(rows)} rows to {path}")


if __name__ == "__main__":
    main()
