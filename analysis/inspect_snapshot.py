#!/usr/bin/env python
"""Print a summary of a snapshot file and optionally plot the cluster.

Usage: python analysis/inspect_snapshot.py out/run/snapshot_00003.h5 [--plot xy.png]
"""
import argparse
import sys

import h5py
import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("snapshot")
    ap.add_argument("--plot", default=None, help="write an x-y scatter PNG")
    args = ap.parse_args(argv)

    with h5py.File(args.snapshot, "r") as f:
        pos = np.asarray(f["particles/pos"])
        vel = np.asarray(f["particles/vel"])
        mass = np.asarray(f["particles/mass"], np.float64)
        print(f"schema v{f.attrs.get('schema_version')}  "
              f"t={f.attrs.get('time'):.6g}  step={f.attrs.get('step', '?')}  "
              f"N={pos.shape[0]}")
        if "integrator" in f:
            print(f"integrator: {f['integrator'].attrs.get('kind')} "
                  f"aux={list(f['integrator'].keys())}")
        if "units" in f:
            u = dict(f["units"].attrs)
            print(f"units: {u}")

    com = (pos * mass[:, None]).sum(0) / mass.sum()
    vcom = (vel * mass[:, None]).sum(0) / mass.sum()
    r = np.linalg.norm(pos - com, axis=1)
    print(f"M={mass.sum():.6g}  |com|={np.linalg.norm(com):.6g}  "
          f"|vcom|={np.linalg.norm(vcom):.6g}")
    print(f"r: median={np.median(r):.4g}  90%={np.quantile(r, 0.9):.4g}  "
          f"max={r.max():.4g}")

    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(6, 6))
        ax.scatter(pos[:, 0], pos[:, 1], s=1, alpha=0.4, lw=0)
        ax.set_aspect("equal")
        ax.set_xlabel("x")
        ax.set_ylabel("y")
        fig.savefig(args.plot, dpi=130, bbox_inches="tight")
        print(f"wrote {args.plot}")


if __name__ == "__main__":
    sys.exit(main())
