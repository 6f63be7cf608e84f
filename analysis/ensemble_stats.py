#!/usr/bin/env python
"""Survey summaries over an ensemble.h5 (oc_nbody_tpu.ensemble output).

Per member: seed (and sweep value), final bound-mass fraction, final
half-mass radius, peak |dE/E_int|, and the dissolution time (first
diagnostics time with N_bound == 0; '-' if still alive). Then ensemble
mean/scatter — the numbers a survey actually wants, straight off the
(T, E) columns.

Usage: python analysis/ensemble_stats.py out/run/ensemble.h5 [--json]
"""
import argparse
import json
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from oc_nbody_tpu.ensemble import read_ensemble  # noqa: E402


def summarize(path):
    _, seeds, table, fin = read_ensemble(path)
    t = table["time"][:, 0]
    e = len(seeds)
    mb = table["M_bound"] / np.maximum(table["M_bound"][0], 1e-300)
    nb = table["N_bound"]
    drift = (np.abs(table["dE_over_E_int"]) if "dE_over_E_int" in table
             else np.abs((table["E_tot"] - table["E_tot"][0])
                         / np.abs(table["E_int"][0])))
    rows = []
    for i in range(e):
        dead = np.nonzero(nb[:, i] == 0)[0]
        row = {
            "seed": int(seeds[i]),
            "M_bound_final": float(mb[-1, i]),
            "r_half_final": float(table["r_lagr_50"][-1, i]),
            "max_drift": float(drift[:, i].max()),
            "t_dissolve": float(t[dead[0]]) if dead.size else None,
        }
        if "sweep_values" in fin:
            row[fin["sweep_key"]] = float(fin["sweep_values"][i])
        rows.append(row)
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args(argv)
    rows = summarize(args.path)
    if args.json:
        print(json.dumps(rows, indent=1))
        return 0
    keys = list(rows[0].keys())
    print("  ".join(f"{k:>14s}" for k in keys))
    for r in rows:
        print("  ".join(
            f"{('-' if r[k] is None else (f'{r[k]:.4g}' if isinstance(r[k], float) else str(r[k]))):>14s}"
            for k in keys))
    mbf = np.array([r["M_bound_final"] for r in rows])
    print(f"\nensemble: {len(rows)} members; M_bound_final = "
          f"{mbf.mean():.3f} +- {mbf.std():.3f}")
    td = [r["t_dissolve"] for r in rows if r["t_dissolve"] is not None]
    if td:
        print(f"dissolved: {len(td)}/{len(rows)}; t_dissolve = "
              f"{np.mean(td):.4g} +- {np.std(td):.3g}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
