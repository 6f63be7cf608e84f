"""Snapshot / checkpoint I/O (HDF5) and the diagnostics time-series table.

Capability parity: SURVEY.md §2.10 — the reference writes snapshots that its
analysis scripts read back (BASELINE.json:5 "snapshot I/O"). The exact
reference schema is unknowable (empty tree, SURVEY.md §0), so this schema is
defined cleanly and documented in docs/SNAPSHOT_SCHEMA.md; an adapter can be
added if the reference ever materialises.

Snapshots double as checkpoints (SURVEY.md §5 failure-recovery): they carry
the full integrator aux state (accelerations, jerks, per-particle timestep
state, step counter) so a resumed run continues bit-identically. Writes are
atomic (temp file + os.replace) so a crash mid-write never corrupts the
latest checkpoint.

Schema v1:
  /particles/{pos,vel,mass,ids}      f64 (N,3), f64 (N,3), f32 (N,), i32 (N,)
  /particles attrs: n
  /integrator/<aux arrays>           integrator-kind-specific
  /integrator attrs: kind
  /units attrs: length_pc, mass_msun, time_myr   (optional)
  root attrs: schema_version, time, step, config_json (optional), rng_key
"""
from __future__ import annotations

import dataclasses
import glob
import json
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Optional

import h5py
import jax
import jax.numpy as jnp
import numpy as np

from oc_nbody_tpu.state import ParticleState, make_state
from oc_nbody_tpu.utils.units import UnitSystem

SCHEMA_VERSION = 1


@dataclasses.dataclass
class Snapshot:
    state: ParticleState
    aux: dict                      # integrator aux arrays (numpy)
    integrator_kind: Optional[str]
    units: Optional[UnitSystem]
    attrs: dict                    # root attrs (time, step, config_json, ...)


def _materialize(state, aux, attrs):
    """Fetch everything to host numpy (device work is done after this)."""
    data = {
        "pos": np.asarray(state.pos, np.float64),
        "vel": np.asarray(state.vel, np.float64),
        "mass": np.asarray(state.mass, np.float32),
        "ids": np.asarray(state.ids, np.int32),
    }
    aux_np = {k: np.asarray(v) for k, v in (aux or {}).items()}
    attrs_np = dict(attrs or {})
    attrs_np["time"] = float(state.time)
    return data, aux_np, attrs_np


def _write_file(path, data, aux_np, integrator_kind, units, attrs_np):
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with h5py.File(tmp, "w") as f:
        g = f.create_group("particles")
        for k in ("pos", "vel", "mass", "ids"):
            g.create_dataset(k, data=data[k])
        g.attrs["n"] = data["pos"].shape[0]
        gi = f.create_group("integrator")
        if integrator_kind is not None:
            gi.attrs["kind"] = integrator_kind
        for k, v in aux_np.items():
            gi.create_dataset(k, data=v)
        if units is not None:
            gu = f.create_group("units")
            for k, v in units.as_dict().items():
                gu.attrs[k] = v
        f.attrs["schema_version"] = SCHEMA_VERSION
        for k, v in attrs_np.items():
            if isinstance(v, (dict, list)):
                v = json.dumps(v)
            f.attrs[k] = v
    os.replace(tmp, path)
    return path


def write_snapshot(
    path: str,
    state: ParticleState,
    aux: Optional[dict] = None,
    integrator_kind: Optional[str] = None,
    units: Optional[UnitSystem] = None,
    attrs: Optional[dict] = None,
) -> str:
    """Atomically write a snapshot; returns the final path."""
    data, aux_np, attrs_np = _materialize(state, aux, attrs)
    return _write_file(path, data, aux_np, integrator_kind, units, attrs_np)


def read_snapshot(path: str, state_dtype=jnp.float64) -> Snapshot:
    with h5py.File(path, "r") as f:
        version = int(f.attrs.get("schema_version", 1))
        if version > SCHEMA_VERSION:
            # partially-matching groups from a future schema would restore
            # silently wrong integrator state — reject instead
            raise ValueError(
                f"snapshot {path!r} has schema v{version}; this reader "
                f"understands up to v{SCHEMA_VERSION}")
        g = f["particles"]
        state = make_state(
            pos=np.asarray(g["pos"]),
            vel=np.asarray(g["vel"]),
            mass=np.asarray(g["mass"]),
            ids=np.asarray(g["ids"]),
            time=float(f.attrs["time"]),
            state_dtype=state_dtype,
        )
        aux, kind = {}, None
        if "integrator" in f:
            gi = f["integrator"]
            kind = gi.attrs.get("kind")
            aux = {k: np.asarray(gi[k]) for k in gi.keys()}
        units = None
        if "units" in f:
            units = UnitSystem.from_dict(dict(f["units"].attrs))
        attrs = dict(f.attrs)
    return Snapshot(state=state, aux=aux, integrator_kind=kind,
                    units=units, attrs=attrs)


def _snapshot_index(path: str) -> int:
    try:
        return int(os.path.basename(path).rsplit("_", 1)[1].split(".")[0])
    except (IndexError, ValueError):
        return -1


def latest_snapshot(out_dir: str) -> Optional[str]:
    """Most recent valid snapshot file in a run directory (for resume).

    Ordered by the PARSED index: lexicographic order breaks past index
    99999 ("snapshot_100000.h5" < "snapshot_99999.h5"), which would
    resume from an older state and then overwrite the true latest."""
    paths = sorted(glob.glob(os.path.join(out_dir, "snapshot_*.h5")),
                   key=_snapshot_index)
    for p in reversed(paths):
        try:
            with h5py.File(p, "r") as f:
                if "particles" in f:
                    return p
        except OSError:
            continue
    return None


class SnapshotWriter:
    """Numbered snapshots plus an appendable diagnostics table in a run dir.

    Diagnostics go to ``diagnostics.h5`` as one resizable 1-D dataset per
    scalar column (SURVEY.md §5 metrics/observability).
    """

    def __init__(self, out_dir: str, units: Optional[UnitSystem] = None,
                 config_json: Optional[str] = None, async_io: bool = True):
        self.out_dir = out_dir
        self.units = units
        self.config_json = config_json
        os.makedirs(out_dir, exist_ok=True)
        self._diag_path = os.path.join(out_dir, "diagnostics.h5")
        # one writer thread: HDF5 writes (~0.5 s at large N) overlap the next
        # superstep on device; ordering is preserved, atomicity unchanged
        self._pool = ThreadPoolExecutor(max_workers=1) if async_io else None
        self._pending = []

    def snapshot_path(self, index: int) -> str:
        return os.path.join(self.out_dir, f"snapshot_{index:05d}.h5")

    def write(self, index: int, state: ParticleState, aux=None,
              integrator_kind=None, step: int = 0, rng_key=None,
              extra_attrs=None) -> str:
        attrs = {"step": int(step)}
        if extra_attrs:
            # driver-level checkpoint scalars (e.g. the cumulative
            # stellar-evolution energy jump E_sev_cum) that must survive a
            # resume even though diagnostics-row truncation drops the row
            # written AT the checkpoint time (run.py resume path)
            attrs.update(extra_attrs)
        if self.config_json is not None:
            attrs["config_json"] = self.config_json
        if rng_key is not None:
            # stored as a native h5py array attribute (uint32 key data)
            attrs["rng_key"] = np.asarray(rng_key)
        path = self.snapshot_path(index)
        data, aux_np, attrs_np = _materialize(state, aux, attrs)
        if self._pool is None:
            return _write_file(path, data, aux_np, integrator_kind,
                               self.units, attrs_np)
        # reap already-completed writes first: a failed write (disk
        # full, permissions) must surface at the NEXT snapshot, not hours
        # later at the end-of-run flush
        for fut in [f for f in self._pending if f.done()]:
            self._pending.remove(fut)
            fut.result()  # re-raises the write error, if any
        fut = self._pool.submit(_write_file, path, data, aux_np,
                                integrator_kind, self.units, attrs_np)
        self._pending.append(fut)
        return path

    def flush(self) -> None:
        """Wait for ALL queued snapshot writes, then re-raise the first
        error (re-raising eagerly would abandon later futures mid-write —
        e.g. the emergency snapshot queued after a NaN abort)."""
        pending, self._pending = self._pending, []
        first_err = None
        for fut in pending:
            try:
                fut.result()
            except BaseException as e:  # noqa: BLE001 — re-raised below
                first_err = first_err or e
        if first_err is not None:
            raise first_err

    def append_diagnostics(self, row: dict) -> None:
        with h5py.File(self._diag_path, "a") as f:
            # columns appearing mid-series (resume across a code version
            # that added diagnostics) are NaN-backfilled, and columns the
            # current row does NOT carry (a flag turned off on resume) are
            # NaN-padded — every dataset leaves this call at the same
            # length, so the whole table stays row-aligned in time
            n_prev = max((f[k].shape[0] for k in f.keys()), default=0)
            for k, v in row.items():
                v = np.asarray(jax.device_get(v), np.float64)
                if k not in f:
                    d = f.create_dataset(k, shape=(n_prev,), maxshape=(None,),
                                         dtype=np.float64, chunks=(256,))
                    if n_prev:
                        d[:] = np.nan
                d = f[k]
                n0 = d.shape[0]
                d.resize((n_prev + 1,))
                if n0 < n_prev:   # legacy misaligned table: NaN the gap
                    d[n0:n_prev] = np.nan
                d[-1] = float(v)
            for k in f.keys():
                if k not in row:
                    d = f[k]
                    n0 = d.shape[0]
                    if n0 < n_prev + 1:
                        d.resize((n_prev + 1,))
                        d[n0:] = np.nan

    def truncate_diagnostics(self, t_resume: float, atol: float = 1e-9) -> None:
        """Drop rows with time >= t_resume (strictly before the resume time).

        A crash (or a resume from an older snapshot) leaves diagnostics rows
        written AFTER the checkpoint being restored; without truncation the
        resumed run re-appends overlapping times and the series becomes
        non-monotonic (ADVICE round-1, medium). The resumed driver re-emits
        its own row at t_resume, so rows at >= t_resume - atol are dropped.
        """
        if not os.path.exists(self._diag_path):
            return
        try:
            f = h5py.File(self._diag_path, "a")
        except OSError:
            # diagnostics.h5 is mutated in place (unlike the atomic
            # snapshots), so a crash mid-append can corrupt it; the
            # snapshot checkpoint is the authoritative state, so resume
            # must proceed — move the corrupt table aside and start fresh
            corrupt = self._diag_path + ".corrupt"
            os.replace(self._diag_path, corrupt)
            print(f"warning: diagnostics table unreadable; moved to "
                  f"{corrupt} (resume continues from the snapshot)")
            return
        with f:
            if "time" not in f:
                return
            t = np.asarray(f["time"])
            mask = t < t_resume - atol
            keep = int(mask.nonzero()[0][-1] + 1) if mask.any() else 0
            for k in f.keys():
                d = f[k]
                if d.shape[0] > keep:
                    d.resize((keep,))

    def has_outputs(self) -> bool:
        """True if out_dir holds any diagnostics or snapshot files."""
        if os.path.exists(self._diag_path):
            return True
        return any(
            name.startswith("snapshot_") and name.endswith(".h5")
            for name in os.listdir(self.out_dir))

    def reset_outputs(self) -> None:
        """Remove a previous run's diagnostics and snapshots from out_dir.

        A FRESH (non-resume) run into an existing directory must not leave
        stale artifacts: appended diagnostics rows make the time series
        repeat from t=0 (duplicated times corrupt plots/drift analysis),
        and leftover higher-index ``snapshot_*.h5`` from a longer previous
        run would be picked up by ``latest_snapshot`` on a later --resume,
        silently resuming the OLD run."""
        if os.path.exists(self._diag_path):
            os.remove(self._diag_path)
        for name in os.listdir(self.out_dir):
            if name.startswith("snapshot_") and name.endswith(
                    (".h5", ".h5.tmp")):  # .tmp: orphan of a crashed write
                os.remove(os.path.join(self.out_dir, name))

    def read_diagnostics(self) -> dict:
        out = {}
        if not os.path.exists(self._diag_path):
            return out
        with h5py.File(self._diag_path, "r") as f:
            for k in f.keys():
                out[k] = np.asarray(f[k])
        return out
