from oc_nbody_tpu.io.snapshot import (  # noqa: F401
    Snapshot,
    SnapshotWriter,
    read_snapshot,
    write_snapshot,
    latest_snapshot,
)
