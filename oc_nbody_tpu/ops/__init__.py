from oc_nbody_tpu.ops.gravity import (  # noqa: F401
    accel,
    accel_jerk,
    accel_potential,
    accel_direct,
    accel_jerk_direct,
    accel_potential_direct,
)
