from oc_nbody_tpu.utils.units import UnitSystem  # noqa: F401
