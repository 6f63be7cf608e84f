from oc_nbody_tpu.parallel.mesh import make_mesh  # noqa: F401
from oc_nbody_tpu.parallel.force import ShardedForce, make_sharded_force  # noqa: F401
