from oc_nbody_tpu.integrators.leapfrog import LeapfrogKDK, KDKCarry  # noqa: F401
from oc_nbody_tpu.integrators.hermite import Hermite4, HermiteCarry  # noqa: F401
