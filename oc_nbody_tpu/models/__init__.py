from oc_nbody_tpu.models.plummer import plummer  # noqa: F401
from oc_nbody_tpu.models.imf import kroupa_imf, salpeter_imf  # noqa: F401
