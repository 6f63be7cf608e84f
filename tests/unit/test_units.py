import math

import pytest

from oc_nbody_tpu.utils.units import (
    G_PC_KMS2_PER_MSUN,
    G_PC_MYR_MSUN,
    KMS_IN_PC_PER_MYR,
    UnitSystem,
)


def test_constants():
    assert G_PC_KMS2_PER_MSUN == pytest.approx(4.3009e-3, rel=1e-3)
    assert KMS_IN_PC_PER_MYR == pytest.approx(1.02271, rel=1e-4)
    assert G_PC_MYR_MSUN == pytest.approx(4.4985e-3, rel=1e-3)


def test_henon_G_is_one():
    us = UnitSystem.henon(mass_msun=1.0e4, length_pc=3.0)
    assert us.G == pytest.approx(1.0, rel=1e-12)


def test_physical_G():
    us = UnitSystem.physical()
    assert us.G == pytest.approx(G_PC_MYR_MSUN, rel=1e-12)


def test_velocity_consistency():
    us = UnitSystem.henon(mass_msun=500.0, length_pc=1.3)
    # velocity unit in pc/Myr must equal length/time
    assert us.velocity_kms * KMS_IN_PC_PER_MYR == pytest.approx(
        us.length_pc / us.time_myr, rel=1e-12
    )


def test_round_trip():
    us = UnitSystem.henon(mass_msun=1e3, length_pc=2.0)
    for kind, val in [("length", 7.5), ("mass", 123.0), ("time", 42.0),
                      ("velocity", 3.3), ("energy", 9.9)]:
        assert us.to_code(us.to_physical(val, kind), kind) == pytest.approx(val)


def test_known_scaling():
    # M=1e3 Msun, L=1 pc: t = sqrt(1 / (G*1e3)) Myr
    us = UnitSystem.henon(mass_msun=1e3, length_pc=1.0)
    assert us.time_myr == pytest.approx(math.sqrt(1.0 / (G_PC_MYR_MSUN * 1e3)), rel=1e-12)


def test_dict_round_trip():
    us = UnitSystem.henon(mass_msun=1e3, length_pc=2.0)
    us2 = UnitSystem.from_dict(us.as_dict())
    assert us2 == us
