"""The driver entry points must work on the emulated mesh (SURVEY.md §4.3)."""
import sys

import jax
import pytest

sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (emulated) devices"
)


def test_dryrun_multichip_8():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    leaves = jax.tree_util.tree_leaves(out)
    assert all(bool(jax.numpy.all(jax.numpy.isfinite(x))) for x in leaves
               if hasattr(x, "dtype") and x.dtype.kind == "f")
