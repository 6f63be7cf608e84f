"""Block timesteps on the mesh: replicated active rows x sharded sources
with ICI psum (SURVEY.md §2 EP analog)."""
import jax
import numpy as np
import pytest

from oc_nbody_tpu.forces import make_force_model
from oc_nbody_tpu.integrators.block import BlockHermite
from oc_nbody_tpu.models.plummer import plummer
from oc_nbody_tpu.parallel import make_mesh, make_sharded_force

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (emulated) devices"
)


def test_sharded_block_matches_single():
    state = plummer(96, jax.random.PRNGKey(41))
    mesh = make_mesh(8)
    sf = make_sharded_force(eps=1.0 / 32, mesh=mesh, backend="jnp")
    fm = make_force_model(eps=1.0 / 32, backend="jnp")
    kw = dict(dt_max=1.0 / 32, n_levels=4, eta=0.01, n_buckets=3)

    bs = BlockHermite(force=sf, **kw)
    bf = BlockHermite(force=fm, **kw)
    cs = jax.jit(bs.advance, static_argnums=1)(bs.init(state), 24)
    cf = jax.jit(bf.advance, static_argnums=1)(bf.init(state), 24)

    np.testing.assert_allclose(np.asarray(cs.state.pos),
                               np.asarray(cf.state.pos), atol=1e-9)
    np.testing.assert_array_equal(np.asarray(cs.t_i), np.asarray(cf.t_i))
