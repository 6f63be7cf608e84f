"""Block timesteps resolve an embedded hard binary on deep rungs.

The use case individual timesteps exist for (SURVEY.md §2.9c): a tight
pair's internal timescale is ~100x shorter than the cluster's, and a
shared-dt scheme would drag all N particles down to it. The block stepper
must (a) put the two binary members on much shorter rungs than the rest,
(b) keep the binary's internal orbit accurate while the cluster advances
on long rungs.
"""
import jax
import jax.numpy as jnp
import numpy as np

from oc_nbody_tpu.forces import make_force_model
from oc_nbody_tpu.integrators.block import BlockHermite
from oc_nbody_tpu.models.binaries import add_binaries, orbital_elements
from oc_nbody_tpu.models.plummer import plummer


def test_binary_lands_on_deep_rungs():
    state = plummer(64, jax.random.PRNGKey(20))
    pop = add_binaries(state, jax.random.PRNGKey(21), fraction=1.0 / 64,
                       a_min=2e-3, a_max=2e-3, e_max=0.0)
    s = pop.state
    assert s.n == 65
    i, j = int(pop.primary_idx[0]), int(pop.secondary_idx[0])
    gm = float(s.mass[i] + s.mass[j])
    a0 = float(pop.a[0])
    period = 2.0 * np.pi * np.sqrt(a0 ** 3 / gm)  # ~4.5e-3 << t_dyn ~ 1

    force = make_force_model(eps=1e-4, G=1.0, backend="jnp", chunk=64)
    block = BlockHermite(force=force, eta=0.01, dt_max=1.0 / 16,
                         n_levels=10, n_buckets=0)
    carry = block.init(s)

    # (a) scale separation in the assigned rungs, already at startup: the
    # binary members sit on the deepest rung, the TYPICAL cluster member
    # far above (individual core members may start low too — a 64-body
    # core has its own close encounters)
    dt_i = np.asarray(carry.dt_i)
    others = np.delete(dt_i, [i, j])
    assert dt_i[i] == dt_i.min() and dt_i[j] == dt_i.min()
    assert np.median(others) >= 8 * dt_i.min(), (dt_i[i], np.median(others))

    # (b) advance one full block (= dt_max): the binary must complete
    # its orbits without losing its elements; the cluster must have
    # advanced on rungs far above the binary's
    carry = jax.jit(block.advance_to)(carry, 1.0 / 16)
    st = carry.state
    np.testing.assert_allclose(float(st.time), 1.0 / 16, rtol=1e-12)
    a1, e1 = orbital_elements(st.pos[i] - st.pos[j], st.vel[i] - st.vel[j],
                              gm)
    # ~14 periods at eta=0.01: elements preserved to integrator accuracy
    np.testing.assert_allclose(float(a1), a0, rtol=5e-4)
    assert float(e1) < 0.02  # started circular
    # occupancy: both deep and shallow rungs in use simultaneously
    occ = np.asarray(block.rung_occupancy(carry))
    deep = occ[6:].sum()     # dt <= dt_max/64
    shallow = occ[:4].sum()  # dt >= dt_max/8
    assert deep >= 2
    assert shallow >= 40, occ
