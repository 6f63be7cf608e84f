"""Time-dependent external potentials (models/potentials.py TD section).

Covers: the at(t)/Bound binding contract, the wrapper models
(MovingCenter, Rotating, Ramped, LongMuraliBar), the exact ∂a/∂t term in
accel_jerk_ext, and the integrator threading (every stepper binds the
physical time of each force evaluation).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oc_nbody_tpu.forces import make_force_model
from oc_nbody_tpu.models import potentials as P
from oc_nbody_tpu.models.plummer import plummer


def _points(key, n=64, scale=3.0):
    return scale * jax.random.normal(key, (n, 3), jnp.float64)


# ---------------------------------------------------------------------------
# binding contract
# ---------------------------------------------------------------------------

def test_static_at_is_identity(key):
    mw = P.milky_way(G=1.0)
    assert mw.at(2.5) is mw
    pm = P.PointMass(GM=jnp.asarray(1.0))
    assert pm.at(0.0) is pm


def test_unbound_time_dependent_raises(key):
    td = P.Rotating(base=P.milky_way(G=1.0), omega_p=jnp.asarray(0.1))
    xyz = _points(key)
    with pytest.raises(TypeError, match="bind an evaluation time"):
        td.phi(xyz)
    with pytest.raises(TypeError, match="bind an evaluation time"):
        td.accel(xyz)


def test_bound_rebind_and_leaf(key):
    td = P.Ramped(base=P.PointMass(GM=jnp.asarray(1.0)),
                  t0=jnp.asarray(0.0), t1=jnp.asarray(1.0))
    b = td.at(0.25)
    assert isinstance(b, P.Bound)
    b2 = b.at(0.75)
    assert isinstance(b2, P.Bound) and float(b2.t) == 0.75
    # t flows through jit as a leaf: one trace serves every bound time
    traces = []

    @jax.jit
    def phi_at(bound, xyz):
        traces.append(1)
        return bound.phi(xyz)

    xyz = _points(key, 8)
    p1 = phi_at(td.at(0.25), xyz)
    p2 = phi_at(td.at(0.75), xyz)
    assert len(traces) == 1
    assert not np.allclose(np.asarray(p1), np.asarray(p2))


def test_composite_binds_components(key):
    mw = P.milky_way(G=1.0)
    bar = P.Rotating(base=P.LongMuraliBar(
        GM=jnp.asarray(0.5), a=jnp.asarray(2.0), b=jnp.asarray(0.5),
        c=jnp.asarray(0.3)), omega_p=jnp.asarray(0.2))
    comp = P.composite([mw, bar])
    assert comp.at(0.0) is not comp          # has a TD component: rebuilt
    assert mw.at(1.0) is mw                  # all-static composite: identity
    xyz = _points(key, 16)
    b = comp.at(1.3)
    want = mw.phi(xyz) + bar.at(1.3).phi(xyz)
    np.testing.assert_allclose(np.asarray(b.phi(xyz)), np.asarray(want),
                               rtol=1e-12)


# ---------------------------------------------------------------------------
# wrapper models
# ---------------------------------------------------------------------------

def test_moving_center_matches_shifted_static(key):
    base = P.PlummerSphere(GM=jnp.asarray(2.0), b=jnp.asarray(0.5))
    traj = P.LinearTrajectory(x0=jnp.asarray([1.0, -2.0, 0.5]),
                              v0=jnp.asarray([0.3, 0.1, -0.2]))
    mov = P.MovingCenter(base=base, trajectory=traj)
    xyz = _points(key, 32)
    for t in (0.0, 1.7, -3.2):
        c = traj(jnp.asarray(t))
        np.testing.assert_allclose(np.asarray(mov.at(t).phi(xyz)),
                                   np.asarray(base.phi(xyz - c)), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(mov.at(t).accel(xyz)),
                                   np.asarray(base.accel(xyz - c)),
                                   rtol=1e-12)


def test_circular_trajectory_geometry():
    traj = P.CircularTrajectory(radius=jnp.asarray(2.0),
                                omega=jnp.asarray(0.5),
                                phase=jnp.asarray(0.0),
                                z0=jnp.asarray(0.25))
    c0 = np.asarray(traj(jnp.asarray(0.0)))
    np.testing.assert_allclose(c0, [2.0, 0.0, 0.25], atol=1e-14)
    # quarter turn: omega*t = pi/2
    cq = np.asarray(traj(jnp.asarray(np.pi)))
    np.testing.assert_allclose(cq, [0.0, 2.0, 0.25], atol=1e-12)
    # radius preserved at arbitrary t
    ct = np.asarray(traj(jnp.asarray(1.234)))
    np.testing.assert_allclose(np.hypot(ct[0], ct[1]), 2.0, rtol=1e-14)


def test_rotating_axisymmetric_is_static(key):
    """Rotating an axisymmetric field is a no-op — phi/accel invariant."""
    mw = P.milky_way(G=1.0)
    rot = P.Rotating(base=mw, omega_p=jnp.asarray(0.37))
    xyz = _points(key, 32)
    for t in (0.0, 2.1, 9.9):
        np.testing.assert_allclose(np.asarray(rot.at(t).phi(xyz)),
                                   np.asarray(mw.phi(xyz)), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(rot.at(t).accel(xyz)),
                                   np.asarray(mw.accel(xyz)), rtol=1e-11,
                                   atol=1e-14)


def test_rotating_rotates_pattern(key):
    """Rotating(bar) at time t equals the static bar evaluated on
    back-rotated coordinates, with the acceleration rotated forward."""
    bar = P.LongMuraliBar(GM=jnp.asarray(1.0), a=jnp.asarray(2.0),
                          b=jnp.asarray(0.5), c=jnp.asarray(0.3))
    om = 0.7
    rot = P.Rotating(base=bar, omega_p=jnp.asarray(om))
    xyz = _points(key, 32)
    t = 1.9
    ang = om * t
    c, s = np.cos(ang), np.sin(ang)
    R = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    x_pat = np.asarray(xyz) @ R  # == R^T x: inertial -> pattern frame
    np.testing.assert_allclose(np.asarray(rot.at(t).phi(xyz)),
                               np.asarray(bar.phi(jnp.asarray(x_pat))),
                               rtol=1e-12)
    a_pat = np.asarray(bar.accel(jnp.asarray(x_pat)))
    np.testing.assert_allclose(np.asarray(rot.at(t).accel(xyz)),
                               a_pat @ R.T, rtol=1e-10, atol=1e-14)


def test_ramp_endpoints_and_smoothness():
    td = P.Ramped(base=P.PointMass(GM=jnp.asarray(1.0)),
                  t0=jnp.asarray(1.0), t1=jnp.asarray(3.0))
    amp = lambda t: float(td.amplitude(jnp.asarray(t)))
    assert amp(0.0) == 0.0 and amp(1.0) == 0.0
    assert amp(3.0) == 1.0 and amp(99.0) == 1.0
    assert abs(amp(2.0) - 0.5) < 1e-14
    # C^1 at the ends: dA/dt -> 0
    g = jax.grad(lambda t: td.amplitude(t))
    assert abs(float(g(jnp.asarray(1.0)))) < 1e-12
    assert abs(float(g(jnp.asarray(3.0)))) < 1e-12
    # monotone increasing inside
    ts = np.linspace(1.0, 3.0, 41)
    amps = [amp(t) for t in ts]
    assert all(b >= a for a, b in zip(amps, amps[1:]))


def test_long_murali_bar_limits(key):
    """Far field tends to the point mass; accel is -grad phi (autodiff
    consistency is by construction, so check Newton's-3rd-law symmetry
    of the x-axis endpoints instead)."""
    bar = P.LongMuraliBar(GM=jnp.asarray(1.0), a=jnp.asarray(1.0),
                          b=jnp.asarray(0.2), c=jnp.asarray(0.1))
    far = jnp.asarray([[120.0, 40.0, 15.0]])
    r = float(jnp.linalg.norm(far))
    np.testing.assert_allclose(float(bar.phi(far)[0]), -1.0 / r, rtol=2e-4)
    # x -> -x symmetry of the needle
    xyz = _points(key, 16)
    flip = xyz * jnp.asarray([-1.0, 1.0, 1.0])
    np.testing.assert_allclose(np.asarray(bar.phi(flip)),
                               np.asarray(bar.phi(xyz)), rtol=1e-12)


# ---------------------------------------------------------------------------
# exact external jerk: (v·∇)a + ∂a/∂t
# ---------------------------------------------------------------------------

def test_accel_jerk_ext_matches_finite_difference(key):
    base = P.PlummerSphere(GM=jnp.asarray(3.0), b=jnp.asarray(0.7))
    mov = P.MovingCenter(base=base, trajectory=P.LinearTrajectory(
        x0=jnp.asarray([0.5, 0.0, -0.2]), v0=jnp.asarray([1.0, -0.5, 0.3])))
    pos = _points(key, 16, scale=2.0)
    vel = 0.5 * jax.random.normal(jax.random.fold_in(key, 1), pos.shape,
                                  jnp.float64)
    t0 = 0.8
    a, adot = mov.at(t0).accel_jerk_ext(pos, vel)
    np.testing.assert_allclose(np.asarray(a),
                               np.asarray(mov.at(t0).accel(pos)), rtol=1e-12)
    # centred finite difference along the trajectory x(t), field at time t
    h = 1e-6
    ap = mov.at(t0 + h).accel(pos + h * vel)
    am = mov.at(t0 - h).accel(pos - h * vel)
    fd = (np.asarray(ap) - np.asarray(am)) / (2 * h)
    np.testing.assert_allclose(np.asarray(adot), fd, rtol=1e-6, atol=1e-8)


def test_composite_accel_jerk_ext_keeps_dt_term(key):
    """A Composite mixing static + time-bound members must NOT drop the
    moving member's ∂a/∂t: the inherited pos-only jvp would (the bound t
    is a fixed leaf of the composite), which is exactly how every
    config-built perturber/bar reaches Hermite/block steppers
    (scene.build_scene composes with the host potential)."""
    mw = P.milky_way(G=1.0)
    mov = P.MovingCenter(
        base=P.PlummerSphere(GM=jnp.asarray(3.0), b=jnp.asarray(0.7)),
        trajectory=P.LinearTrajectory(
            x0=jnp.asarray([7.5, 0.0, -0.2]), v0=jnp.asarray([1.0, -0.5, 0.3])))
    comp = P.composite([mw, mov])
    pos = _points(key, 16, scale=1.0) + jnp.asarray([8.0, 0.0, 0.0])
    vel = 0.5 * jax.random.normal(jax.random.fold_in(key, 3), pos.shape,
                                  jnp.float64)
    t0 = 0.8
    a, adot = comp.at(t0).accel_jerk_ext(pos, vel)
    np.testing.assert_allclose(np.asarray(a),
                               np.asarray(comp.at(t0).accel(pos)), rtol=1e-12)
    # exact reference: jvp over the JOINT (pos, t) — the true total
    # derivative along the trajectory (FD at h=1e-6 has ~1e-4 truncation
    # noise near the perturber, so compare exactly instead)
    aref, jref = jax.jvp(lambda p, t: comp.at(t).accel(p),
                         (pos, jnp.asarray(t0)),
                         (vel, jnp.asarray(1.0)))
    np.testing.assert_allclose(np.asarray(adot), np.asarray(jref),
                               rtol=1e-12, atol=0.0)
    # and the sum really contains the dt term: the pos-only jvp differs
    pos_only = jax.jvp(comp.at(t0).accel, (pos,), (vel,))[1]
    assert float(jnp.max(jnp.abs(adot - pos_only))) > 1e-3


def test_static_accel_jerk_ext_unchanged(key):
    """For static fields accel_jerk_ext is exactly the old (v·∇)a jvp."""
    mw = P.milky_way(G=1.0)
    pos = _points(key, 16, scale=5.0) + jnp.asarray([8.0, 0.0, 0.0])
    vel = 0.1 * jax.random.normal(jax.random.fold_in(key, 2), pos.shape,
                                  jnp.float64)
    a, adot = mw.accel_jerk_ext(pos, vel)
    a_ref, adot_ref = jax.jvp(mw.accel, (pos,), (vel,))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(a_ref))
    np.testing.assert_array_equal(np.asarray(adot), np.asarray(adot_ref))


# ---------------------------------------------------------------------------
# ForceModel / integrator threading
# ---------------------------------------------------------------------------

def _flyby_force(eps=1.0 / 64, backend="jnp", GM=5.0, speed=4.0):
    """A fast Plummer-softened perturber sweeping past the origin."""
    mov = P.MovingCenter(
        base=P.PlummerSphere(GM=jnp.asarray(GM), b=jnp.asarray(0.5)),
        trajectory=P.LinearTrajectory(x0=jnp.asarray([-6.0, 1.5, 0.0]),
                                      v0=jnp.asarray([speed, 0.0, 0.0])))
    return make_force_model(eps=eps, G=1.0, external=mov, backend=backend)


def test_force_model_at_time_binds_external(key):
    f = _flyby_force()
    state = plummer(128, key)
    f0 = f.at_time(0.0)
    f1 = f.at_time(1.5)
    a0 = f0.accel(state.pos, state.mass)
    a1 = f1.accel(state.pos, state.mass)
    assert not np.allclose(np.asarray(a0), np.asarray(a1))
    # pairwise part identical; difference is exactly the external field
    d = np.asarray(a1 - a0)
    ext = f.external
    want = np.asarray(ext.at(1.5).accel(state.pos)
                      - ext.at(0.0).accel(state.pos))
    np.testing.assert_allclose(d, want, rtol=1e-10, atol=1e-12)
    # static force: at_time is identity (no pytree churn in hot loops)
    fs = make_force_model(eps=1.0 / 64, backend="jnp")
    assert fs.at_time(3.0) is fs


def test_unbound_eval_through_force_model_raises(key):
    """Calling a TD-external force without a time is a loud error."""
    f = _flyby_force()
    state = plummer(32, key)
    with pytest.raises(TypeError, match="bind an evaluation time"):
        f.accel(state.pos, state.mass)


def test_kdk_step_times_flyby(key):
    """KDK with a moving perturber: the cached closing acceleration of
    step k equals a fresh evaluation at the post-step state and time."""
    from oc_nbody_tpu.integrators.leapfrog import LeapfrogKDK
    f = _flyby_force()
    st = plummer(64, key)
    kdk = LeapfrogKDK(force=f, dt=1.0 / 64)
    c = jax.jit(kdk.step)(kdk.init(st))
    c = jax.jit(kdk.step)(c)
    want = f.at_time(c.state.time).accel(c.state.pos, c.state.mass)
    np.testing.assert_allclose(np.asarray(c.acc), np.asarray(want),
                               rtol=1e-12)


def test_hermite_step_times_flyby(key):
    from oc_nbody_tpu.integrators.hermite import Hermite4
    f = _flyby_force()
    st = plummer(64, key)
    herm = Hermite4(force=f, eta=0.01)
    c = herm.init(st)
    c = jax.jit(herm.step)(c)
    # carried acc was evaluated at (corrected state? no: predicted state,
    # end time) — just pin finiteness + that time advanced and the carried
    # acc is closer to the end-time field than the start-time field
    assert bool(jnp.all(jnp.isfinite(c.state.pos)))
    a_t1 = f.at_time(c.state.time).accel_jerk(c.state.pos, c.state.vel,
                                              c.state.mass)[0]
    a_t0 = f.at_time(0.0).accel_jerk(c.state.pos, c.state.vel,
                                     c.state.mass)[0]
    err_t1 = float(jnp.max(jnp.abs(c.acc - a_t1)))
    err_t0 = float(jnp.max(jnp.abs(c.acc - a_t0)))
    assert err_t1 < err_t0


def test_block_matches_hermite_on_flyby(key):
    """Block-timestep integration under a TD field stays consistent with
    the shared-dt Hermite when every particle is forced onto one rung."""
    import dataclasses
    from oc_nbody_tpu.integrators.block import BlockHermite
    from oc_nbody_tpu.integrators.hermite import Hermite4
    f = _flyby_force()
    st = plummer(48, jax.random.fold_in(key, 7))
    dt = 1.0 / 256
    herm = Hermite4(force=f, eta=1e12, dt_max=dt)
    blk = BlockHermite(force=f, eta=1e12, dt_max=dt, n_levels=1,
                       n_buckets=0)
    hc = herm.init(st)
    hc = dataclasses.replace(hc, dt=jnp.asarray(dt, jnp.float64))
    bc = blk.init(st)
    hc = jax.jit(herm.advance, static_argnums=1)(hc, 8)
    bc = jax.jit(blk.advance, static_argnums=1)(bc, 8)
    np.testing.assert_allclose(np.asarray(bc.state.pos),
                               np.asarray(hc.state.pos), rtol=0, atol=1e-13)
    np.testing.assert_allclose(np.asarray(bc.state.vel),
                               np.asarray(hc.state.vel), rtol=0, atol=1e-13)


def test_sharded_force_at_time(key):
    """ShardedForce with a TD external on the emulated mesh equals the
    single-chip ForceModel at the same bound time."""
    from oc_nbody_tpu.parallel import make_mesh, make_sharded_force
    mesh = make_mesh(8)
    ext = _flyby_force().external
    sf = make_sharded_force(eps=1.0 / 64, G=1.0, external=ext, mesh=mesh,
                            mode="ring", backend="jnp")
    f = make_force_model(eps=1.0 / 64, G=1.0, external=ext, backend="jnp")
    st = plummer(128, key)
    t = 1.25
    acc_sh = jax.jit(sf.at_time(t).accel)(st.pos, st.mass)
    acc_1c = f.at_time(t).accel(st.pos, st.mass)
    # f32 pairwise part: sharded ring vs single-chip differ in summation
    # order (measured ~3e-5 rel at 128 bodies); the TD external is f64
    scale = float(jnp.max(jnp.abs(acc_1c)))
    np.testing.assert_allclose(np.asarray(acc_sh), np.asarray(acc_1c),
                               rtol=2e-4, atol=1e-6 * scale)


def test_diagnostics_bind_time(key):
    """energies() on a TD field reports the instantaneous E_ext(t)."""
    from oc_nbody_tpu import diagnostics
    f = _flyby_force()
    st = plummer(64, key)
    e0 = diagnostics.energies(st.replace(time=jnp.asarray(0.0)), f)
    e1 = diagnostics.energies(st.replace(time=jnp.asarray(1.5)), f)
    assert float(e0["E_ext"]) != float(e1["E_ext"])
    ext = f.external
    m = st.mass.astype(jnp.float64)
    want0 = float(jnp.sum(m * ext.at(0.0).phi(st.pos)))
    np.testing.assert_allclose(float(e0["E_ext"]), want0, rtol=1e-10)


def test_energy_balance_equals_field_work(key):
    """Global physics contract of the whole TD machinery: with a moving
    external field, dE_tot/dt = Σᵢ mᵢ ∂φ/∂t(xᵢ, t) — the work done BY the
    field. Integrate a KDK run and compare the measured ΔE_tot against
    the midpoint-rule integral of the analytic power (both O(dt²))."""
    from oc_nbody_tpu import diagnostics
    from oc_nbody_tpu.integrators.leapfrog import LeapfrogKDK

    f = _flyby_force(speed=4.0)
    st = plummer(64, key)
    dt = 1.0 / 256
    kdk = LeapfrogKDK(force=f, dt=dt)
    step = jax.jit(kdk.step)

    def e_tot(state):
        return float(diagnostics.energies(state, f)["E_tot"])

    def power(pos, mass, t):
        # Σ m ∂φ/∂t at fixed positions — exact via jvp over t
        g = lambda tt: jnp.sum(mass * f.external.at(tt).phi(pos))
        return float(jax.jvp(g, (jnp.asarray(t, jnp.float64),),
                             (jnp.asarray(1.0, jnp.float64),))[1])

    c = kdk.init(st)
    e0 = e_tot(c.state)
    work = 0.0
    n_steps = 96
    for _ in range(n_steps):
        x_prev = c.state.pos
        t_prev = float(c.state.time)
        c = step(c)
        x_mid = 0.5 * (x_prev + c.state.pos)
        work += dt * power(x_mid, c.state.mass, t_prev + 0.5 * dt)
    dE = e_tot(c.state) - e0
    # the field actually did work (non-trivial test) ...
    assert abs(dE) > 1e-6
    # ... and the books balance to integrator order
    assert abs(dE - work) < 0.02 * abs(dE) + 1e-8
