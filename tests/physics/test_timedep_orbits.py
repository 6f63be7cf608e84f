"""Physics validation of time-dependent external fields.

1. Jacobi-integral conservation in a rotating-pattern field (the CR3BP
   secondary as a MovingCenter on a CircularTrajectory): E and L_z drift,
   E_J = E − ω L_z must not (diagnostics.jacobi_energy).
2. Representation consistency: MovingCenter(PointMass, circular) ≡
   Rotating(displaced PointMass) — two independent code paths for the
   same physical field.
3. Order of convergence against a fine-dt reference trajectory in a
   moving field: KDK 2nd order, Hermite-4 4th order. These FAIL if a
   stepper binds the wrong evaluation time (e.g. step start instead of
   step end), which would degrade both to 1st order — the sharp test of
   the at_time threading.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from oc_nbody_tpu import diagnostics
from oc_nbody_tpu.forces import make_force_model
from oc_nbody_tpu.integrators.hermite import Hermite4
from oc_nbody_tpu.integrators.leapfrog import LeapfrogKDK
from oc_nbody_tpu.models import potentials as P
from oc_nbody_tpu.state import ParticleState


def _test_particles(pos, vel):
    pos = jnp.asarray(pos, jnp.float64)
    vel = jnp.asarray(vel, jnp.float64)
    n = pos.shape[0]
    return ParticleState(
        pos=pos, vel=vel,
        mass=jnp.full((n,), 1e-12, jnp.float64),   # massless tracers
        ids=jnp.arange(n, dtype=jnp.int64),
        time=jnp.asarray(0.0, jnp.float64))


def _cr3bp_field():
    """Primary GM=1 at the origin + secondary GM=0.05 on a circular orbit
    of radius 2 at its Kepler rate — static in the ω-rotating frame."""
    gm1, gm2, R = 1.0, 0.05, 2.0
    om = float(np.sqrt((gm1 + gm2) / R**3))
    sec = P.MovingCenter(
        base=P.PlummerSphere(GM=jnp.asarray(gm2), b=jnp.asarray(0.05)),
        trajectory=P.CircularTrajectory(radius=jnp.asarray(R),
                                        omega=jnp.asarray(om)))
    field = P.composite([P.PointMass(GM=jnp.asarray(gm1)), sec])
    return field, om, R


def test_moving_center_equals_rotating_representation(key):
    """The same physical field built two ways must agree exactly."""
    field, om, R = _cr3bp_field()
    # representation 2: the secondary as a displaced STATIC potential
    # rotated at the pattern speed
    sec_static = P.MovingCenter(   # time-frozen displacement via t=0 bind?
        base=P.PlummerSphere(GM=jnp.asarray(0.05), b=jnp.asarray(0.05)),
        trajectory=P.LinearTrajectory(x0=jnp.asarray([R, 0.0, 0.0]),
                                      v0=jnp.zeros(3)))
    rot = P.Rotating(base=P.composite(
        [P.PointMass(GM=jnp.asarray(1.0)), sec_static.at(0.0)]),
        omega_p=jnp.asarray(om))
    xyz = 1.5 * jax.random.normal(key, (32, 3), jnp.float64)
    for t in (0.0, 0.83, 2.9):
        np.testing.assert_allclose(
            np.asarray(field.at(t).phi(xyz)),
            np.asarray(rot.at(t).phi(xyz)), rtol=1e-12)
        np.testing.assert_allclose(
            np.asarray(field.at(t).accel(xyz)),
            np.asarray(rot.at(t).accel(xyz)), rtol=1e-10, atol=1e-13)


def test_jacobi_integral_conserved_cr3bp():
    field, om, R = _cr3bp_field()
    force = make_force_model(eps=1e-4, G=1.0, external=field, backend="jnp")
    # tracers on eccentric-ish orbits well inside the secondary's orbit
    st = _test_particles(
        pos=[[0.8, 0.0, 0.0], [0.0, 1.1, 0.1], [-0.6, -0.5, 0.0]],
        vel=[[0.0, 1.2, 0.0], [-0.85, 0.0, 0.05], [0.7, -0.7, 0.0]])
    dt = 2e-3
    kdk = LeapfrogKDK(force=force, dt=dt)
    c = kdk.init(st)
    ej0 = float(diagnostics.jacobi_energy(st, force, om))
    e0 = float(diagnostics.energies(st, force)["E_tot"])
    ejs, es = [], []
    step = jax.jit(lambda c: kdk.advance(c, 250))
    for _ in range(8):                      # t = 0 .. 4 (≈ pattern period)
        c = step(c)
        ejs.append(float(diagnostics.jacobi_energy(c.state, force, om)))
        es.append(float(diagnostics.energies(c.state, force)["E_tot"]))
    scale = abs(ej0)
    ej_drift = max(abs(e - ej0) for e in ejs) / scale
    e_drift = max(abs(e - e0) for e in es) / scale
    # the raw energy swings by orders of magnitude more than E_J
    assert ej_drift < 5e-6, ej_drift
    assert e_drift > 100 * ej_drift, (e_drift, ej_drift)


def _moving_plummer_force():
    mov = P.MovingCenter(
        base=P.PlummerSphere(GM=jnp.asarray(4.0), b=jnp.asarray(0.6)),
        trajectory=P.LinearTrajectory(x0=jnp.asarray([-2.0, 0.6, 0.0]),
                                      v0=jnp.asarray([1.5, -0.3, 0.2])))
    return make_force_model(eps=1e-4, G=1.0, external=mov, backend="jnp")


def _endpoint_error(make_carry, advance, dts, t_end, ref_dt):
    """Endpoint position error at t_end vs a ref_dt reference."""
    def run(dt):
        c = make_carry(dt)
        c = advance(c, dt, int(round(t_end / dt)))
        return np.asarray(c.state.pos)

    ref = run(ref_dt)
    return [float(np.max(np.abs(run(dt) - ref))) for dt in dts]


def test_kdk_second_order_in_moving_field():
    force = _moving_plummer_force()
    st = _test_particles(pos=[[0.5, 0.2, -0.1]], vel=[[0.3, 0.8, 0.1]])
    t_end = 0.5

    def make(dt):
        return LeapfrogKDK(force=force, dt=dt).init(st)

    def adv(c, dt, n):
        return jax.jit(LeapfrogKDK(force=force, dt=dt).advance,
                       static_argnums=1)(c, n)

    errs = _endpoint_error(make, adv, [1e-2, 5e-3, 2.5e-3], t_end, 1e-4)
    order01 = np.log2(errs[0] / errs[1])
    order12 = np.log2(errs[1] / errs[2])
    assert 1.7 < order01 < 2.3, (errs, order01)
    assert 1.7 < order12 < 2.3, (errs, order12)


def test_hermite_fourth_order_in_moving_field():
    force = _moving_plummer_force()
    st = _test_particles(pos=[[0.5, 0.2, -0.1]], vel=[[0.3, 0.8, 0.1]])
    t_end = 0.5

    def make(dt):
        h = Hermite4(force=force, eta=1e12, dt_max=dt)
        c = h.init(st)
        return dataclasses.replace(c, dt=jnp.asarray(dt, jnp.float64))

    def adv(c, dt, n):
        return jax.jit(Hermite4(force=force, eta=1e12, dt_max=dt).advance,
                       static_argnums=1)(c, n)

    errs = _endpoint_error(make, adv, [2e-2, 1e-2, 5e-3], t_end, 1e-3)
    order01 = np.log2(errs[0] / errs[1])
    order12 = np.log2(errs[1] / errs[2])
    assert 3.4 < order01 < 4.6, (errs, order01)
    assert 3.4 < order12 < 4.6, (errs, order12)
