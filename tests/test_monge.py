"""Monge-metric integrator tests (reference ``monge/monge.py``),
asserting the invariants the reference only checks by commented-out
code and print statements (``monge.py:326-352``)."""

import jax
import jax.numpy as jnp
import numpy as np

from walnuts_tpu import targets
from walnuts_tpu.ops.monge import (
    monge_eps_int,
    monge_flip,
    monge_hamiltonian,
    monge_init,
    monge_int,
    monge_int_adapt,
)


def _qp(t, C=4, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    q = jax.random.normal(k1, (C, t.dim), jnp.float64)
    p = jax.random.normal(k2, (C, t.dim), jnp.float64)
    return q, p


def test_monge_int_matches_ode_oracle():
    """Small-step explicit integrator tracks the exact Monge ODE."""
    t = targets.corr_gauss(0.95)
    q, p = _qp(t)
    s0 = monge_init(t, q, p)
    T, n = 0.5, 100
    h = jnp.full((4,), T / n, jnp.float64)
    s1, _ = monge_int(t, s0, h, n)
    q_ref, p_ref = monge_int_adapt(t, q, p, T)
    np.testing.assert_allclose(np.asarray(s1.q), np.asarray(q_ref),
                               atol=2e-4)


def test_monge_int_reversibility():
    """Integrate, flip momentum, integrate back: recover the start, and
    the log-Jacobians cancel (``monge.py:336-348`` commented check)."""
    t = targets.corr_gauss(0.95)
    q, p = _qp(t, seed=1)
    s0 = monge_init(t, q, p)
    h = jnp.full((4,), 0.05, jnp.float64)
    s1, lj_f = monge_int(t, s0, h, 10)
    s1b = monge_flip(s1)
    s0b, lj_b = monge_int(t, s1b, h, 10)
    np.testing.assert_allclose(np.asarray(s0b.q), np.asarray(q), atol=1e-8)
    np.testing.assert_allclose(np.asarray(-s0b.p), np.asarray(p), atol=1e-8)
    np.testing.assert_allclose(np.asarray(lj_f + lj_b), 0.0, atol=1e-8)


def test_monge_int_near_energy_conservation():
    t = targets.funnel(2)
    q, p = _qp(t, seed=2)
    q = 0.3 * q
    s0 = monge_init(t, q, p)
    h = jnp.full((4,), 0.02, jnp.float64)
    s1, _ = monge_int(t, s0, h, 50)
    dh = np.asarray(s1.ham - s0.ham)
    assert np.all(np.abs(dh) < 0.05), dh


def test_monge_eps_int_matches_reference_trajectory():
    """Bitwise-level parity with the reference ``mongeEPSInt`` on its
    own driver inputs (``monge.py:326-341``): exact-copy shadow start,
    corrGauss(0.95), h=0.02, omega=1.5, 250 steps.  Expected values
    obtained by running ``/root/reference/monge/monge.py`` directly.
    (The reference's ``|q - qt| < h^2`` check *fails* on this
    trajectory in the reference too — it is a per-proposal acceptance
    filter, not an integrator invariant.)"""
    t = targets.corr_gauss(0.95)
    q0 = jnp.asarray([[-2.0, -1.51]], jnp.float64)
    p0 = jnp.asarray([[-1.0, -1.50]], jnp.float64)
    q, p, qt, pt, ok = monge_eps_int(
        t, q0, p0, qt=q0, pt=p0, h=0.02, omega=1.5, nstep=250)
    np.testing.assert_allclose(np.asarray(q)[0],
                               [2.13718446, 1.91911996], atol=1e-7)
    np.testing.assert_allclose(np.asarray(qt)[0],
                               [1.88302585, 2.36632458], atol=1e-7)
    assert not bool(ok[0])  # diverged shadow, as in the reference


def test_monge_int_matches_reference_trajectory():
    """Parity with the reference ``mongeInt`` on its own driver inputs
    including the accumulated log-Jacobian (``monge.py:344-346``)."""
    t = targets.corr_gauss(0.95)
    q0 = jnp.asarray([[-2.0, -1.51]], jnp.float64)
    p0 = jnp.asarray([[-1.0, -1.50]], jnp.float64)
    s0 = monge_init(t, q0, p0)
    s1, lj = monge_int(t, s0, jnp.asarray([0.02]), 250)
    np.testing.assert_allclose(np.asarray(s1.q)[0],
                               [1.86486815, 2.07857073], atol=1e-7)
    np.testing.assert_allclose(float(lj[0]), 0.00174216792, atol=1e-9)


def test_monge_eps_reversibility():
    t = targets.corr_gauss(0.95)
    q, p = _qp(t, seed=4)
    h, n = 0.05, 20
    q2, p2, qt2, pt2, _ = monge_eps_int(
        t, q, p, key=jax.random.PRNGKey(1), h=h, omega=1.5, nstep=n)
    qb, pb, qtb, ptb, _ = monge_eps_int(
        t, q2, -p2, qt=qt2, pt=-pt2, h=h, omega=1.5, nstep=n)
    # reversal works up to the (non-reversible) harmonic rotation sign;
    # the reference checks this manually (``monge.py:337``): going back
    # with flipped momenta returns to the start
    np.testing.assert_allclose(np.asarray(qb), np.asarray(q), atol=1e-6)
    np.testing.assert_allclose(np.asarray(-pb), np.asarray(p), atol=1e-6)
