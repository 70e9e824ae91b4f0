"""Integrator layer (L1) tests: leapfrog order, reversibility, the
halving-search protocol (If/Ib/lwt semantics), and the R2P Hastings
weight — mirroring the reference's intended invariants
(``WALNUTSpy/adaptiveIntegrators.py:769-790`` commented reversibility
checks; protocol at ``adaptiveIntegrators.py:65-137,361-475``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from walnuts_tpu import targets
from walnuts_tpu.ops.hamiltonian import hamiltonian
from walnuts_tpu.ops.integrators import (
    IntegratorConfig,
    adapt_leapfrog_d,
    adapt_leapfrog_r2p,
    adapt_yoshida_d,
    fixed_leapfrog,
    get_integrator,
)
from walnuts_tpu.ops.leapfrog import (
    PhasePoint,
    leapfrog_step,
    masked_multistep,
    yoshida_step,
)


def _setup(t, C=8, seed=0, dtype=jnp.float64):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    q = jax.random.normal(k1, (C, t.dim), dtype)
    v = jax.random.normal(k2, (C, t.dim), dtype)
    lp, g = t.logp_grad(q)
    return q, v, g, lp


def test_leapfrog_reversibility():
    """Integrate forward n steps, flip velocity, integrate back: recover
    the start to machine precision (symplectic time-reversal)."""
    t = targets.funnel(11)
    q, v, g, lp = _setup(t)
    start = PhasePoint(q, v, g, lp)
    h0 = hamiltonian(lp, v)
    h = jnp.full((8,), 0.01, jnp.float64)
    n = jnp.full((8,), 16, jnp.int32)
    fwd = masked_multistep(t, start, h0, h, n, None, leapfrog_step)
    flipped = PhasePoint(fwd.state.q, -fwd.state.v, fwd.state.g, fwd.state.lp)
    back = masked_multistep(t, flipped, fwd.h_end, h, n, None, leapfrog_step)
    np.testing.assert_allclose(np.asarray(back.state.q), np.asarray(q),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(-back.state.v), np.asarray(v),
                               atol=1e-9)


def test_leapfrog_energy_error_order2():
    """Halving the step size should cut the endpoint energy error ~4x."""
    t = targets.std_gauss(4)
    q, v, g, lp = _setup(t, C=4)
    start = PhasePoint(q, v, g, lp)
    h0 = hamiltonian(lp, v)

    def err(h, n):
        r = masked_multistep(t, start, h0, jnp.full((4,), h, jnp.float64),
                             jnp.full((4,), n, jnp.int32), None, leapfrog_step)
        return np.abs(np.asarray(r.h_end - h0))

    e1 = err(0.1, 8)
    e2 = err(0.05, 16)
    ratio = e1 / np.maximum(e2, 1e-300)
    assert np.all(ratio > 2.5), ratio


def test_yoshida_higher_order_than_leapfrog():
    t = targets.std_gauss(4)
    q, v, g, lp = _setup(t, C=4)
    start = PhasePoint(q, v, g, lp)
    h0 = hamiltonian(lp, v)

    def err(step_fn, h, n):
        r = masked_multistep(t, start, h0, jnp.full((4,), h, jnp.float64),
                             jnp.full((4,), n, jnp.int32), None, step_fn)
        return np.abs(np.asarray(r.h_end - h0))

    # 4th order: halving h cuts endpoint error ~16x
    e1 = err(yoshida_step, 0.2, 4)
    e2 = err(yoshida_step, 0.1, 8)
    assert np.all(e1 / np.maximum(e2, 1e-300) > 8.0)


def test_masked_multistep_zero_steps_passthrough():
    t = targets.std_gauss(3)
    q, v, g, lp = _setup(t, C=4, dtype=jnp.float64)
    start = PhasePoint(q, v, g, lp)
    h0 = hamiltonian(lp, v)
    n = jnp.asarray([0, 3, 0, 5], jnp.int32)
    r = masked_multistep(t, start, h0, jnp.full((4,), 0.1, jnp.float64), n,
                         None, leapfrog_step)
    np.testing.assert_array_equal(np.asarray(r.state.q[0]), np.asarray(q[0]))
    np.testing.assert_array_equal(np.asarray(r.state.q[2]), np.asarray(q[2]))
    assert not np.allclose(np.asarray(r.state.q[1]), np.asarray(q[1]))


def _call(fn, t, q, v, g, lp, h_macro, delta, cfg=IntegratorConfig(),
          seed=0, active=None, xi=None):
    C = q.shape[0]
    h0 = hamiltonian(lp, v)
    if active is None:
        active = jnp.ones((C,), bool)
    if xi is None:
        xi = jnp.ones((C,), q.dtype)
    return fn(jax.random.PRNGKey(seed), t, q, v, g, lp, h0,
              jnp.full((C,), h_macro, q.dtype), xi,
              jnp.full((C,), delta, q.dtype), None, active, cfg)


def test_adapt_d_meets_tolerance():
    """The refinement chosen by the halving search must meet the energy
    tolerance (or sit at max_c)."""
    t = targets.funnel(11)
    q, v, g, lp = _setup(t, C=16, seed=3)
    h0 = hamiltonian(lp, v)
    res = _call(adapt_leapfrog_d, t, q, v, g, lp, 0.4, 0.1)
    err = np.abs(np.asarray(res.h_end - h0))
    at_cap = np.asarray(res.i_f) == IntegratorConfig().max_c
    assert np.all((err < 0.1) | at_cap)


def test_adapt_d_if_minimality():
    """No refinement below If may satisfy the tolerance."""
    t = targets.funnel(11)
    q, v, g, lp = _setup(t, C=16, seed=3)
    h0 = hamiltonian(lp, v)
    res = _call(adapt_leapfrog_d, t, q, v, g, lp, 0.4, 0.1)
    i_f = np.asarray(res.i_f)
    for c_chk in range(int(i_f.max())):
        n = jnp.where(jnp.asarray(i_f) > c_chk, 2 ** c_chk, 0)
        h_micro = jnp.full(q.shape[:1], 0.4, q.dtype) / (2.0 ** c_chk)
        r = masked_multistep(t, PhasePoint(q, v, g, lp), h0, h_micro,
                             n.astype(jnp.int32), None, leapfrog_step)
        err = np.abs(np.asarray(r.h_end - h0))
        checked = i_f > c_chk
        ok = ~np.asarray(r.all_finite) | (err >= 0.1) | ~checked
        assert np.all(ok), (c_chk, err, i_f)


def test_adapt_d_lwt_is_hard_reject_on_asymmetry():
    t = targets.funnel(11)
    q, v, g, lp = _setup(t, C=32, seed=5)
    res = _call(adapt_leapfrog_d, t, q, v, g, lp, 0.8, 0.05)
    lwt = np.asarray(res.lwt)
    i_f, i_b = np.asarray(res.i_f), np.asarray(res.i_b)
    assert np.all(lwt[i_f == i_b] == 0.0)
    assert np.all(lwt[i_f != i_b] < -600.0)


def test_r2p_weight_support():
    """R2P simulates at If or If+1 and lwt = log p(c|Ib) - log p(c|If)."""
    t = targets.funnel(11)
    q, v, g, lp = _setup(t, C=64, seed=9)
    res = _call(adapt_leapfrog_r2p, t, q, v, g, lp, 0.5, 0.1, seed=4)
    c = np.asarray(res.c)
    i_f = np.asarray(res.i_f)
    assert np.all((c == i_f) | (c == i_f + 1))
    lwt = np.asarray(res.lwt)
    i_b = np.asarray(res.i_b)
    p0 = np.log(2.0 / 3.0)
    p1 = np.log(1.0 / 3.0)
    fwd_term = np.where(c == i_f, p0, p1)
    bwd_term = np.where(c == i_b, p0, np.where(c == i_b + 1, p1, -700.0))
    np.testing.assert_allclose(lwt, bwd_term - fwd_term, atol=1e-12)


def test_inactive_chains_frozen():
    t = targets.std_gauss(6)
    q, v, g, lp = _setup(t, C=8)
    active = jnp.asarray([True, False] * 4)
    res = _call(adapt_leapfrog_r2p, t, q, v, g, lp, 0.3, 0.1, active=active)
    idle = ~np.asarray(active)
    np.testing.assert_array_equal(np.asarray(res.q)[idle], np.asarray(q)[idle])
    assert np.all(np.asarray(res.n_eval_f)[idle] == 0)
    assert np.all(np.asarray(res.lwt)[idle] == 0.0)


def test_backward_orientation():
    """xi = -1 must integrate the time-reversed trajectory: the result
    equals the xi=+1 result from (q, -v) with velocity re-flipped."""
    t = targets.funnel(5)
    q, v, g, lp = _setup(t, C=8, seed=11)
    xi_m = -jnp.ones((8,), jnp.float64)
    res_b = _call(adapt_leapfrog_d, t, q, v, g, lp, 0.3, 0.1, xi=xi_m)
    res_f = _call(adapt_leapfrog_d, t, q, -v, g, lp, 0.3, 0.1)
    np.testing.assert_allclose(np.asarray(res_b.q), np.asarray(res_f.q),
                               atol=1e-12)
    # orbit-time orientation: v_b = xi * v_int = -v_int
    np.testing.assert_allclose(np.asarray(res_b.v), -np.asarray(res_f.v),
                               atol=1e-12)


def test_fixed_leapfrog_single_step():
    t = targets.std_gauss(4)
    q, v, g, lp = _setup(t, C=4)
    res = _call(fixed_leapfrog, t, q, v, g, lp, 0.1, 0.1)
    # manual single leapfrog
    vh = v + 0.05 * g
    q2 = q + 0.1 * vh
    lp2, g2 = t.logp_grad(q2)
    v2 = vh + 0.05 * g2
    np.testing.assert_allclose(np.asarray(res.q), np.asarray(q2), atol=1e-14)
    np.testing.assert_allclose(np.asarray(res.v), np.asarray(v2), atol=1e-14)


def test_get_integrator_unknown():
    with pytest.raises(ValueError):
        get_integrator("nope")
