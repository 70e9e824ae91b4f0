"""Isokinetic dynamics and generic-step NUTS tests
(reference ``isokinetic/microCanonical.py``, ``isokinetic/WALNUTS.py``,
MATLAB ``bab_isokinetic.m`` / ``iwalnuts.m``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from walnuts_tpu import targets
from walnuts_tpu.ops.isokinetic import (
    MCState,
    adapt_mc_step_e,
    isokinetic_multistep,
    refresh_u,
    partial_refresh_u,
)
from walnuts_tpu.sampler import (
    HMCKernel,
    IsokineticKernel,
    run_generic_nuts,
)


def _state(t, C=8, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    q = jax.random.normal(k1, (C, t.dim), jnp.float64)
    lp, g = t.logp_grad(q)
    u = refresh_u(k2, q.shape, jnp.float64)
    return MCState(q, u, g, lp)


def test_refresh_unit_norm():
    u = refresh_u(jax.random.PRNGKey(0), (16, 7), jnp.float64)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(u), axis=-1), 1.0,
                               atol=1e-12)
    u2 = partial_refresh_u(jax.random.PRNGKey(1), u, 0.7)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(u2), axis=-1), 1.0,
                               atol=1e-12)


def test_bab_preserves_unit_velocity():
    t = targets.corr_gauss(0.95)
    s = _state(t, C=8)
    r = isokinetic_multistep(t, s, jnp.full((8,), 0.05, jnp.float64),
                             jnp.full((8,), 32, jnp.int32))
    assert np.all(np.asarray(r.all_ok))
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(r.state.u), axis=-1), 1.0, atol=1e-10)


def test_bab_reversibility_with_jacobian_symmetry():
    """Flip u at the endpoint, integrate back: recover the start, and
    the backward log-Jacobian is minus the forward one (the B-kick is
    an exact flow, so the composition is time-reversible)."""
    t = targets.corr_gauss(0.95)
    s = _state(t, C=8, seed=3)
    h = jnp.full((8,), 0.04, jnp.float64)
    n = jnp.full((8,), 16, jnp.int32)
    fwd = isokinetic_multistep(t, s, h, n)
    flipped = fwd.state._replace(u=-fwd.state.u)
    back = isokinetic_multistep(t, flipped, h, n)
    np.testing.assert_allclose(np.asarray(back.state.q), np.asarray(s.q),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(-back.state.u), np.asarray(s.u),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(back.log_jac),
                               -np.asarray(fwd.log_jac), atol=1e-9)


def test_bab_zero_steps_passthrough():
    t = targets.std_gauss(5)
    s = _state(t, C=4)
    n = jnp.asarray([0, 4, 0, 2], jnp.int32)
    r = isokinetic_multistep(t, s, jnp.full((4,), 0.1, jnp.float64), n)
    np.testing.assert_array_equal(np.asarray(r.state.q[0]), np.asarray(s.q[0]))
    assert float(r.log_jac[0]) == 0.0
    assert int(r.n_evals[0]) == 0
    assert int(r.n_evals[1]) == 4


def test_adapt_mc_step_meets_modified_energy_tolerance():
    t = targets.funnel(11)
    s = _state(t, C=16, seed=5)
    C = 16
    out, lwt, stats = adapt_mc_step_e(
        jax.random.PRNGKey(0), t, s, jnp.full((C,), 0.3, jnp.float64),
        jnp.full((C,), 0.2, jnp.float64), jnp.ones((C,), bool))
    at_cap = np.asarray(stats.i_f) == 10
    err = np.abs(np.asarray(stats.energy_err))
    assert np.all((err < 0.2) | at_cap)
    # weight is -W or -W + LOG_ZERO
    assert np.all(np.isfinite(np.asarray(out.q)))
    i_f, i_b = np.asarray(stats.i_f), np.asarray(stats.i_b)
    lwt = np.asarray(lwt)
    assert np.all(lwt[i_b < i_f] < -600)


def test_generic_nuts_isokinetic_samples_gaussian():
    t = targets.std_gauss(4)
    q0 = 0.2 * jax.random.normal(jax.random.PRNGKey(0), (64, 4), jnp.float64)
    samples, diags = run_generic_nuts(
        jax.random.PRNGKey(1), q0, target=t, kernel=IsokineticKernel(),
        h_macro=0.4, delta=0.2, num_iter=400, m=6)
    s = np.asarray(samples)[100:]
    n_eff = s.shape[0] * s.shape[1] / 20
    assert abs(s.mean()) < 5 / np.sqrt(n_eff)
    assert abs(s.std() - 1.0) < 5 * np.sqrt(0.5 / n_eff), s.std()


def test_generic_nuts_hmc_samples_gaussian():
    t = targets.std_gauss(4)
    q0 = 0.2 * jax.random.normal(jax.random.PRNGKey(2), (64, 4), jnp.float64)
    samples, diags = run_generic_nuts(
        jax.random.PRNGKey(3), q0, target=t, kernel=HMCKernel(),
        h_macro=0.5, delta=0.2, num_iter=400, m=6)
    s = np.asarray(samples)[100:]
    n_eff = s.shape[0] * s.shape[1] / 10
    assert abs(s.mean()) < 5 / np.sqrt(n_eff)
    assert abs(s.std() - 1.0) < 5 * np.sqrt(0.5 / n_eff), s.std()


def test_generic_nuts_diag_contract():
    t = targets.corr_gauss(0.5)
    q0 = jax.random.normal(jax.random.PRNGKey(0), (16, 2), jnp.float64)
    samples, diags = run_generic_nuts(
        jax.random.PRNGKey(1), q0, target=t, kernel=IsokineticKernel(),
        h_macro=0.3, delta=0.2, num_iter=50, m=5)
    d = np.asarray(diags)
    assert d.shape == (50, 16, 12)
    # NUTtype in {0, 1, 2}
    assert set(np.unique(d[..., 6])).issubset({0.0, 1.0, 2.0})
    # orbit bounds: a <= 0 <= b
    assert np.all(d[..., 2] <= 0)
    assert np.all(d[..., 3] >= 0)
    # selected index within integrated bounds
    assert np.all(d[..., 1] >= d[..., 4])
    assert np.all(d[..., 1] <= d[..., 5])
    # gradient evals positive
    assert np.all(d[..., 7] > 0)


def test_generic_nuts_hmc_funnel_omega():
    """iWALNUTS-style run on the funnel: omega marginal ~ N(0,9)."""
    t = targets.funnel(6)
    q0 = 0.2 * jax.random.normal(jax.random.PRNGKey(4), (64, 6), jnp.float64)
    samples, diags = run_generic_nuts(
        jax.random.PRNGKey(5), q0, target=t, kernel=HMCKernel(),
        h_macro=0.4, delta=0.3, num_iter=800, m=7)
    w = np.asarray(samples)[200:, :, 0].ravel()
    n_eff = len(w) / 50
    assert abs(w.mean()) < 5 * 3 / np.sqrt(n_eff), w.mean()
    assert abs(w.std() - 3.0) < 5 * 3 * np.sqrt(0.5 / n_eff), w.std()
