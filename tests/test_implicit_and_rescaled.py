"""Implicit-midpoint and rescaled-leapfrog integrator tests
(reference ``adaptiveIntegrators.py:478-641,660-762``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import walnuts_tpu as wt
from walnuts_tpu import targets
from walnuts_tpu.ops.hamiltonian import hamiltonian
from walnuts_tpu.ops.integrators import (
    IntegratorConfig,
    adapt_implicit_midpoint_d,
    adapt_rescaled_leapfrog_d,
)
from walnuts_tpu.ops.leapfrog import PhasePoint, implicit_midpoint_step


def _setup(t, C=8, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    q = jax.random.normal(k1, (C, t.dim), jnp.float64)
    v = jax.random.normal(k2, (C, t.dim), jnp.float64)
    lp, g = t.logp_grad(q)
    return q, v, g, lp


def test_im_step_exact_on_gaussian_matches_cayley():
    """For a standard Gaussian, implicit midpoint is the Cayley
    transform: q2 = ((1 - h^2/4) q + h v) / (1 + h^2/4)."""
    t = targets.std_gauss(5)
    q, v, g, lp = _setup(t, C=4)
    h = jnp.full((4,), 0.3, jnp.float64)
    (new, err, ok, nev) = implicit_midpoint_step(t, PhasePoint(q, v, g, lp),
                                                 h, fp_tol=1e-14)
    a = 0.3**2 / 4.0
    q2 = ((1 - a) * np.asarray(q) + 0.3 * np.asarray(v)) / (1 + a)
    np.testing.assert_allclose(np.asarray(new.q), q2, atol=1e-12)
    assert np.all(np.asarray(ok))


def test_im_step_energy_conservation_gaussian():
    """Implicit midpoint conserves the Gaussian Hamiltonian exactly
    (it is a symplectic Cayley rotation)."""
    t = targets.std_gauss(5)
    q, v, g, lp = _setup(t, C=4, seed=1)
    h0 = hamiltonian(lp, v)
    s = PhasePoint(q, v, g, lp)
    for _ in range(20):
        s, _, ok, _ = implicit_midpoint_step(t, s, jnp.full((4,), 0.25),
                                             fp_tol=1e-14)
    h_end = hamiltonian(s.lp, s.v)
    np.testing.assert_allclose(np.asarray(h_end), np.asarray(h0), atol=1e-9)


def test_im_reversibility():
    t = targets.funnel(5)
    q, v, g, lp = _setup(t, C=4, seed=2)
    s0 = PhasePoint(q, v, g, lp)
    h = jnp.full((4,), 0.05, jnp.float64)
    s1, _, ok1, _ = implicit_midpoint_step(t, s0, h, fp_tol=1e-14)
    s2, _, ok2, _ = implicit_midpoint_step(
        t, PhasePoint(s1.q, -s1.v, s1.g, s1.lp), h, fp_tol=1e-14)
    assert np.all(np.asarray(ok1) & np.asarray(ok2))
    np.testing.assert_allclose(np.asarray(s2.q), np.asarray(q), atol=1e-10)
    np.testing.assert_allclose(np.asarray(-s2.v), np.asarray(v), atol=1e-10)


def test_im_newton_matches_fixed_point():
    t = targets.funnel(4)
    q, v, g, lp = _setup(t, C=4, seed=3)
    s0 = PhasePoint(q, v, g, lp)
    h = jnp.full((4,), 0.1, jnp.float64)
    s_fp, _, ok_fp, _ = implicit_midpoint_step(t, s0, h, fp_tol=1e-13)
    s_nw, _, ok_nw, _ = implicit_midpoint_step(t, s0, h, fp_tol=1e-13,
                                               newton=True)
    assert np.all(np.asarray(ok_fp) & np.asarray(ok_nw))
    np.testing.assert_allclose(np.asarray(s_fp.q), np.asarray(s_nw.q),
                               atol=1e-9)


def test_adapt_im_integrator_protocol():
    t = targets.funnel(11)
    q, v, g, lp = _setup(t, C=16, seed=4)
    h0 = hamiltonian(lp, v)
    cfg = IntegratorConfig()
    C = 16
    res = adapt_implicit_midpoint_d(
        jax.random.PRNGKey(0), t, q, v, g, lp, h0,
        jnp.full((C,), 0.4, jnp.float64), jnp.ones((C,), jnp.float64),
        jnp.full((C,), 0.1, jnp.float64), None, jnp.ones((C,), bool), cfg)
    err = np.abs(np.asarray(res.h_end - h0))
    finite = np.isfinite(np.asarray(res.h_end))
    at_cap = np.asarray(res.i_f) == cfg.max_c
    assert np.all(~finite | (err < 0.1) | at_cap)
    lwt = np.asarray(res.lwt)
    i_f, i_b = np.asarray(res.i_f), np.asarray(res.i_b)
    assert np.all(lwt[(i_f == i_b) & finite] == 0.0)


def test_rescaled_integrator_runs_and_weights():
    t = targets.mod_funnel()
    q, v, g, lp = _setup(t, C=16, seed=5)
    h0 = hamiltonian(lp, v)
    C = 16
    res = adapt_rescaled_leapfrog_d(
        jax.random.PRNGKey(0), t, q, v, g, lp, h0,
        jnp.full((C,), 0.3, jnp.float64), jnp.ones((C,), jnp.float64),
        jnp.full((C,), 0.3, jnp.float64), None, jnp.ones((C,), bool),
        IntegratorConfig())
    assert np.all(np.isfinite(np.asarray(res.q)))
    lwt = np.asarray(res.lwt)
    assert np.all((lwt == 0.0) | (lwt < -600.0))
    assert np.all(np.asarray(res.n_eval_f) >= 1)


def test_im_sampler_end_to_end():
    """WALNUTS with implicit midpoint samples a correct Gaussian."""
    t = targets.std_gauss(4)
    q0 = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (32, 4), jnp.float64)
    cfg = wt.WalnutsConfig(m=5, integrator="adapt_implicit_midpoint_d")
    samples, diags, state = wt.run_walnuts(
        jax.random.PRNGKey(1), q0, target=t, cfg=cfg,
        warmup=wt.WarmupConfig(warmup_iter=100), num_iter=300,
        h0=0.5, delta0=0.1)
    s = np.asarray(samples)[101:]
    n_eff = s.shape[0] * s.shape[1] / 8
    assert abs(s.mean()) < 5 / np.sqrt(n_eff)
    assert abs(s.std() - 1.0) < 5 * np.sqrt(0.5 / n_eff)
