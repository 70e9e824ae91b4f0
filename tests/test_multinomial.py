"""Fixed-orbit-length multinomial sampler tests
(reference ``isokinetic/samplers.py:59-292``)."""

import jax
import jax.numpy as jnp
import numpy as np

from walnuts_tpu import targets
from walnuts_tpu.sampler import (
    HMCKernel,
    IsokineticKernel,
    MultinomialConfig,
    run_multinomial,
)


def test_multinomial_hmc_gaussian_moments():
    t = targets.std_gauss(4)
    q0 = 0.2 * jax.random.normal(jax.random.PRNGKey(0), (64, 4), jnp.float64)
    samples, diags, (h, delta) = run_multinomial(
        jax.random.PRNGKey(1), q0, target=t, kernel=HMCKernel(),
        cfg=MultinomialConfig(l_orbit=16), h0=0.3, delta0=0.2,
        num_iter=500, warmup_iter=100)
    s = np.asarray(samples)[150:]
    n_eff = s.shape[0] * s.shape[1] / 30
    assert abs(s.mean()) < 5 / np.sqrt(n_eff), s.mean()
    assert abs(s.std() - 1.0) < 5 * np.sqrt(0.5 / n_eff), s.std()


def test_multinomial_isokinetic_corr_gauss():
    """The reference's MCsim experiment config: corrGauss(0.95),
    isokinetic adaptive steps (``isokinetic/MCsim.py:33-40``)."""
    t = targets.corr_gauss(0.95)
    q0 = 0.2 * jax.random.normal(jax.random.PRNGKey(2), (64, 2), jnp.float64)
    samples, diags, _ = run_multinomial(
        jax.random.PRNGKey(3), q0, target=t, kernel=IsokineticKernel(),
        cfg=MultinomialConfig(l_orbit=32), h0=0.3, delta0=0.2,
        num_iter=600, warmup_iter=150)
    s = np.asarray(samples)[200:]
    n_eff = s.shape[0] * s.shape[1] / 60
    assert abs(s.mean()) < 5 / np.sqrt(n_eff), s.mean()
    assert abs(s.std() - 1.0) < 5 * np.sqrt(0.5 / n_eff), s.std()
    corr = np.corrcoef(s[..., 0].ravel(), s[..., 1].ravel())[0, 1]
    assert abs(corr - 0.95) < 0.05, corr


def test_multinomial_warmup_adapts():
    t = targets.std_gauss(6)
    q0 = jax.random.normal(jax.random.PRNGKey(4), (32, 6), jnp.float64)
    samples, diags, (h, delta) = run_multinomial(
        jax.random.PRNGKey(5), q0, target=t, kernel=HMCKernel(),
        cfg=MultinomialConfig(l_orbit=8), h0=5.0, delta0=0.5,
        num_iter=120, warmup_iter=100)
    h = np.asarray(h)
    assert np.all(h < 5.0)
    assert np.all(h > 1e-4)
    assert np.all(np.isfinite(np.asarray(delta)))


def test_multinomial_diag_contract_and_scaling():
    t = targets.ill_conditioned_gauss(4, 100.0)
    q0 = jax.random.normal(jax.random.PRNGKey(6), (16, 4), jnp.float64)
    scale = np.sqrt(np.asarray(
        jnp.logspace(0.0, 2.0, 4)))  # match target variances
    samples, diags, _ = run_multinomial(
        jax.random.PRNGKey(7), q0, target=t, kernel=HMCKernel(),
        cfg=MultinomialConfig(l_orbit=8), h0=0.5, delta0=0.2,
        num_iter=60, warmup_iter=20, scale=jnp.asarray(scale))
    d = np.asarray(diags)
    assert d.shape == (60, 16, 14)
    assert np.all(d[..., 1] >= 0)          # numForw in [0, L)
    assert np.all(d[..., 1] < 8)
    assert np.all(d[..., 6] <= 7)          # nSteps <= L-1
    assert np.all((d[..., 7] > 0) & (d[..., 7] <= 1.0 + 1e-9))  # ESSfrac
    assert np.all(np.isfinite(np.asarray(samples)))


def test_multinomial_wasps_off_runs():
    t = targets.std_gauss(3)
    q0 = jax.random.normal(jax.random.PRNGKey(8), (8, 3), jnp.float64)
    samples, diags, _ = run_multinomial(
        jax.random.PRNGKey(9), q0, target=t, kernel=HMCKernel(),
        cfg=MultinomialConfig(l_orbit=8, wasps=False), h0=0.4, delta0=0.2,
        num_iter=30, warmup_iter=10)
    assert np.all(np.isfinite(np.asarray(samples)))
