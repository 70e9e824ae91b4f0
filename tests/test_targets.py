"""Target layer (L0) tests: analytic gradients vs autodiff, batching,
and the Stock-Watson JAX reimplementation's internal consistency.

Reference test targets: ``test/targets.py:4-29``,
``WALNUTSpy/targetDistr.py:18-93``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from walnuts_tpu import targets


ALL_TARGETS = [
    targets.std_gauss(7),
    targets.corr_gauss(0.5),
    targets.smile(),
    targets.rosenbrock(),
    targets.mod_funnel(),
    targets.funnel(11),
    targets.funnel_rescaled(11),
    targets.ill_conditioned_gauss(5, 100.0),
]


@pytest.mark.parametrize("t", ALL_TARGETS, ids=lambda t: t.name)
def test_analytic_grad_matches_autodiff(t):
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (16, t.dim), jnp.float64) * 0.7
    lp, g = t.logp_grad(q)
    lp_ad = jax.vmap(t._logp)(q)
    g_ad = jax.vmap(jax.grad(t._logp))(q)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lp_ad), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ad), rtol=1e-8,
                               atol=1e-10)


@pytest.mark.parametrize("t", ALL_TARGETS, ids=lambda t: t.name)
def test_single_vs_batched(t):
    q = jax.random.normal(jax.random.PRNGKey(1), (t.dim,), jnp.float64)
    lp1 = t.logp(q)
    lp2 = t.logp(q[None, :])[0]
    np.testing.assert_allclose(float(lp1), float(lp2), rtol=1e-12)


def test_hvp_matches_hessian():
    t = targets.funnel(4)
    q = jnp.asarray([0.3, 0.1, -0.2, 0.5], jnp.float64)
    v = jnp.asarray([1.0, -1.0, 0.5, 2.0], jnp.float64)
    hv = t.hvp(q, v)
    h_full = t.hessian(q)
    np.testing.assert_allclose(np.asarray(hv), np.asarray(h_full @ v),
                               rtol=1e-8)


def test_funnel_marginal_normalization():
    """funnel logp equals sum of the exact conditional normal logpdfs."""
    from scipy import stats

    t = targets.funnel(5, scale=3.0)
    q = np.asarray([0.7, 0.2, -1.1, 0.4, 2.0])
    expected = stats.norm.logpdf(q[0], 0, 3.0) + np.sum(
        stats.norm.logpdf(q[1:], 0, np.exp(q[0] / 2))
    )
    np.testing.assert_allclose(float(t.logp(jnp.asarray(q))), expected,
                               rtol=1e-10)


def test_stock_watson_shapes_and_grad():
    t = targets.stock_watson()
    assert t.dim == 3 * 252
    q = jax.random.normal(jax.random.PRNGKey(2), (3, t.dim), jnp.float64) * 0.1
    lp, g = t.logp_grad(q)
    assert lp.shape == (3,)
    assert g.shape == (3, t.dim)
    assert np.all(np.isfinite(np.asarray(lp)))
    assert np.all(np.isfinite(np.asarray(g)))
    # grad agrees with autodiff of the scalar density
    g_ad = jax.grad(t._logp)(q[0])
    np.testing.assert_allclose(np.asarray(g[0]), np.asarray(g_ad), rtol=1e-8)


def test_stock_watson_generated_dim():
    t = targets.stock_watson()
    T = 252
    # sigma (1) + z (T-1) + x (T) + tau (T)
    assert t.generated_dim == 1 + (T - 1) + T + T
    q = jnp.zeros((2, t.dim))
    gen = t.generated(q)
    assert gen.shape == (2, t.generated_dim)


def test_stock_watson_reference_model_has_flat_z1_tail():
    """The reference ``sw_innov.stan`` ships with the initial-state
    priors commented out (``sw_innov.stan:40-42``), which leaves the
    density EXACTLY flat as z1 -> -inf (tau freezes at tau1, the
    likelihood tends to a positive constant): the posterior is
    improper and multi-chain convergence gates are unpassable on it.
    ``proper=True`` restores the commented-out N(0,1) priors and
    kills the flat tail."""
    t_ref = targets.stock_watson()
    t_prop = targets.stock_watson(proper=True)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=t_ref.dim) * 0.5, jnp.float64)
    q = q.at[1].set(-130.0)          # z1 deep in the tail
    q2 = q.at[1].add(-900.0)         # 900 further out
    lp_a, lp_b = float(t_ref.logp(q)), float(t_ref.logp(q2))
    assert lp_a == lp_b, "reference tail must be exactly flat"
    # the proper variant decays quadratically in z1
    dp = float(t_prop.logp(q)) - float(t_prop.logp(q2))
    expect = 0.5 * (1030.0**2 - 130.0**2)
    np.testing.assert_allclose(dp, expect, rtol=1e-6)
    # and near the origin the two models differ only by the prior term
    q0 = jnp.asarray(rng.normal(size=t_ref.dim) * 0.1, jnp.float64)
    z1, x1, tau1 = float(q0[1]), float(q0[252]), float(q0[504])
    d = float(t_ref.logp(q0)) - float(t_prop.logp(q0))
    expect0 = 0.5 * (z1**2 + x1**2 + tau1**2 + 3 * np.log(2 * np.pi))
    np.testing.assert_allclose(d, expect0, rtol=1e-6)
