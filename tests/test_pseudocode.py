"""Paper-pseudocode mode tests (reference ``walnuts/walnuts.py``,
``test/test.py``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from walnuts_tpu import targets
from walnuts_tpu.sampler.pseudocode import (
    choose_micro_steps,
    micro_steps_logp,
    stable_steps,
    walnuts_pseudo,
    walnuts_step_pseudo,
)


def test_stable_steps_scaling():
    """Larger macro steps need more micro steps; the returned ell is
    minimal (no smaller power of two bounds the energy range)."""
    t = targets.std_gauss(10)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    q = jax.random.normal(k1, (8, 10), jnp.float64)
    rho = jax.random.normal(k2, (8, 10), jnp.float64)
    inv_mass = jnp.ones(10)
    act = jnp.ones((8,), bool)

    ok1, ell1, _ = stable_steps(t, q, rho, inv_mass,
                                jnp.full((8,), 0.5), 0.05, act)
    ok2, ell2, _ = stable_steps(t, q, rho, inv_mass,
                                jnp.full((8,), 2.0), 0.05, act)
    assert np.all(np.asarray(ok1))
    assert np.all(np.asarray(ell2) >= np.asarray(ell1))
    # powers of two
    e = np.asarray(ell2)
    assert np.all((e & (e - 1)) == 0)


def test_choose_micro_steps_support_and_pmf():
    ells = jnp.full((4000,), 4, jnp.int32)
    draws = np.asarray(choose_micro_steps(jax.random.PRNGKey(0), ells))
    vals, counts = np.unique(draws, return_counts=True)
    assert set(vals.tolist()) == {2, 4, 8}
    assert np.all(np.abs(counts / 4000 - 1 / 3) < 0.05)
    # pmf consistency
    lp = micro_steps_logp(jnp.asarray([2, 4, 8, 3]), jnp.asarray([4, 4, 4, 4]))
    np.testing.assert_allclose(np.asarray(lp)[:3], -np.log(3.0), atol=1e-12)
    assert np.asarray(lp)[3] == -np.inf


def test_choose_micro_steps_floor_at_one():
    """ell_stable == 1 must never produce ell == 0 (fixes the
    reference's division-by-zero, ``walnuts.py:185-196``)."""
    ells = jnp.ones((2000,), jnp.int32)
    draws = np.asarray(choose_micro_steps(jax.random.PRNGKey(1), ells))
    assert draws.min() >= 1
    assert set(np.unique(draws).tolist()) == {1, 2}
    # matching pmf: P(1) = 2/3, P(2) = 1/3
    lp = micro_steps_logp(jnp.asarray([1, 2]), jnp.asarray([1, 1]))
    np.testing.assert_allclose(np.asarray(lp),
                               [np.log(2 / 3), np.log(1 / 3)], atol=1e-12)
    frac1 = (draws == 1).mean()
    assert abs(frac1 - 2 / 3) < 0.05


def test_pseudo_std_normal_moments():
    """The reference smoke test config: 2-D standard normal,
    macro_step=2.0, max_error=0.1 (``test/test.py:9-37``)."""
    t = targets.std_gauss(2)
    q0 = jnp.zeros((32, 2), jnp.float64)
    draws = walnuts_pseudo(
        jax.random.PRNGKey(123), q0, target=t, inv_mass=jnp.ones(2),
        macro_step=2.0, max_depth=10, max_error=0.1,
        iter_warmup=0, iter_sample=500)
    s = np.asarray(draws)[50:]
    n_eff = s.shape[0] * s.shape[1] / 4
    assert abs(s.mean()) < 5 / np.sqrt(n_eff), s.mean()
    assert abs(s.std() - 1.0) < 5 * np.sqrt(0.5 / n_eff), s.std()


def test_pseudo_with_mass_matrix():
    """Non-identity inverse mass on an ill-conditioned Gaussian: with
    inv_mass = variances the sampler should mix as if isotropic."""
    t = targets.ill_conditioned_gauss(4, 100.0)
    var = np.asarray(jnp.logspace(0.0, 2.0, 4))
    q0 = jnp.zeros((32, 4), jnp.float64)
    draws = walnuts_pseudo(
        jax.random.PRNGKey(7), q0, target=t, inv_mass=jnp.asarray(var),
        macro_step=1.5, max_depth=8, max_error=0.1,
        iter_warmup=50, iter_sample=400)
    s = np.asarray(draws)
    std = s.reshape(-1, 4).std(axis=0)
    n_eff = s.shape[0] * s.shape[1] / 6
    rel_err = np.abs(std / np.sqrt(var) - 1.0)
    assert np.all(rel_err < 5 * np.sqrt(0.5 / n_eff)), (std, np.sqrt(var))


def test_pseudo_funnel_omega():
    t = targets.funnel(6)
    q0 = jnp.zeros((64, 6), jnp.float64).at[:, 0].add(0.5)
    draws = walnuts_pseudo(
        jax.random.PRNGKey(9), q0, target=t, inv_mass=jnp.ones(6),
        macro_step=0.5, max_depth=9, max_error=0.2,
        iter_warmup=100, iter_sample=600)
    w = np.asarray(draws)[:, :, 0].ravel()
    n_eff = len(w) / 60
    assert abs(w.mean()) < 5 * 3 / np.sqrt(n_eff), w.mean()
    assert abs(w.std() - 3.0) < 5 * 3 * np.sqrt(0.5 / n_eff), w.std()


def test_pseudo_transition_shapes():
    t = targets.corr_gauss(0.5)
    q0 = jax.random.normal(jax.random.PRNGKey(0), (8, 2), jnp.float64)
    res = walnuts_step_pseudo(
        jax.random.PRNGKey(1), q0, target=t, inv_mass=jnp.ones(2),
        macro_step=1.0, max_depth=5, max_error=0.1)
    assert res.q.shape == (8, 2)
    assert np.all(np.asarray(res.n_grad) > 0)
    assert np.all(np.asarray(res.depth_stopped) <= 5)
