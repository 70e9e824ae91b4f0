"""End-to-end sampler tests (layers L2-L4): posterior moment accuracy
on analytic targets, diagnostics contract, warmup adaptation, and the
index-statistic uniformity invariant.

These are asserting versions of the reference's manual statistical
checks (``test/test.py:9-37`` prints moments for eyeballing;
``WALNUTSpy/MCMCutils.py:28-40`` histograms the index statistic).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import walnuts_tpu as wt
from walnuts_tpu import targets


def _run(t, C=64, D=None, num_iter=600, warm=200, m=6, h0=0.5, delta0=0.1,
         integrator="adapt_leapfrog_r2p", seed=0, **kw):
    q0 = 0.1 * jax.random.normal(jax.random.PRNGKey(seed), (C, t.dim),
                                 jnp.float64)
    cfg = wt.WalnutsConfig(m=m, integrator=integrator)
    wu = wt.WarmupConfig(warmup_iter=warm)
    samples, diags, state = wt.run_walnuts(
        jax.random.PRNGKey(seed + 1), q0, target=t, cfg=cfg, warmup=wu,
        num_iter=num_iter, h0=h0, delta0=delta0, **kw)
    return (np.asarray(samples), np.asarray(diags), state)


def _moment_check(s, mean, var, C, n_eff_guess):
    """Assert sample moments within ~5 MC standard errors."""
    se_mean = np.sqrt(var / n_eff_guess)
    se_var = var * np.sqrt(2.0 / n_eff_guess)
    assert np.all(np.abs(s.mean(axis=(0, 1)) - mean) < 5 * se_mean), (
        s.mean(axis=(0, 1)), mean, se_mean)
    assert np.all(np.abs(s.var(axis=(0, 1)) - var) < 5 * se_var), (
        s.var(axis=(0, 1)), var, se_var)


@pytest.mark.parametrize("integrator", [
    "fixed_leapfrog", "adapt_leapfrog_d", "adapt_leapfrog_r2p",
])
def test_std_gauss_moments(integrator):
    t = targets.std_gauss(10)
    h0 = 0.25 if integrator == "fixed_leapfrog" else 0.5
    samples, diags, state = _run(t, C=64, num_iter=500, warm=200,
                                 integrator=integrator, h0=h0)
    s = samples[201:]
    # crude effective size: iterations * chains / 4 (NUTS mixes fast here)
    _moment_check(s, 0.0, 1.0, 64, s.shape[0] * s.shape[1] / 8)


def test_corr_gauss_moments():
    t = targets.corr_gauss(0.5)
    samples, _, _ = _run(t, C=64, num_iter=800, warm=300, seed=2)
    s = samples[301:]
    _moment_check(s, 0.0, 1.0, 64, s.shape[0] * s.shape[1] / 8)
    corr = np.corrcoef(s[..., 0].ravel(), s[..., 1].ravel())[0, 1]
    assert abs(corr - 0.5) < 0.05


def test_funnel_omega_marginal():
    """funnel(11)'s first coordinate is exactly N(0, 3^2) — the
    reference's headline validation invariant (plotsFunnel.py:49)."""
    t = targets.funnel(11)
    samples, diags, state = _run(t, C=128, num_iter=1500, warm=500, m=8,
                                 h0=0.3, delta0=0.3, seed=3)
    w = samples[501:, :, 0].ravel()
    n_eff = len(w) / 40.0  # funnel mixes slowly in omega
    assert abs(w.mean()) < 5 * 3.0 / np.sqrt(n_eff)
    assert abs(w.std() - 3.0) < 5 * 3.0 * np.sqrt(0.5 / n_eff)


def test_diagnostics_contract():
    t = targets.std_gauss(5)
    samples, diags, state = _run(t, C=16, num_iter=50, warm=20)
    assert diags.shape == (50, 16, 24)
    # col 19: stop codes in the reference's vocabulary
    codes = np.unique(diags[..., 19])
    assert set(codes).issubset({0.0, 4.0, -4.0, 5.0, 999.0})
    # col 15 = H > 0, col 18 = delta > 0
    assert np.all(diags[..., 15] > 0)
    assert np.all(diags[..., 18] > 0)
    # col 20 >= col 1 (computed >= sampled doublings)
    assert np.all(diags[..., 20] >= diags[..., 1])
    # cols 6/7: gradient evals, positive on every iteration
    assert np.all(diags[..., 6] + diags[..., 7] > 0)
    # col 17: orbit energy range >= 0
    assert np.all(diags[..., 17] >= 0)
    # col 23: index statistic in [-1, 1]
    assert np.all(np.abs(diags[..., 23]) <= 1.0 + 1e-9)


def test_index_statistic_distribution():
    """The |col 23| index statistic (normalised time-position of the
    selected state, ``MCMCutils.py:28-40``) has a characteristic
    non-uniform shape: empirically (running WALNUTSpy itself on this
    config) the mass rises from ~0 near the origin and concentrates in
    the upper half, with a spike at exactly 1 (whole-orbit selections).
    Check those gross features rather than uniformity."""
    t = targets.std_gauss(10)
    samples, diags, state = _run(t, C=64, num_iter=400, warm=200, seed=5)
    x = np.abs(diags[200:, :, 23].ravel())
    x = x[x > 0]  # drop unmoved iterations
    assert np.all(x <= 1.0 + 1e-9)
    hist, _ = np.histogram(x, bins=10, range=(0, 1))
    frac = hist / len(x)
    # reference WALNUTSpy (seed 1, H0=0.5, delta0=0.1, M=6, d=10) gives
    # approx [0, .04, .08, .10, .11, .14, .18, .10, .06, .19]
    assert frac[0] < 0.02          # near-empty first bin
    assert frac[5:].sum() > 0.45   # upper-half concentration
    assert frac.max() < 0.35       # no single dominating bin


def test_warmup_adapts_h_and_delta():
    t = targets.funnel(11)
    samples, diags, state = _run(t, C=32, num_iter=300, warm=250, h0=5.0,
                                 delta0=0.9, seed=6)
    h = np.asarray(state.h)
    delta = np.asarray(state.delta)
    # started at absurd H=5.0: adaptation must have pulled it down
    assert np.all(h < 5.0)
    assert np.all(h > 1e-3)
    assert np.all(delta > 0)
    assert np.all(np.isfinite(delta))


def test_orbit_stats_bound_samples():
    t = targets.funnel(11)
    q0 = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (8, 11), jnp.float64)
    cfg = wt.WalnutsConfig(m=5, record_orbit_stats=True)
    samples, diags, state, omin, omax = wt.run_walnuts(
        jax.random.PRNGKey(1), q0, target=t, cfg=cfg,
        warmup=wt.WarmupConfig(warmup_iter=10), num_iter=30,
        h0=0.3, delta0=0.3, collect_orbit_stats=True)
    omin, omax = np.asarray(omin), np.asarray(omax)
    s = np.asarray(samples)[1:]
    assert np.all(omin <= s + 1e-9)
    assert np.all(omax >= s - 1e-9)


def test_deterministic_given_key():
    t = targets.std_gauss(4)
    r1 = _run(t, C=8, num_iter=20, warm=5, seed=9)[0]
    r2 = _run(t, C=8, num_iter=20, warm=5, seed=9)[0]
    np.testing.assert_array_equal(r1, r2)


def test_chains_are_independent():
    """Permuting chain order must not change per-chain trajectories'
    statistics (chains share a key schedule but use per-chain draws);
    sanity-check cross-chain correlation of draws is ~0."""
    t = targets.std_gauss(2)
    samples, _, _ = _run(t, C=16, num_iter=300, warm=100, seed=12)
    s = samples[101:, :, 0]
    corr = np.corrcoef(s.T)
    off = corr[~np.eye(16, dtype=bool)]
    assert np.all(np.abs(off) < 0.35)
