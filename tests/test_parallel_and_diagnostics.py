"""Mesh sharding, multi-device execution, ESS/Rhat estimators, and the
driver entry points."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import walnuts_tpu as wt
from walnuts_tpu.diagnostics import ess, rhat, split_rhat, qq_normal
from walnuts_tpu.parallel import (make_mesh, make_mesh2, shard_chains,
                                  shard_chains_dim)


def test_ess_iid_draws():
    """IID draws: ESS ~ N*C."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2000, 4))
    e = float(ess(jnp.asarray(x)))
    assert 0.6 * 8000 < e < 1.4 * 8000, e


def test_ess_correlated_draws():
    """AR(1) with phi=0.9: ESS ~ N*C*(1-phi)/(1+phi) ~ N*C/19."""
    rng = np.random.default_rng(1)
    n, c, phi = 4000, 4, 0.9
    x = np.zeros((n, c))
    eps = rng.normal(size=(n, c)) * np.sqrt(1 - phi**2)
    for i in range(1, n):
        x[i] = phi * x[i - 1] + eps[i]
    e = float(ess(jnp.asarray(x)))
    expect = n * c * (1 - phi) / (1 + phi)
    assert 0.5 * expect < e < 2.0 * expect, (e, expect)


def test_ess_multiparam_shape():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(500, 4, 3))
    e = np.asarray(ess(jnp.asarray(x)))
    assert e.shape == (3,)


def test_ess_matches_arviz():
    az = pytest.importorskip("arviz")

    rng = np.random.default_rng(3)
    n, c = 1000, 4
    x = np.zeros((n, c))
    for i in range(1, n):
        x[i] = 0.7 * x[i - 1] + rng.normal(size=c) * np.sqrt(1 - 0.49)
    ours = float(ess(jnp.asarray(x)))
    theirs = float(az.ess(az.convert_to_dataset(x.T[None].transpose(1, 2, 0)))
                   .to_array().values)
    assert abs(ours - theirs) / theirs < 0.15, (ours, theirs)


def test_rhat_mixed_vs_unmixed():
    rng = np.random.default_rng(4)
    mixed = rng.normal(size=(500, 4))
    r = float(rhat(jnp.asarray(mixed)))
    assert abs(r - 1.0) < 0.05
    unmixed = mixed + np.array([0.0, 1.0, 2.0, 3.0])
    r2 = float(rhat(jnp.asarray(unmixed)))
    assert r2 > 1.5
    # split-rhat catches a trend that plain rhat misses
    trending = rng.normal(size=(500, 4)) + np.linspace(0, 4, 500)[:, None]
    assert float(split_rhat(jnp.asarray(trending))) > 1.2


def test_qq_normal_straight_line_for_normal_data():
    rng = np.random.default_rng(5)
    theo, x = qq_normal(jnp.asarray(rng.normal(2.0, 1.5, size=4000)))
    # interior quantiles should match closely
    sl = slice(200, -200)
    np.testing.assert_allclose(np.asarray(theo)[sl], np.asarray(x)[sl],
                               atol=0.25)


# ---------------------------------------------------------------------------
def test_mesh_sharded_transition_matches_single_device():
    """The same sampler step on a sharded batch must produce identical
    results (chains don't interact)."""
    t = wt.targets.std_gauss(6)
    q0 = jax.random.normal(jax.random.PRNGKey(0), (16, 6), jnp.float64)
    cfg = wt.WalnutsConfig(m=4)
    wu = wt.WarmupConfig(warmup_iter=5)

    s1, d1, _ = wt.run_walnuts(jax.random.PRNGKey(1), q0, target=t, cfg=cfg,
                               warmup=wu, num_iter=10, h0=0.5, delta0=0.1)

    mesh = make_mesh(8)
    q0s = shard_chains(q0, mesh)
    s2, d2, _ = wt.run_walnuts(jax.random.PRNGKey(1), q0s, target=t, cfg=cfg,
                               warmup=wu, num_iter=10, h0=0.5, delta0=0.1)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-12)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-12)


def test_mesh2_dim_sharded_matches_single_device():
    """Tensor-parallel axis (SURVEY §2.6 TP row): ``[C, D]`` state laid
    out on a 2-D ``('chains','dim')`` mesh.  GSPMD turns the hot loop's
    D-reductions (kinetic energies, U-turn inner products) into psums
    over the ``dim`` axis; results must match the unsharded run up to
    reduction-order roundoff."""
    t = wt.targets.std_gauss(8)
    q0 = jax.random.normal(jax.random.PRNGKey(0), (8, 8), jnp.float64)
    cfg = wt.WalnutsConfig(m=4)
    wu = wt.WarmupConfig(warmup_iter=5)

    s1, d1, _ = wt.run_walnuts(jax.random.PRNGKey(1), q0, target=t, cfg=cfg,
                               warmup=wu, num_iter=10, h0=0.5, delta0=0.1)

    mesh = make_mesh2(4, 2)
    q0s = shard_chains_dim(q0, mesh)
    s2, d2, _ = wt.run_walnuts(jax.random.PRNGKey(1), q0s, target=t, cfg=cfg,
                               warmup=wu, num_iter=10, h0=0.5, delta0=0.1)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                               rtol=1e-8, atol=1e-8)


def test_diagnostics_bitwise_stable_across_shardings():
    """BASELINE.json north star: 'bitwise-stable diagnostics' across
    host/device layouts.  ESS, Rhat and split-Rhat computed on a
    chain-sharded batch must equal the single-device result BITWISE
    (not just to tolerance): the FFT autocorrelation and the
    between/within reductions run per-chain or over a fixed reduction
    tree, so GSPMD resharding must not change a single bit."""
    rng = np.random.default_rng(11)
    draws = jnp.asarray(rng.normal(size=(200, 16, 3)))

    ref = (np.asarray(ess(draws)), np.asarray(rhat(draws)),
           np.asarray(split_rhat(draws)))

    mesh = make_mesh(8)
    # shard the CHAIN axis (axis 1 of [iter, chain, dim])
    from jax.sharding import NamedSharding, PartitionSpec as P
    sharded = jax.device_put(draws, NamedSharding(mesh, P(None, "chains")))
    got = (np.asarray(ess(sharded)), np.asarray(rhat(sharded)),
           np.asarray(split_rhat(sharded)))
    for a, b, name in zip(ref, got, ("ess", "rhat", "split_rhat")):
        assert np.array_equal(a, b), (name, a, b)


def test_graft_entry_compiles():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)


def test_graft_dryrun_multichip():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_ess_matches_vendored_reference():
    """Independent O(n^2) numpy re-derivation of the Stan bulk-ESS
    convention (Vehtari et al. 2021: per-chain autocovariance averaged
    across chains, between-chain variance in var_plus, Geyer
    initial-monotone pair truncation) cross-checks the FFT/masked-ops
    implementation in walnuts_tpu.diagnostics.ess.  Vendors the arviz
    cross-check (test above) so the suite carries an independent ESS
    oracle even where arviz is not installed (VERDICT r4 item 8)."""
    rng = np.random.default_rng(7)
    n, c = 800, 4
    x = np.zeros((n, c))
    for i in range(1, n):
        x[i] = 0.6 * x[i - 1] + rng.normal(size=c) * np.sqrt(1 - 0.36)

    # direct (non-FFT) biased autocovariance per chain, Stan-style
    xc = x - x.mean(axis=0)
    acov = np.stack([[np.dot(xc[: n - k, j], xc[k:, j]) / n
                      for j in range(c)] for k in range(n)])  # [N, C]
    chain_mean = x.mean(axis=0)
    mean_var = acov[0].mean() * n / (n - 1.0)
    var_plus = mean_var * (n - 1.0) / n + np.var(chain_mean, ddof=1)
    rho = 1.0 - (mean_var - acov.mean(axis=1)) / var_plus

    # Geyer pairs P_k = rho_{2k} + rho_{2k+1}; truncate at first
    # negative pair, enforce monotone non-increase
    pairs = [rho[0] + rho[1]]
    k = 2
    while k + 1 < n:
        p = rho[k] + rho[k + 1]
        if p < 0:
            break
        pairs.append(min(p, pairs[-1]))
        k += 2
    tau = max(2.0 * sum(pairs) - 1.0, 1.0 / n)
    expect = n * c / tau

    ours = float(ess(jnp.asarray(x)))
    assert abs(ours - expect) / expect < 0.02, (ours, expect)
