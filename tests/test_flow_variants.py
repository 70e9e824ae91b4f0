"""Flow-error step-kernel variants (reference ``adaptMCstepFlow``,
``adaptMCstepFlow2``, ``adaptHMCstepF``) and pooled warmup mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import walnuts_tpu as wt
from walnuts_tpu import targets
from walnuts_tpu.ops.isokinetic import (
    MCState,
    adapt_mc_step_flow2,
    isokinetic_multistep_err,
    refresh_u,
)
from walnuts_tpu.sampler import HMCKernel, IsokineticKernel, run_generic_nuts


def _state(t, C=8, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    q = jax.random.normal(k1, (C, t.dim), jnp.float64)
    lp, g = t.logp_grad(q)
    u = refresh_u(k2, q.shape, jnp.float64)
    return MCState(q, u, g, lp)


def test_err_est_decreases_with_refinement():
    """The Euler-comparison flow-error estimate must shrink as micro
    steps shrink (it drives the halving search)."""
    t = targets.corr_gauss(0.95)
    s = _state(t, C=8)
    errs = []
    for c in [0, 1, 2, 3]:
        n = 2**c
        r, err = isokinetic_multistep_err(
            t, s, jnp.full((8,), 0.4 / n, jnp.float64),
            jnp.full((8,), n, jnp.int32))
        errs.append(np.asarray(err))
    errs = np.stack(errs)
    assert np.all(errs[3] < errs[0])


def test_flow2_step_protocol():
    t = targets.funnel(6)
    s = _state(t, C=16, seed=2)
    out, lwt, stats = adapt_mc_step_flow2(
        jax.random.PRNGKey(0), t, s, jnp.full((16,), 0.3, jnp.float64),
        jnp.full((16,), 0.2, jnp.float64), jnp.ones((16,), bool))
    i_f, i_b = np.asarray(stats.i_f), np.asarray(stats.i_b)
    lwt = np.asarray(lwt)
    assert np.all(lwt[i_b < i_f] < -600)
    assert np.all(np.isfinite(np.asarray(out.q)))


@pytest.mark.parametrize("kernel,label", [
    (IsokineticKernel(variant="flow"), "iso_flow"),
    (IsokineticKernel(variant="flow2"), "iso_flow2"),
    (HMCKernel(variant="flow"), "hmc_flow"),
], ids=lambda v: v if isinstance(v, str) else "")
def test_flow_variant_samples_gaussian(kernel, label):
    t = targets.std_gauss(4)
    q0 = 0.2 * jax.random.normal(jax.random.PRNGKey(0), (32, 4), jnp.float64)
    s, d = run_generic_nuts(jax.random.PRNGKey(1), q0, target=t,
                            kernel=kernel, h_macro=0.4, delta=0.1,
                            num_iter=300, m=5)
    x = np.asarray(s)[80:]
    n_eff = x.shape[0] * x.shape[1] / 15
    assert abs(x.mean()) < 5 / np.sqrt(n_eff), x.mean()
    assert abs(x.std() - 1.0) < 5 * np.sqrt(0.5 / n_eff), x.std()


def test_pooled_warmup_converges_and_is_uniform():
    """Pooled mode: all chains share one (H, delta) after warmup, and
    the sampler still produces correct moments."""
    t = targets.funnel(6)
    q0 = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (32, 6), jnp.float64)
    cfg = wt.WalnutsConfig(m=6)
    wu = wt.WarmupConfig(warmup_iter=150, pooled=True)
    samples, diags, state = wt.run_walnuts(
        jax.random.PRNGKey(1), q0, target=t, cfg=cfg, warmup=wu,
        num_iter=400, h0=1.0, delta0=0.3)
    h = np.asarray(state.h)
    delta = np.asarray(state.delta)
    # consensus: identical tuning across chains
    assert np.allclose(h, h[0])
    assert np.allclose(delta, delta[0])
    w = np.asarray(samples)[151:, :, 0].ravel()
    n_eff = len(w) / 50
    assert abs(w.mean()) < 5 * 3 / np.sqrt(n_eff)
    assert abs(w.std() - 3.0) < 5 * 3 * np.sqrt(0.5 / n_eff)
