"""Checkpoint / resume round-trip and exact continuation."""

import os

import jax
import jax.numpy as jnp
import numpy as np

import walnuts_tpu as wt
from walnuts_tpu.sampler.pseudocode import walnuts_pseudo
from walnuts_tpu.utils.checkpoint import load_state, save_state


def test_checkpoint_roundtrip_and_resume(tmp_path):
    t = wt.targets.std_gauss(5)
    q0 = jax.random.normal(jax.random.PRNGKey(0), (8, 5), jnp.float64)
    cfg = wt.WalnutsConfig(m=4)
    wu = wt.WarmupConfig(warmup_iter=20)

    # one 40-iteration run
    key = jax.random.PRNGKey(1)
    s_all, d_all, st_all = wt.run_walnuts(
        key, q0, target=t, cfg=cfg, warmup=wu, num_iter=40,
        h0=0.5, delta0=0.1)

    # split: 25 iterations, checkpoint, resume 15 more
    s1, d1, st1 = wt.run_walnuts(
        key, q0, target=t, cfg=cfg, warmup=wu, num_iter=25,
        h0=0.5, delta0=0.1)
    path = os.path.join(tmp_path, "ckpt.npz")
    save_state(path, st1)
    st1b = load_state(path)
    # exact round trip
    for a, b in zip(jax.tree.leaves(st1), jax.tree.leaves(st1b)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    s2, d2, st2 = wt.run_walnuts(
        key, q0, target=t, cfg=cfg, warmup=wu, num_iter=15,
        resume_state=st1b)
    # resumed run continues the iteration counter
    assert int(st2.iter_n) == 40
    # tuning state evolves from the checkpoint (not reinitialised)
    assert np.all(np.asarray(st2.p2.npush) >= np.asarray(st1.p2.npush))
    assert np.all(np.isfinite(np.asarray(s2)))


def test_micro_policy_shifted_23():
    """The MATLAB randomisation scheme also yields a correct sampler."""
    t = wt.targets.std_gauss(2)
    q0 = jnp.zeros((32, 2), jnp.float64)
    draws = walnuts_pseudo(
        jax.random.PRNGKey(5), q0, target=t, inv_mass=jnp.ones(2),
        macro_step=2.0, max_depth=8, max_error=0.1,
        iter_warmup=0, iter_sample=400, micro_policy="shifted_23")
    s = np.asarray(draws)[50:]
    n_eff = s.shape[0] * s.shape[1] / 4
    assert abs(s.mean()) < 5 / np.sqrt(n_eff)
    assert abs(s.std() - 1.0) < 5 * np.sqrt(0.5 / n_eff)
