"""Pallas whole-round engine vs the XLA megakernel.

The Pallas kernel traces the SAME ``_make_round_body`` the XLA engine
runs; with ``rng="table"`` it also consumes the same per-round draws,
so in interpreter mode (f64, CPU) the two engines must agree exactly
— states, rings, counts, everything.
"""

import jax
import jax.numpy as jnp
import numpy as np

import walnuts_tpu as wt
from walnuts_tpu.sampler import pallas_megakernel as pmk
from walnuts_tpu.sampler.megakernel import run_walnuts_fused


def _setup(C=16, D=7, m=4):
    t = wt.targets.funnel(D)
    q0 = 0.3 * jax.random.normal(jax.random.PRNGKey(0), (C, D),
                                 jnp.float64)
    h = jnp.full((C,), 0.4, jnp.float64)
    dl = jnp.full((C,), 0.15, jnp.float64)
    return t, q0, h, dl, wt.WalnutsConfig(m=m)


def test_pallas_table_rng_bit_parity():
    """160 rounds, identical random stream: every bank, ring and
    counter matches the XLA engine exactly."""
    t, q0, h, dl, cfg = _setup()
    N, ROUNDS = 50, 160
    kw = dict(target=t, cfg=cfg, num_iter=N, stop_mode="min_per_chain")

    # rng="table" pretabulates the XLA engine's legacy threefry
    # global-round stream, so the XLA reference opts out of the hash
    # default here
    *_, st_x = run_walnuts_fused(jax.random.PRNGKey(5), q0, h, dl,
                                 rounds=ROUNDS, diag_rows=8,
                                 rng="global", **kw)
    s_p, d_p, qc_p, cnt_p, ng_p, packed = pmk.run_walnuts_pallas(
        jax.random.PRNGKey(5), q0, h, dl, rounds=ROUNDS, block=8,
        rng="table", interpret=True, diag_rows=8, **kw)

    sf_x, si_x, vx_x = pmk._pack(st_x, t.generated_dim
                                 if t._generated else q0.shape[1])
    sf_p, si_p, vx_p = packed[0], packed[1], packed[2]
    # integer state (every branch decision, trial level, row index,
    # draw count) must match EXACTLY; floats may differ by compile-mode
    # FMA/reassociation noise (interpret executes op-by-op, XLA fuses)
    np.testing.assert_array_equal(np.asarray(si_x), np.asarray(si_p))
    np.testing.assert_allclose(np.asarray(sf_x), np.asarray(sf_p),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(vx_x), np.asarray(vx_p),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(st_x.samples),
                               np.asarray(s_p), rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(st_x.diags),
                               np.asarray(d_p), rtol=1e-9, atol=1e-9)
    np.testing.assert_array_equal(np.asarray(st_x.it),
                                  np.asarray(cnt_p))
    assert float(ng_p) > 0


def test_pallas_resume_continues_stream():
    """Two capped Pallas invocations == one long one (state carry +
    n_base round continuation), still matching the XLA engine."""
    t, q0, h, dl, cfg = _setup(C=8)
    N = 50
    kw = dict(target=t, cfg=cfg, num_iter=N, stop_mode="min_per_chain")

    *_, st_x = run_walnuts_fused(jax.random.PRNGKey(3), q0, h, dl,
                                 rounds=128, diag_rows=8,
                                 rng="global", **kw)
    _, _, _, _, _, packed = pmk.run_walnuts_pallas(
        jax.random.PRNGKey(3), q0, h, dl, rounds=64, block=8,
        rng="table", interpret=True, diag_rows=8, **kw)
    s2, d2, qc2, cnt2, ng2, packed2 = pmk.run_walnuts_pallas(
        jax.random.PRNGKey(3), q0, h, dl, rounds=64, block=8,
        rng="table", interpret=True, diag_rows=8, mk_packed=packed,
        **kw)
    np.testing.assert_array_equal(np.asarray(st_x.it),
                                  np.asarray(cnt2))
    np.testing.assert_allclose(np.asarray(st_x.samples),
                               np.asarray(s2), rtol=1e-9, atol=1e-12)
    sf_x, si_x, vx_x = pmk._pack(st_x, q0.shape[1])
    np.testing.assert_allclose(np.asarray(vx_x),
                               np.asarray(packed2[2]),
                               rtol=1e-9, atol=1e-12)


def test_hash_rng_xla_pallas_parity():
    """``rng="hash"`` is one stream across engines: the XLA megakernel
    and the Pallas kernel (interpret mode) key every draw by (seed,
    global chain id, absolute round, purpose) through the shared
    ``make_hash_draw``, so integer state matches exactly."""
    t, q0, h, dl, cfg = _setup(C=16)
    N, ROUNDS = 50, 160
    kw = dict(target=t, cfg=cfg, num_iter=N, stop_mode="min_per_chain")

    *_, st_x = run_walnuts_fused(jax.random.PRNGKey(5), q0, h, dl,
                                 rounds=ROUNDS, diag_rows=8,
                                 rng="hash", **kw)
    s_p, d_p, qc_p, cnt_p, ng_p, packed = pmk.run_walnuts_pallas(
        jax.random.PRNGKey(5), q0, h, dl, rounds=ROUNDS, block=8,
        rng="hash", interpret=True, diag_rows=8, **kw)

    sf_x, si_x, vx_x = pmk._pack(st_x, q0.shape[1])
    np.testing.assert_array_equal(np.asarray(si_x),
                                  np.asarray(packed[1]))
    np.testing.assert_allclose(np.asarray(vx_x), np.asarray(packed[2]),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(st_x.samples),
                               np.asarray(s_p), rtol=1e-9, atol=1e-12)
    np.testing.assert_array_equal(np.asarray(st_x.it),
                                  np.asarray(cnt_p))


def test_hash_rng_per_chain_reproducible():
    """A chain's trajectory under ``rng="hash"`` is a function of its
    global id alone: the first 4 chains of a C=8 run replay the C=4
    run bitwise (the round-counter-keyed ``rng="global"`` mode cannot
    do this — VERDICT round 1, weak #5)."""
    t, q0, h, dl, cfg = _setup(C=8)
    N = 40
    kw = dict(target=t, cfg=cfg, num_iter=N, stop_mode="min_per_chain",
              diag_rows=8, rng="hash")
    s8, d8, *_ = run_walnuts_fused(jax.random.PRNGKey(9), q0, h, dl,
                                   **kw)
    s4, d4, *_ = run_walnuts_fused(jax.random.PRNGKey(9), q0[:4],
                                   h[:4], dl[:4], **kw)
    np.testing.assert_array_equal(np.asarray(s8)[:, :4],
                                  np.asarray(s4))
    np.testing.assert_array_equal(np.asarray(d8)[:, :4],
                                  np.asarray(d4))


def test_pallas_native_rng_moments():
    """Counter-hash RNG (production mode) in the interpreter:
    correct posterior moments on the standard normal."""
    t = wt.targets.std_gauss(6)
    C, N = 64, 150
    q0 = jax.random.normal(jax.random.PRNGKey(0), (C, 6), jnp.float64)
    h = jnp.full((C,), 0.5, jnp.float64)
    dl = jnp.full((C,), 0.1, jnp.float64)
    kw = dict(target=t, cfg=wt.WalnutsConfig(m=5), num_iter=N,
              stop_mode="min_per_chain", block=16, rng="hash",
              interpret=True, diag_rows=8)
    packed = None
    for _ in range(60):
        s, d, qc, cnt, ng, packed = pmk.run_walnuts_pallas(
            jax.random.PRNGKey(1), q0, h, dl, rounds=256,
            mk_packed=packed, **kw)
        if int(np.asarray(cnt).min()) >= N:
            break
    assert int(np.asarray(cnt).min()) >= N
    x = np.asarray(s)
    n_eff = x.shape[0] * x.shape[1] / 8
    assert abs(x.mean()) < 5 / np.sqrt(n_eff)
    assert abs(x.std() - 1.0) < 5 * np.sqrt(0.5 / n_eff)
