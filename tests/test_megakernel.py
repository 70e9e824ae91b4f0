"""Megakernel (fully-flattened) driver tests: statistical equivalence
with the synchronised scan driver."""

import jax
import jax.numpy as jnp
import numpy as np

import walnuts_tpu as wt
from walnuts_tpu.sampler.megakernel import run_walnuts_fused


def test_fused_gauss_moments_and_distributions():
    t = wt.targets.std_gauss(10)
    C = 128
    q0 = jax.random.normal(jax.random.PRNGKey(1), (C, 10), jnp.float64)
    h = jnp.full((C,), 0.5, jnp.float64)
    dl = jnp.full((C,), 0.1, jnp.float64)
    s, d, qf, cnt, ng = run_walnuts_fused(
        jax.random.PRNGKey(11), q0, h, dl, target=t,
        cfg=wt.WalnutsConfig(m=6), num_iter=400)
    x = np.asarray(s)[100:]
    n_eff = x.shape[0] * x.shape[1] / 8
    assert abs(x.mean()) < 5 / np.sqrt(n_eff)
    assert abs(x.std() - 1.0) < 5 * np.sqrt(0.5 / n_eff)

    wu = wt.WarmupConfig(warmup_iter=0, adapt_h=False, adapt_delta=False)
    s2, d2, _ = wt.run_walnuts(
        jax.random.PRNGKey(11), q0, target=t, cfg=wt.WalnutsConfig(m=6),
        warmup=wu, num_iter=400, h0=0.5, delta0=0.1)
    d, d2 = np.asarray(d), np.asarray(d2)
    # orbit geometry must match the reference-parity-tested scan driver
    for col in (1, 20, 9, 8, 21, 22):
        assert abs(d[..., col].mean() - d2[..., col].mean()) < 0.1, col
    assert abs((d[..., 19] == 4).mean() - (d2[..., 19] == 4).mean()) < 0.05
    assert abs((d[..., 19] == 5).mean() - (d2[..., 19] == 5).mean()) < 0.02
    assert abs(d[..., 6].mean() - d2[..., 6].mean()) < 1.0  # grad counts


def test_fused_funnel_omega():
    t = wt.targets.funnel(11)
    C = 128
    q0 = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (C, 11),
                                 jnp.float64)
    h = jnp.full((C,), 0.32, jnp.float64)
    dl = jnp.full((C,), 0.34, jnp.float64)
    s, d, qf, cnt, ng = run_walnuts_fused(
        jax.random.PRNGKey(5), q0, h, dl, target=t,
        cfg=wt.WalnutsConfig(m=7), num_iter=600)
    w = np.asarray(s)[150:, :, 0].ravel()
    n_eff = len(w) / 50
    assert abs(w.mean()) < 5 * 3 / np.sqrt(n_eff), w.mean()
    assert abs(w.std() - 3.0) < 5 * 3 * np.sqrt(0.5 / n_eff), w.std()


def test_fused_chunked_resume():
    t = wt.targets.std_gauss(4)
    C = 32
    q0 = jax.random.normal(jax.random.PRNGKey(0), (C, 4), jnp.float64)
    h = jnp.full((C,), 0.5, jnp.float64)
    dl = jnp.full((C,), 0.1, jnp.float64)
    s1, d1, qf, c1, ng1 = run_walnuts_fused(
        jax.random.PRNGKey(1), q0, h, dl, target=t,
        cfg=wt.WalnutsConfig(m=5), num_iter=50)
    s2, d2, qf2, c2, ng2 = run_walnuts_fused(
        jax.random.PRNGKey(2), qf, h, dl, target=t,
        cfg=wt.WalnutsConfig(m=5), num_iter=50)
    assert s1.shape == (50, C, 4)
    np.testing.assert_array_equal(np.asarray(qf), np.asarray(s1)[-1])
    assert np.all(np.isfinite(np.asarray(s2)))


def test_fused_inloop_warmup_matches_scan():
    """In-loop megakernel warmup adapts (H, delta) to the same place
    as the scan driver's adaptation (within stochastic tolerance; the
    megakernel approximates the exact delta-history quantile with a
    P2 estimator)."""
    t = wt.targets.funnel(11)
    C = 128
    q0 = 0.1 * jax.random.normal(jax.random.PRNGKey(3), (C, 11),
                                 jnp.float64)
    wu = wt.WarmupConfig(warmup_iter=100)
    h0 = jnp.full((C,), 0.3, jnp.float64)
    dl0 = jnp.full((C,), 0.3, jnp.float64)
    s, d, qf, cnt, ng, h_mk, dl_mk, _adapt = run_walnuts_fused(
        jax.random.PRNGKey(7), q0, h0, dl0, target=t,
        cfg=wt.WalnutsConfig(m=6), num_iter=100, warmup=wu)
    _, _, state = wt.run_walnuts(
        jax.random.PRNGKey(8), q0, target=t, cfg=wt.WalnutsConfig(m=6),
        warmup=wu, num_iter=100, h0=0.3, delta0=0.3)
    h_mk = float(np.median(np.asarray(h_mk)))
    h_sc = float(np.median(np.asarray(state.h)))
    d_mk = float(np.median(np.asarray(dl_mk)))
    d_sc = float(np.median(np.asarray(state.delta)))
    assert abs(np.log(h_mk / h_sc)) < 0.5, (h_mk, h_sc)
    assert abs(np.log(d_mk / d_sc)) < 0.7, (d_mk, d_sc)
    # adaptation actually moved the tuning, and both engines moved it
    # the same way (the magnitude is stream-dependent; funnel-11 at
    # H0=0.3 sits near the adapted fixed point so it can be small)
    moved_mk = np.log(h_mk / 0.3)
    moved_sc = np.log(h_sc / 0.3)
    assert abs(moved_sc) > 0.02 and abs(moved_mk) > 0.02
    assert np.sign(moved_mk) == np.sign(moved_sc)
    # diagnostics record the tuning in cols 15/18
    d = np.asarray(d)
    assert np.all(d[..., 18] > 0)


def test_fused_pooled_warmup_consensus():
    """Pooled mode: all chains share one (H, delta) after warmup."""
    t = wt.targets.std_gauss(8)
    C = 64
    q0 = jax.random.normal(jax.random.PRNGKey(0), (C, 8), jnp.float64)
    wu = wt.WarmupConfig(warmup_iter=60, pooled=True)
    h0 = jnp.full((C,), 0.4, jnp.float64)
    dl0 = jnp.full((C,), 0.2, jnp.float64)
    s, d, qf, cnt, ng, h_f, dl_f, _adapt = run_walnuts_fused(
        jax.random.PRNGKey(9), q0, h0, dl0, target=t,
        cfg=wt.WalnutsConfig(m=5), num_iter=60, warmup=wu)
    h_f, dl_f = np.asarray(h_f), np.asarray(dl_f)
    assert np.all(np.isfinite(h_f)) and np.all(h_f > 0)
    assert np.ptp(h_f) / np.median(h_f) < 1e-6   # consensus
    assert np.ptp(dl_f) / np.median(dl_f) < 1e-6


def test_fused_min_per_chain_mode():
    """min_per_chain: every chain reaches quota, surplus chains keep
    working (counts >= quota), the stored rectangle is each chain's
    FIRST num_iter draws (fixed transition count — unbiased), moments
    correct over the full rectangle."""
    t = wt.targets.std_gauss(6)
    C = 64
    N = 150
    q0 = jax.random.normal(jax.random.PRNGKey(0), (C, 6), jnp.float64)
    h = jnp.full((C,), 0.5, jnp.float64)
    dl = jnp.full((C,), 0.1, jnp.float64)
    s, d, qf, cnt, ng = run_walnuts_fused(
        jax.random.PRNGKey(1), q0, h, dl, target=t,
        cfg=wt.WalnutsConfig(m=5), num_iter=N, stop_mode="min_per_chain")
    cnt = np.asarray(cnt)
    assert cnt.min() >= N          # every chain reached quota
    assert cnt.sum() > C * N       # surplus chains kept drawing
    x = np.asarray(s)              # [N, C, 6] rectangle, all valid
    assert np.all(np.isfinite(x))
    n_eff = x.shape[0] * x.shape[1] / 8
    assert abs(x.mean()) < 5 / np.sqrt(n_eff)
    assert abs(x.std() - 1.0) < 5 * np.sqrt(0.5 / n_eff)
    # per-chain-mode run with the same key stores the identical first
    # N draws (surplus work must not perturb the stored rectangle)
    s2, *_ = run_walnuts_fused(
        jax.random.PRNGKey(1), q0, h, dl, target=t,
        cfg=wt.WalnutsConfig(m=5), num_iter=N, stop_mode="per_chain")
    np.testing.assert_allclose(x, np.asarray(s2), atol=1e-12)


def test_fused_round_capped_resume_identical():
    """rounds= caps each invocation at ~K rounds and returns the full
    engine state; a chain of capped invocations with mk_state carry is
    bit-identical to one uninterrupted run (same key, n carries)."""
    t = wt.targets.std_gauss(5)
    C, N = 32, 60
    q0 = jax.random.normal(jax.random.PRNGKey(0), (C, 5), jnp.float64)
    h = jnp.full((C,), 0.5, jnp.float64)
    dl = jnp.full((C,), 0.1, jnp.float64)
    kw = dict(target=t, cfg=wt.WalnutsConfig(m=4), num_iter=N,
              stop_mode="min_per_chain")
    s1, d1, qf1, cnt1, ng1 = run_walnuts_fused(
        jax.random.PRNGKey(1), q0, h, dl, **kw)
    stt = None
    for _ in range(200):
        s2, d2, qf2, cnt2, ng2, stt = run_walnuts_fused(
            jax.random.PRNGKey(1), q0, h, dl, rounds=64,
            mk_state=stt, **kw)
        if int(np.asarray(cnt2).min()) >= N:
            break
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=0)
    np.testing.assert_allclose(np.asarray(qf1), np.asarray(qf2), atol=0)
    assert int(ng1) == int(ng2)
    # small separate diags ring carries through (smoke: shape + finite)
    s3, d3, *_ = run_walnuts_fused(
        jax.random.PRNGKey(1), q0, h, dl, diag_rows=4, **kw)
    assert d3.shape[0] == 4
    np.testing.assert_allclose(np.asarray(s3), np.asarray(s1), atol=0)


def test_fused_total_budget_mode():
    """Ring-buffer total-draw budget: all chains stay active, unequal
    counts, correct moments."""
    t = wt.targets.std_gauss(6)
    C = 64
    q0 = jax.random.normal(jax.random.PRNGKey(0), (C, 6), jnp.float64)
    h = jnp.full((C,), 0.5, jnp.float64)
    dl = jnp.full((C,), 0.1, jnp.float64)
    s, d, qf, cnt, ng = run_walnuts_fused(
        jax.random.PRNGKey(1), q0, h, dl, target=t,
        cfg=wt.WalnutsConfig(m=5), num_iter=200, stop_mode="total")
    cnt = np.asarray(cnt)
    assert cnt.sum() >= C * 200
    # most chains exceeded the per-chain quota or are near it
    assert cnt.min() > 50
    full = cnt >= 200
    x = np.asarray(s)[:, full, :]
    n_eff = x.shape[0] * x.shape[1] / 8
    assert abs(x.mean()) < 5 / np.sqrt(n_eff)
    assert abs(x.std() - 1.0) < 5 * np.sqrt(0.5 / n_eff)


def test_fused_d_protocol_matches_scan():
    """adapt_leapfrog_d on the fused engine: moments + orbit geometry
    match the reference-parity-tested scan driver, and the weight
    bookkeeping is the hard D-protocol rejection (lwt in {0, logZero},
    If == Ib on every kept state)."""
    from walnuts_tpu.utils.constants import LOG_ZERO

    t = wt.targets.std_gauss(10)
    C = 128
    cfg = wt.WalnutsConfig(m=6, integrator="adapt_leapfrog_d")
    q0 = jax.random.normal(jax.random.PRNGKey(1), (C, 10), jnp.float64)
    h = jnp.full((C,), 0.5, jnp.float64)
    dl = jnp.full((C,), 0.1, jnp.float64)
    s, d, qf, cnt, ng = run_walnuts_fused(
        jax.random.PRNGKey(11), q0, h, dl, target=t, cfg=cfg,
        num_iter=400)
    x = np.asarray(s)[100:]
    n_eff = x.shape[0] * x.shape[1] / 8
    assert abs(x.mean()) < 5 / np.sqrt(n_eff)
    assert abs(x.std() - 1.0) < 5 * np.sqrt(0.5 / n_eff)
    d = np.asarray(d)
    # D-protocol weight semantics: per-orbit lwt extrema are either 0
    # (reversible) or logZero (hard reject) — never an R2P pmf ratio
    lw = np.concatenate([d[..., 10].ravel(), d[..., 11].ravel()])
    assert np.all((lw == 0.0) | (lw <= LOG_ZERO + 1))

    wu = wt.WarmupConfig(warmup_iter=0, adapt_h=False, adapt_delta=False)
    s2, d2, _ = wt.run_walnuts(
        jax.random.PRNGKey(11), q0, target=t, cfg=cfg, warmup=wu,
        num_iter=400, h0=0.5, delta0=0.1)
    d2 = np.asarray(d2)
    for col in (1, 20, 9, 8, 21, 22, 14):
        assert abs(d[..., col].mean() - d2[..., col].mean()) < 0.1, col
    assert abs((d[..., 19] == 4).mean() - (d2[..., 19] == 4).mean()) < 0.05
    assert abs(d[..., 6].mean() - d2[..., 6].mean()) < 1.0
    assert abs(d[..., 7].mean() - d2[..., 7].mean()) < 1.0


def test_fused_fixed_leapfrog_is_nuts():
    """fixed_leapfrog on the fused engine == multinomial NUTS: single
    unchecked micro step per macro step (If = Ib = c = 0, no backward
    evals, lwt = 0), moments + orbit geometry match the scan driver."""
    t = wt.targets.std_gauss(10)
    C = 128
    cfg = wt.WalnutsConfig(m=6, integrator="fixed_leapfrog")
    q0 = jax.random.normal(jax.random.PRNGKey(2), (C, 10), jnp.float64)
    h = jnp.full((C,), 0.25, jnp.float64)
    dl = jnp.full((C,), 0.1, jnp.float64)
    s, d, qf, cnt, ng = run_walnuts_fused(
        jax.random.PRNGKey(7), q0, h, dl, target=t, cfg=cfg,
        num_iter=400)
    x = np.asarray(s)[100:]
    n_eff = x.shape[0] * x.shape[1] / 8
    assert abs(x.mean()) < 5 / np.sqrt(n_eff)
    assert abs(x.std() - 1.0) < 5 * np.sqrt(0.5 / n_eff)
    d = np.asarray(d)
    assert np.all(d[..., 8] == 0) and np.all(d[..., 9] == 0)  # If
    assert np.all(d[..., 21] == 0) and np.all(d[..., 22] == 0)  # c
    assert np.all(d[..., 7] == 0)                # no backward evals
    assert np.all(d[..., 10] == 0) and np.all(d[..., 11] == 0)  # lwt
    # forward evals == states computed (one per macro step):
    # n_states = neval_f exactly for the fixed integrator
    assert np.all(d[..., 6] >= 1)

    wu = wt.WarmupConfig(warmup_iter=0, adapt_h=False, adapt_delta=False)
    s2, d2, _ = wt.run_walnuts(
        jax.random.PRNGKey(7), q0, target=t, cfg=cfg, warmup=wu,
        num_iter=400, h0=0.25, delta0=0.1)
    d2 = np.asarray(d2)
    for col in (1, 20, 6):
        assert abs(d[..., col].mean() - d2[..., col].mean()) < (
            0.1 if col != 6 else 1.0), col
    assert abs((d[..., 19] == 4).mean() - (d2[..., 19] == 4).mean()) < 0.05


def test_fused_micro_unroll_statistically_equivalent():
    """micro_unroll=4 == micro_unroll=1 in distribution (the RNG
    stream is round-keyed so K changes the draws, not the kernel):
    moments match, grad counts agree (the unroll must not integrate
    past trial boundaries), and diagnostics geometry matches."""
    t = wt.targets.funnel(8)
    C = 256
    cfg = wt.WalnutsConfig(m=6)
    q0 = 0.1 * jax.random.normal(jax.random.PRNGKey(4), (C, 8),
                                 jnp.float64)
    h = jnp.full((C,), 0.4, jnp.float64)
    dl = jnp.full((C,), 0.3, jnp.float64)
    outs = {}
    for K in (1, 4):
        s, d, qf, cnt, ng = run_walnuts_fused(
            jax.random.PRNGKey(12), q0, h, dl, target=t, cfg=cfg,
            num_iter=300, micro_unroll=K)
        outs[K] = (np.asarray(s)[100:], np.asarray(d), float(ng))
    w1, w4 = outs[1][0][..., 0], outs[4][0][..., 0]
    n_eff = w1.size / 20
    se = 3.0 * np.sqrt(2.0 / n_eff)
    assert abs(w1.mean() - w4.mean()) < 5 * se, (w1.mean(), w4.mean())
    assert abs(w1.std() - w4.std()) < 5 * se, (w1.std(), w4.std())
    # same work per transition on average (a biased unroll would
    # over- or under-count trials)
    g1 = outs[1][2] / (300 * C)
    g4 = outs[4][2] / (300 * C)
    assert abs(g1 - g4) / g1 < 0.1, (g1, g4)
    # orbit geometry (doublings, If, c) agrees
    for col in (1, 8, 9, 21, 22):
        m1 = outs[1][1][..., col].mean()
        m4 = outs[4][1][..., col].mean()
        assert abs(m1 - m4) < 0.25 + 0.05 * abs(m1), (col, m1, m4)


def test_fused_d_protocol_min_c_floor_matches_scan():
    """adapt_leapfrog_d with min_c=3 (the Stock-Watson headline
    config, mainSW.py:49): the halving search starts at c=3 and the
    backward sweep also starts at c=3 — fused engine matches the scan
    driver's moments and orbit geometry, and never reports c < 3."""
    t = wt.targets.std_gauss(10)
    C = 128
    cfg = wt.WalnutsConfig(
        m=6, integrator="adapt_leapfrog_d",
        igr=wt.IntegratorConfig(min_c=3))
    q0 = jax.random.normal(jax.random.PRNGKey(6), (C, 10), jnp.float64)
    h = jnp.full((C,), 0.5, jnp.float64)
    dl = jnp.full((C,), 0.1, jnp.float64)
    s, d, qf, cnt, ng = run_walnuts_fused(
        jax.random.PRNGKey(13), q0, h, dl, target=t, cfg=cfg,
        num_iter=300)
    x = np.asarray(s)[100:]
    n_eff = x.shape[0] * x.shape[1] / 8
    assert abs(x.mean()) < 5 / np.sqrt(n_eff)
    assert abs(x.std() - 1.0) < 5 * np.sqrt(0.5 / n_eff)
    d = np.asarray(d)
    assert np.all(d[..., 21] >= 3)   # c floor respected
    wu = wt.WarmupConfig(warmup_iter=0, adapt_h=False,
                         adapt_delta=False)
    s2, d2, _ = wt.run_walnuts(
        jax.random.PRNGKey(13), q0, target=t, cfg=cfg, warmup=wu,
        num_iter=300, h0=0.5, delta0=0.1)
    d2 = np.asarray(d2)
    assert np.all(d2[..., 21] >= 3)
    for col in (1, 20, 8, 9, 21, 22, 14):
        assert abs(d[..., col].mean() - d2[..., col].mean()) < 0.15, col
    assert abs(d[..., 6].mean() - d2[..., 6].mean()) < 2.0
    assert abs(d[..., 7].mean() - d2[..., 7].mean()) < 2.0


def test_fused_round_unroll_same_stream():
    """round_unroll chains U full round bodies per fori iteration —
    identical algorithm and RNG stream, different XLA program.  Over
    one flush period the integer control-flow state must match
    EXACTLY (same trials, same completions, same draw counts) and the
    float state to fp-reassociation tolerance (different programs
    reassociate reductions; measured deltas are last-ulp)."""
    t = wt.targets.funnel(5, generated=lambda q: q[..., :1])
    C = 16
    q0 = 0.3 * jax.random.normal(jax.random.PRNGKey(0), (C, 5),
                                 jnp.float32)
    h = jnp.full((C,), 0.3, jnp.float32)
    dl = jnp.full((C,), 0.3, jnp.float32)
    kw = dict(target=t, cfg=wt.WalnutsConfig(m=6), num_iter=1 << 30,
              stop_mode="min_per_chain", ring_rows=8, diag_rows=8,
              rng="hash", rounds=16)
    states = {}
    for U in (1, 4):
        *_, stt = run_walnuts_fused(jax.random.PRNGKey(2), q0, h, dl,
                                    round_unroll=U, **kw)
        states[U] = stt
    a, b = states[1], states[4]
    assert int(np.asarray(a.n)) == int(np.asarray(b.n))
    for f in ("it", "t", "k", "phase", "c_cur", "i_f", "c_sim",
              "grad_ct", "stop_code", "n_states", "sel_l", "a_abs",
              "b_abs", "xi_bits"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, f)), np.asarray(getattr(b, f)), f)
    for f in ("qc", "qt", "qp", "qm", "h_cur", "delta_cur"):
        np.testing.assert_allclose(
            np.asarray(getattr(a, f)), np.asarray(getattr(b, f)),
            rtol=2e-4, atol=2e-6, err_msg=f)
