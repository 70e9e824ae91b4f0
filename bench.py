"""Headline benchmark: WALNUTS on Neal's funnel, D=101.

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}``

* value      = aggregate gradient-evaluations/second of the TPU engine
               (funnel D=101, adapt_leapfrog_r2p, chain-batched).
* vs_baseline = value / (single-core NumPy grad-evals/s measured at
               runtime with an equivalent sequential WALNUTS loop) —
               the reference publishes no absolute numbers
               (BASELINE.md), so the baseline is measured in-process
               the way the reference runs: one chain, NumPy, float64.
               North-star target is >= 100x (BASELINE.json).

Also reported in the JSON line under "extra": min-ESS/s across the
funnel's D=101 coordinates and the posterior sanity check on the
exact omega ~ N(0,3^2) marginal.
"""

import json
import time

import numpy as np


CHAINS = 8192
DIM = 101
M = 8
H0 = 0.3
DELTA0 = 0.3
WARMUP = 100
ITERS = 300


# ----------------------------------------------------------------------
# Single-core NumPy baseline: sequential WALNUTS-style adaptive loop,
# written here from the paper's protocol (NOT copied from the
# reference): leapfrog halving search to an energy tolerance + the
# same doubling orbit sizes, one chain, float64.  We time its gradient
# throughput, which is what the reference's efficiency metric counts.
# ----------------------------------------------------------------------
def _np_funnel_logp_grad(q, scale=3.0):
    w = q[0]
    x = q[1:]
    e = np.exp(-w)
    ss = float(x @ x)
    k = len(x)
    lp = -0.5 * (w / scale) ** 2 - 0.5 * e * ss - 0.5 * k * w
    g = np.empty_like(q)
    g[0] = -w / scale**2 + 0.5 * e * ss - 0.5 * k
    g[1:] = -x * e
    return lp, g


def _np_leapfrog(q, v, g, h, n):
    for _ in range(n):
        vh = v + 0.5 * h * g
        q = q + h * vh
        lp, g = _np_funnel_logp_grad(q)
        v = vh + 0.5 * h * g
    return q, v, g, lp


def numpy_baseline_grad_evals_per_s(min_seconds=3.0):
    rng = np.random.default_rng(0)
    q = rng.normal(size=DIM) * 0.5
    lp, g = _np_funnel_logp_grad(q)
    n_evals = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < min_seconds:
        v = rng.normal(size=DIM)
        h_macro = H0
        # one macro step with halving search to the energy tolerance,
        # then 2^M-state orbit equivalent work: forward + backward scans
        h0 = -lp + 0.5 * v @ v
        for c in range(0, 11):
            n = 2 ** c
            q2, v2, g2, lp2 = _np_leapfrog(q, v, g, h_macro / n, n)
            n_evals += n
            if abs((-lp2 + 0.5 * v2 @ v2) - h0) < DELTA0:
                break
        # backward pass (reversibility check, same cost model)
        for cb in range(0, c + 1):
            n = 2 ** cb
            _np_leapfrog(q2, -v2, g2, h_macro / n, n)
            n_evals += n
            if cb >= c:
                break
        q, lp, g = q2, lp2, g2
        if not np.isfinite(lp):
            q = rng.normal(size=DIM) * 0.5
            lp, g = _np_funnel_logp_grad(q)
    dt = time.perf_counter() - t0
    return n_evals / dt


# ----------------------------------------------------------------------
def main():
    import jax
    import jax.numpy as jnp

    import walnuts_tpu as wt
    from walnuts_tpu.diagnostics import ess

    target = wt.targets.funnel(DIM)
    cfg = wt.WalnutsConfig(m=M)
    # pooled consensus warmup: homogeneous (H, delta) across the batch
    # keeps the masked search depths dense on TPU
    wu = wt.WarmupConfig(warmup_iter=WARMUP, pooled=True)

    key = jax.random.PRNGKey(0)
    q0 = 0.3 * jax.random.normal(key, (CHAINS, DIM), jnp.float32)

    def run(key, q0, n_iter):
        return wt.run_walnuts(
            key, q0, target=target, cfg=cfg, warmup=wu,
            num_iter=n_iter, h0=H0, delta0=DELTA0)

    # compile + warmup phase (not timed); pooled consensus adaptation
    samples_w, diags_w, state = run(jax.random.PRNGKey(1), q0, WARMUP)
    jax.block_until_ready(samples_w)

    # timed sampling phase: the megakernel (fully-flattened) engine in
    # total-draw-budget mode — one batched micro step per round for
    # every chain, ring-buffered outputs, no idle tails
    from walnuts_tpu.sampler.megakernel import run_walnuts_fused

    cfg2 = wt.WalnutsConfig(m=M)
    q1 = state.q

    # compile the timed configuration once before timing
    s_c, d_c, q1, cnt_c, ng_c = run_walnuts_fused(
        jax.random.PRNGKey(2), q1, state.h, state.delta,
        target=target, cfg=cfg2, num_iter=ITERS, stop_mode="total")
    jax.block_until_ready(s_c)

    t0 = time.perf_counter()
    samples, diags, q1, counts, n_grad = run_walnuts_fused(
        jax.random.PRNGKey(3), q1, state.h, state.delta,
        target=target, cfg=cfg2, num_iter=ITERS, stop_mode="total")
    samples = jax.block_until_ready(samples)
    dt = time.perf_counter() - t0

    n_grad = float(n_grad)
    grad_per_s = n_grad / dt

    # min-ESS/s over coordinates, from chains whose ring buffer is
    # full, on a 2048-chain subset, scaled to the full batch (ESS is
    # additive over independent chains)
    counts = np.asarray(counts)
    full = np.where(counts >= ITERS)[0][:2048]
    draws = np.asarray(samples, np.float64)
    ess_vals = np.asarray(ess(jnp.asarray(draws[:, full]))) \
        * (CHAINS / len(full))
    min_ess_per_s = float(ess_vals.min() / dt)

    # posterior sanity: omega ~ N(0, 9)
    w = draws[:, full, 0].ravel()
    omega_sd_err = abs(float(w.std()) - 3.0)

    base = numpy_baseline_grad_evals_per_s()

    out = {
        "metric": "grad_evals_per_s_funnel101",
        "value": round(grad_per_s, 1),
        "unit": "grad-evals/s",
        "vs_baseline": round(grad_per_s / base, 2),
        "extra": {
            "chains": CHAINS,
            "iters_timed": ITERS,
            "seconds": round(dt, 2),
            "min_ess_per_s": round(min_ess_per_s, 2),
            "numpy_single_core_grad_evals_per_s": round(base, 1),
            "omega_sd_abs_error": round(omega_sd_err, 4),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
