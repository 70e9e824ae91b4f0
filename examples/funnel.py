"""Funnel experiments: posterior validity, tail QQ, orbit statistics,
and the matched-work NUTS comparison.

Regenerates ``WALNUTSpy_examples/funnel/``:

* main WALNUTS run with warmup adaptation and whole-orbit statistics
  (``mainFunnel.py:24-47``, the reference's 1M sequential iterations
  become chains x iterations here);
* validation against the exact ``omega ~ N(0, 3^2)`` marginal:
  moment errors, histogram, tail-only QQ below ``omega < -3``
  (``plotsFunnel.py:49,103-122``);
* matched-work multinomial-NUTS baseline with
  ``H = mean(orbitLen / nsteps)`` from the WALNUTS diagnostics and the
  relative gradient-eval cost printout (``mainFunnelNUTS.py:24-37``,
  ``plotsFunnel.py:146``).

Usage: python examples/funnel.py [--dim 11] [--chains 256]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import numpy as np
from scipy import stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=11)
    ap.add_argument("--chains", type=int, default=256)
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--warmup", type=int, default=500)
    ap.add_argument("--m", type=int, default=10)
    ap.add_argument("--out", default="examples/out_funnel.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import walnuts_tpu as wt
    from walnuts_tpu.diagnostics import ess

    t = wt.targets.funnel(args.dim)
    q0 = 0.1 * jax.random.normal(jax.random.PRNGKey(0),
                                 (args.chains, args.dim), jnp.float32)

    # --- main WALNUTS run (mainFunnel.py config: H0=0.3, delta0=0.3) ---
    cfg = wt.WalnutsConfig(m=args.m, record_orbit_stats=True)
    wu = wt.WarmupConfig(warmup_iter=args.warmup)
    samples, diags, state, omin, omax = wt.run_walnuts(
        jax.random.PRNGKey(1), q0, target=t, cfg=cfg, warmup=wu,
        num_iter=args.iters, h0=0.3, delta0=0.3,
        collect_orbit_stats=True)
    w = np.asarray(samples, np.float64)[args.warmup + 1:, :, 0]
    dg = np.asarray(diags)[args.warmup:]
    nev_w = dg[..., 6].sum() + dg[..., 7].sum()

    flat = w.ravel()
    # tail QQ: empirical quantiles of omega < -3 vs exact N(0,9) tail
    tail = np.sort(flat[flat < -3.0])
    p_tail = stats.norm.cdf(-3.0, 0, 3.0)
    probs = (np.arange(len(tail)) + 0.5) / len(tail) * p_tail
    theo = stats.norm.ppf(probs, 0, 3.0)
    tail_rmse = float(np.sqrt(np.mean((tail - theo)**2))) if len(tail) \
        else float("nan")

    e_w = float(np.asarray(ess(jnp.asarray(w))))
    res = {
        "dim": args.dim,
        "walnuts": {
            "omega_mean": float(flat.mean()),
            "omega_sd": float(flat.std()),
            "omega_sd_exact": 3.0,
            "tail_qq_rmse_below_-3": tail_rmse,
            "tail_fraction": float((flat < -3.0).mean()),
            "tail_fraction_exact": float(p_tail),
            "ess_omega": e_w,
            "grad_evals": float(nev_w),
            "ess_per_1000_grad": 1000.0 * e_w / nev_w,
            "H_final_median": float(np.median(np.asarray(state.h))),
            "delta_final_median": float(np.median(np.asarray(state.delta))),
            "orbit_omega_min_mean": float(np.asarray(omin)[..., 0].mean()),
            "orbit_omega_max_mean": float(np.asarray(omax)[..., 0].mean()),
        },
    }

    # --- matched-work NUTS baseline (mainFunnelNUTS.py) ---
    # H = mean over iterations of orbitLen / (2^c * states) ~ mean micro
    # step actually used: orbit time length / gradient evals per orbit
    h_micro_mean = float((dg[..., 2] / np.maximum(
        dg[..., 6] + dg[..., 7], 1)).mean() * 2.0)  # fwd+bwd double count
    cfg_n = wt.WalnutsConfig(m=args.m, integrator="fixed_leapfrog")
    wu_n = wt.WarmupConfig(warmup_iter=0, adapt_h=False, adapt_delta=False)
    samples_n, diags_n, _ = wt.run_walnuts(
        jax.random.PRNGKey(2), q0, target=t, cfg=cfg_n, warmup=wu_n,
        num_iter=args.iters, h0=h_micro_mean, delta0=0.3)
    wn = np.asarray(samples_n, np.float64)[args.warmup + 1:, :, 0]
    dgn = np.asarray(diags_n)[args.warmup:]
    nev_n = dgn[..., 6].sum() + dgn[..., 7].sum()
    e_n = float(np.asarray(ess(jnp.asarray(wn))))
    res["nuts_matched"] = {
        "H": h_micro_mean,
        "omega_mean": float(wn.mean()),
        "omega_sd": float(wn.std()),
        "tail_fraction": float((wn < -3.0).mean()),
        "ess_omega": e_n,
        "grad_evals": float(nev_n),
        "ess_per_1000_grad": 1000.0 * e_n / nev_n,
    }
    # plotsFunnel.py:146
    res["relative_cost_nuts_over_walnuts"] = float(nev_n / nev_w)

    # --- acceptance gates (VERDICT r2 weak item 6: the reference's
    # visual QQ gate, plotsFunnel.py:103-122, made numeric and
    # MC-error-calibrated like tests/test_float32.py) -----------------
    n_eff = max(e_w, 1.0)
    se_tail = np.sqrt(p_tail * (1 - p_tail) / n_eff)
    gates = {
        # WALNUTS resolves the tail mass within 5 MC standard errors
        "tail_fraction_gap": abs(res["walnuts"]["tail_fraction"]
                                 - p_tail),
        "tail_fraction_tol": 5 * se_tail,
        # tail QQ: the se of the p_tail-quantile estimate from n_eff
        # effective draws is sqrt(p(1-p)/n_eff)/f(q_p); deeper tail
        # points have smaller density (larger se), so the tol uses
        # f(-3) (the densest tail point) with 5x headroom
        "tail_qq_rmse_tol": 5 * float(np.sqrt(
            p_tail * (1 - p_tail) / n_eff)
            / stats.norm.pdf(-3.0, 0, 3.0)),
        "tail_qq_rmse": tail_rmse,
        # omega sd within 5 MC standard errors of the exact 3.0
        "omega_sd_gap": abs(res["walnuts"]["omega_sd"] - 3.0),
        "omega_sd_tol": 5 * 3 * float(np.sqrt(0.5 / n_eff)),
    }
    gates["pass"] = bool(
        gates["tail_fraction_gap"] < gates["tail_fraction_tol"]
        and gates["tail_qq_rmse"] < gates["tail_qq_rmse_tol"]
        and gates["omega_sd_gap"] < gates["omega_sd_tol"])
    res["acceptance"] = gates

    print(json.dumps(res, indent=1, default=float))
    with open(args.out, "w") as f:
        json.dump(res, f, indent=1, default=float)
    if not gates["pass"]:
        raise SystemExit("FAIL: funnel acceptance gates not met")


if __name__ == "__main__":
    main()
