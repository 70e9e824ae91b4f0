"""Stationary-efficiency experiment: ESS per 1000 gradient evaluations
vs dimension on the iid standard normal.

Regenerates the reference experiment
``WALNUTSpy_examples/gaussian/mainGaussESS.py:20-89`` /
``plotsGaussESS.py:67-78``: for ``d = 2^8 .. 2^dmax``, run WALNUTS
(R2P and D) and multinomial NUTS (fixed leapfrog) at
``H = 1.4 d^{-1/4}``, and record ``1000 * ess / grad_evals`` for
``q[0]`` and ``sum(q^2)``, against the theory guide ``ESS/grad ~
d^{-1/4}``.  The reference runs 10 sequential repetitions; here the
chain batch IS the repetition axis.

Usage: python examples/gaussian_ess.py [--dmax 12] [--chains 64]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dmax", type=int, default=12)
    ap.add_argument("--chains", type=int, default=64)
    ap.add_argument("--iters", type=int, default=1000)
    ap.add_argument("--out", default="examples/out_gaussian_ess.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import walnuts_tpu as wt
    from walnuts_tpu.diagnostics import ess

    results = []
    for log2d in range(8, args.dmax + 1):
        d = 2**log2d
        h = 1.4 * d**-0.25  # mainGaussESS.py:34
        t = wt.targets.std_gauss(d)
        q0 = jax.random.normal(jax.random.PRNGKey(log2d),
                               (args.chains, d), jnp.float32)
        row = {"d": d, "H": h}
        for integ, tag in [("adapt_leapfrog_r2p", "walnuts_r2p"),
                           ("adapt_leapfrog_d", "walnuts_d"),
                           ("fixed_leapfrog", "nuts")]:
            hh = h if integ != "fixed_leapfrog" else 1.4 * d**-0.25 / 4
            cfg = wt.WalnutsConfig(m=10, integrator=integ)
            wu = wt.WarmupConfig(warmup_iter=0, adapt_h=False,
                                 adapt_delta=False)
            samples, diags, _ = wt.run_walnuts(
                jax.random.PRNGKey(100 + log2d), q0, target=t, cfg=cfg,
                warmup=wu, num_iter=args.iters, h0=hh, delta0=0.3)
            s = np.asarray(samples[1:], np.float64)
            dg = np.asarray(diags)
            nev = dg[..., 6].sum() + dg[..., 7].sum()
            e_q0 = float(np.asarray(ess(jnp.asarray(s[..., 0]))))
            sq = (s**2).sum(-1)
            e_sq = float(np.asarray(ess(jnp.asarray(sq))))
            row[tag] = {
                "ess_per_1000_grad_q0": 1000.0 * e_q0 / nev,
                "ess_per_1000_grad_sumsq": 1000.0 * e_sq / nev,
                "grad_evals": float(nev),
            }
        results.append(row)
        print(json.dumps(row, default=float))

    # d^{-1/4} scaling check on the R2P line (plotsGaussESS.py:67)
    ds = np.array([r["d"] for r in results], float)
    effs = np.array([r["walnuts_r2p"]["ess_per_1000_grad_q0"]
                     for r in results])
    slope = np.polyfit(np.log(ds), np.log(np.maximum(effs, 1e-12)), 1)[0]
    summary = {"fit_slope_log_ess_vs_log_d": slope,
               "theory_slope": -0.25}
    print(json.dumps(summary, default=float))
    with open(args.out, "w") as f:
        json.dump({"rows": results, "summary": summary}, f, indent=1,
                  default=float)


if __name__ == "__main__":
    main()
