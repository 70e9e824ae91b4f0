"""Transient-phase experiment: convergence of ``sum(q^2)`` from
``q = 0`` into the chi-square band.

Regenerates ``WALNUTSpy_examples/gaussian/mainGaussTransient.py:14-87``
/ ``plotsGaussTransient.py:33-36``: for each dimension, chains start at
the origin and we track what fraction of chains have ``sum(q^2)``
inside the central [0.5%, 99.5%] chi-square band per iteration;
WALNUTS runs ``H = d^{-1/4}``, NUTS (fixed leapfrog) ``H = d^{-1/2}``,
``delta = 0.3``, 31 iterations, 50 repetitions (= chains here).

Usage: python examples/gaussian_transient.py [--dims 2048 8192]
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
    ap.add_argument("--dims", type=int, nargs="+", default=[2048, 8192])
    ap.add_argument("--chains", type=int, default=50)
    ap.add_argument("--iters", type=int, default=31)
    ap.add_argument("--out", default="examples/out_gaussian_transient.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import walnuts_tpu as wt

    out = []
    for d in args.dims:
        t = wt.targets.std_gauss(d)
        lo = stats.chi2.ppf(0.005, d)
        hi = stats.chi2.ppf(0.995, d)
        q0 = jnp.zeros((args.chains, d), jnp.float32)
        row = {"d": d, "band": [lo, hi]}
        for integ, tag, h in [
            ("adapt_leapfrog_r2p", "walnuts", d**-0.25),
            ("fixed_leapfrog", "nuts", d**-0.5),
        ]:
            cfg = wt.WalnutsConfig(m=10, integrator=integ)
            wu = wt.WarmupConfig(warmup_iter=0, adapt_h=False,
                                 adapt_delta=False)
            samples, diags, _ = wt.run_walnuts(
                jax.random.PRNGKey(d), q0, target=t, cfg=cfg, warmup=wu,
                num_iter=args.iters, h0=h, delta0=0.3)
            sq = (np.asarray(samples, np.float64)**2).sum(-1)  # [it+1, C]
            inside = (sq >= lo) & (sq <= hi)
            frac = inside.mean(axis=1)
            first_in = int(np.argmax(frac > 0.95)) if np.any(
                frac > 0.95) else -1
            row[tag] = {
                "frac_inside_by_iter": frac.tolist(),
                "iters_to_95pct_inside": first_in,
            }
        out.append(row)
        print(json.dumps({k: row[k] if k != "walnuts" and k != "nuts"
                          else {kk: row[k][kk] for kk in
                                ["iters_to_95pct_inside"]}
                          for k in row}, default=float))

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1, default=float)


if __name__ == "__main__":
    main()
