"""Stock-Watson stochastic-volatility model: WALNUTS vs NUTS posterior
quantile bands on real OECD inflation data.

Regenerates ``WALNUTSpy_examples/StockWatson/mainSW.py:41-84`` /
``plotsSW.py:60-141`` with the BridgeStan FFI replaced by the native
JAX model (``walnuts_tpu.targets.stock_watson``): runs WALNUTS-D
(``M=14, H0=0.1, delta0=0.3, minC=3``), WALNUTS-R2P, and NUTS
(``H0=0.002``), then compares posterior quantile bands of the
constrained quantities (sigma, z, x, tau) across samplers.

Usage: python examples/stock_watson.py [--chains 64] [--iters 1500]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import numpy as np


CONFIGS = [
    ("walnuts_d", "adapt_leapfrog_d", 0.1, dict(min_c=3)),
    ("walnuts_r2p", "adapt_leapfrog_r2p", 0.1, dict(min_c=3)),
    ("nuts", "fixed_leapfrog", 0.002, dict()),
]


def run_one(args, tag):
    """Run ONE sampler config and dump its summary JSON (each sampler
    gets its own process: consecutive large program compiles in one
    process intermittently fault the TPU tunnel)."""
    import jax
    import jax.numpy as jnp

    import walnuts_tpu as wt
    from walnuts_tpu.diagnostics import split_rhat

    t = wt.targets.stock_watson()
    T = 252
    q0 = 0.1 * jax.random.normal(jax.random.PRNGKey(0),
                                 (args.chains, t.dim), jnp.float32)

    runs = {}
    for tag, integ, h0, igr_kw in [c for c in CONFIGS if c[0] == tag]:
        cfg = wt.WalnutsConfig(
            m=args.m, integrator=integ,
            igr=wt.IntegratorConfig(**igr_kw))
        adapt = integ != "fixed_leapfrog"
        wu = wt.WarmupConfig(warmup_iter=args.warmup, adapt_h=adapt,
                             adapt_delta=adapt)
        # chunked same-shape invocations with exact resume: one long
        # scan would carry a ~0.4 GB output ring through a minutes-long
        # device program — both known TPU-tunnel fault triggers
        # (ROUND1_NOTES); the iteration counter carries inside the
        # state, so split warmup behaves as one uninterrupted run
        key = jax.random.PRNGKey(hash(tag) % 2**31)
        state = None
        s_parts, d_parts = [], []
        done = 0
        while done < args.iters:
            n = args.chunk   # uniform shape: one compiled program
            samples, diags, state = wt.run_walnuts(
                jax.random.fold_in(key, done), q0, target=t, cfg=cfg,
                warmup=wu, num_iter=n, h0=h0, delta0=0.3,
                resume_state=state)
            # row 0 repeats the previous chunk's last position
            s_parts.append(np.asarray(samples, np.float32)[1:])
            d_parts.append(np.asarray(diags, np.float32))
            done += n
            print(f"{tag}: {done}/{args.iters}", flush=True)
        gen = np.concatenate(s_parts).astype(np.float64)[args.warmup:]
        dg = np.concatenate(d_parts)[args.warmup:]
        # constrained layout: [sigma, z (T-1), x (T), tau (T)]
        bands = {}
        for name, sl in [("sigma", slice(0, 1)),
                         ("z", slice(1, T)),
                         ("x", slice(T, 2 * T)),
                         ("tau", slice(2 * T, 3 * T))]:
            block = gen[:, :, sl].reshape(-1, sl.stop - sl.start)
            bands[name] = {
                "q10": np.quantile(block, 0.10, axis=0).mean(),
                "q50": np.quantile(block, 0.50, axis=0).mean(),
                "q90": np.quantile(block, 0.90, axis=0).mean(),
            }
        rh = np.asarray(split_rhat(jnp.asarray(gen[:, :, ::100])))
        runs[tag] = {
            "bands": bands,
            "grad_evals": float(dg[..., 6].sum() + dg[..., 7].sum()),
            "max_split_rhat_subsampled": float(np.max(rh)),
            "H_final_median": float(np.median(np.asarray(state.h))),
        }
        print(json.dumps({tag: runs[tag]["bands"]["tau"],
                          "grad_evals": runs[tag]["grad_evals"]}, default=float))
    tmp = args.out + "." + tag + ".tmp"
    with open(tmp, "w") as f:
        json.dump(runs[tag], f, default=float)
    os.replace(tmp, args.out + "." + tag)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=64)
    ap.add_argument("--iters", type=int, default=1500)
    ap.add_argument("--warmup", type=int, default=500)
    ap.add_argument("--m", type=int, default=12)
    ap.add_argument("--chunk", type=int, default=100)
    ap.add_argument("--out", default="examples/out_stock_watson.json")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    if args.only:
        run_one(args, args.only)
        return

    import subprocess
    import sys

    import time

    me = os.path.abspath(__file__)
    runs = {}
    for tag, *_ in CONFIGS:
        if os.path.exists(args.out + "." + tag):
            with open(args.out + "." + tag) as f:
                runs[tag] = json.load(f)
            print(f"{tag}: reusing committed fragment")
            continue
        for attempt in (1, 2, 3):
            if attempt > 1:
                time.sleep(300)   # let a crashed TPU worker recover
            r = subprocess.run(
                [sys.executable, me, "--chains", str(args.chains),
                 "--iters", str(args.iters), "--warmup",
                 str(args.warmup), "--m", str(args.m), "--chunk",
                 str(args.chunk), "--out", args.out, "--only", tag])
            if r.returncode == 0:
                break
        else:
            raise SystemExit(f"stock-watson {tag} failed 3x")
        with open(args.out + "." + tag) as f:
            runs[tag] = json.load(f)

    # acceptance: quantile bands agree across samplers (plotsSW.py)
    def band_gap(a, b):
        return max(abs(runs[a]["bands"][k][q] - runs[b]["bands"][k][q])
                   for k in ("sigma", "z", "x", "tau")
                   for q in ("q10", "q50", "q90"))

    res = {
        "runs": runs,
        "band_gap_walnutsD_vs_r2p": band_gap("walnuts_d", "walnuts_r2p"),
        "band_gap_walnutsD_vs_nuts": band_gap("walnuts_d", "nuts"),
    }
    print(json.dumps({k: v for k, v in res.items() if k != "runs"},
                     default=float))
    tmp = args.out + ".tmp"
    with open(tmp, "w") as f:
        json.dump(res, f, indent=1, default=float)
    os.replace(tmp, args.out)


if __name__ == "__main__":
    main()
