"""Stock-Watson mixing probe: measure the transient length and the
integrated autocorrelation time of the SLOWEST constrained coordinate
under a given sampler config, so the real experiment's burn-in and
draw budget can be sized from data instead of guessed.

Context (round 4): the fixed-tuning protocol (mode + 0.5-sd jitter,
500 burn-in, 400 draws) produced split-Rhat 17 and a 121-unit band
gap on the z block.  The z chain (log volatility of the tau trend,
``sw_innov.stan:28-36``) is only one-sidedly identified — the
likelihood is nearly flat for z -> -inf — so it is the natural slow
direction.  This probe quantifies it.

Usage: python tools/sw_probe.py [--chains 64] [--iters 3000]
                                [--burnin 1000] [--tag walnuts_d]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=64)
    ap.add_argument("--iters", type=int, default=3000)
    ap.add_argument("--burnin", type=int, default=1000)
    ap.add_argument("--tag", default="walnuts_d")
    ap.add_argument("--init", default="mode",
                    choices=["mode", "stan", "prior_typical"])
    ap.add_argument("--model", default="reference",
                    choices=["reference", "proper"])
    ap.add_argument("--out", default="/tmp/sw_probe.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import walnuts_tpu as wt
    from walnuts_tpu.diagnostics import split_rhat, ess
    from examples.stock_watson import CONFIGS, find_mode, _stream

    t = wt.targets.stock_watson(proper=(args.model == "proper"))
    T = 252
    C = args.chains
    (tag, integ, h0, igr_kw, adapt, m_arm), = [
        c for c in CONFIGS if c[0] == args.tag]
    cfg = wt.WalnutsConfig(m=m_arm, integrator=integ,
                           igr=wt.IntegratorConfig(**igr_kw))

    if args.init == "mode":
        mode, mode_lp = find_mode(t)
        print(f"mode logp {mode_lp:.1f}", flush=True)
        q0 = mode[None, :] + 0.5 * jax.random.normal(
            jax.random.PRNGKey(0), (C, t.dim), jnp.float32)
    elif args.init == "stan":
        # Stan's default: unconstrained ~ U(-2, 2)
        q0 = jax.random.uniform(jax.random.PRNGKey(0), (C, t.dim),
                                jnp.float32, -2.0, 2.0)
    else:
        # typical-set-ish: innovations ~ N(0,1), scales at prior mode
        q0 = jax.random.normal(jax.random.PRNGKey(0), (C, t.dim),
                               jnp.float32)
        q0 = q0.at[:, 0].set(2.3 + 0.3 * q0[:, 0])   # tSigma

    key = jax.random.PRNGKey(12345)
    h_t = jnp.full((C,), h0, jnp.float32)
    d_t = jnp.full((C,), 0.3, jnp.float32)

    if args.burnin > 0:
        stt = _stream(jax.random.fold_in(key, 1), q0, h_t, d_t,
                      target=t, cfg=cfg, num_iter=args.burnin,
                      ring_rows=8, tag="probe:burnin")
        q0 = stt.qc

    stt = _stream(jax.random.fold_in(key, 2), q0, h_t, d_t, target=t,
                  cfg=cfg, num_iter=args.iters, tag="probe:sample")
    gen = np.asarray(stt.samples, np.float64)[: args.iters]  # [I,C,756]

    # per-coordinate split-rhat over the full window and trailing half
    rh_full = np.asarray(split_rhat(jnp.asarray(gen)))
    rh_half = np.asarray(split_rhat(jnp.asarray(gen[args.iters // 2:])))
    worst = np.argsort(rh_full)[::-1][:10]

    def block(i):
        if i == 0:
            return "sigma"
        if i < T:
            return f"z[{i}]"
        if i < 2 * T:
            return f"x[{i - T + 1}]"
        return f"tau[{i - 2 * T + 1}]"

    rows = []
    for i in worst:
        tr = gen[:, :, i]
        e = float(np.asarray(ess(jnp.asarray(tr))))
        tau_int = tr.shape[0] * tr.shape[1] / max(e, 1.0)
        rows.append({
            "coord": block(int(i)),
            "rhat_full": float(rh_full[i]),
            "rhat_last_half": float(rh_half[i]),
            "ess": e,
            "tau_iters": tau_int,
            "chain_mean_spread": float(tr.mean(0).std()),
            "within_sd": float(tr.std(1).mean()),
        })
        print(json.dumps(rows[-1]), flush=True)

    # transient: cross-chain mean of the worst coord in 100-iter windows
    wi = int(worst[0])
    nw = args.iters // 100
    win = gen[: nw * 100, :, wi].reshape(nw, 100, C).mean((1, 2))
    out = {
        "tag": args.tag, "init": args.init, "chains": C,
        "iters": args.iters, "burnin": args.burnin,
        "max_rhat_full": float(rh_full.max()),
        "max_rhat_last_half": float(rh_half.max()),
        "worst": rows,
        "worst_coord_window_means": [float(v) for v in win],
        "grad_evals": float(np.asarray(stt.grad_ct, np.int64).sum()),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("max_rhat_full", "max_rhat_last_half")}))


if __name__ == "__main__":
    main()
