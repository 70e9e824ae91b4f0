"""Merge per-dimension gaussian-transient fragments into the committed
``examples/out_gaussian_transient.json`` (fragments are produced by
``gaussian_transient.py --dims <d> --out <frag>`` runs, possibly on
different hosts/platforms/dtypes).

Usage: python examples/merge_gaussian_transient.py frag1.json ...
       [--f64-crosscheck frag.json] [--out examples/out_gaussian_transient.json]
"""

import argparse
import json
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("fragments", nargs="+")
    ap.add_argument("--f64-crosscheck", default=None)
    ap.add_argument("--out",
                    default="examples/out_gaussian_transient.json")
    args = ap.parse_args()

    rows = []
    for f in args.fragments:
        with open(f) as fh:
            rows.extend(json.load(fh))
    rows.sort(key=lambda r: r["d"])

    summary = {
        "dims": [r["d"] for r in rows],
        "iters_to_95pct_inside": {
            arm: [r[arm]["iters_to_95pct_inside"] for r in rows]
            for arm in ("walnuts_d", "walnuts_r2p", "nuts")},
        "all_within_31": all(
            0 <= r[arm]["iters_to_95pct_inside"] <= 31
            for r in rows
            for arm in ("walnuts_d", "walnuts_r2p", "nuts")),
        # the experiment's cost content: NUTS needs H = d^{-1/2} to
        # survive the transient, WALNUTS auto-refines at H = d^{-1/4}
        "grad_evals_nuts_over_walnuts_d": [
            round(r["nuts"]["cum_grad_evals_mean"][-1]
                  / r["walnuts_d"]["cum_grad_evals_mean"][-1], 2)
            for r in rows],
    }
    out = {"rows": rows, "summary": summary}
    if args.f64_crosscheck:
        with open(args.f64_crosscheck) as fh:
            out["f64_crosscheck"] = json.load(fh)
    tmp = args.out + ".tmp"
    with open(tmp, "w") as f:
        json.dump(out, f, indent=1, default=float)
    os.replace(tmp, args.out)
    print(json.dumps(summary))
    if not summary["all_within_31"]:
        raise SystemExit("FAIL: an arm missed the 31-iteration band")


if __name__ == "__main__":
    main()
