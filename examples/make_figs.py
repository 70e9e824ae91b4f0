"""Render the reference's four figure families from the COMMITTED
experiment artifacts (VERDICT r4 item 7).

The acceptance suite replaces the reference's visual checks with
numeric gates; these figures are the human-readable rendering of the
same committed JSONs — no experiment is re-run here.

Reference figure sources regenerated:

* ``plotsGaussESS.py:67,78``   -> fig_gauss_ess.png
  ESS per 1000 gradient evals vs dimension, log-log, with the
  d^{-1/4} theory guide.
* ``plotsGaussTransient.py:33-36`` -> fig_gauss_transient.png
  convergence of the squared-radius statistic into its chi^2_d band:
  fraction of chains inside the band per iteration, per dimension.
* ``plotsFunnel.py:103-122``   -> fig_funnel_transient.png
  the omega = -30 deep-neck transient: recovery traces of the native
  C++ chains and the flagship JAX engine, plus the micro step-size
  floor the halving search reaches.
* ``plotsSW.py:60-141``        -> fig_stock_watson_bands.png
  Stock-Watson posterior quantile bands (time-averaged q10/q50/q90 of
  sigma, z, x, tau) compared across samplers.

Colors: fixed categorical assignment (never re-cycled per figure),
CVD-validated palette; one y-axis per panel; direct labels next to
line ends where the series count allows.

Usage: python examples/make_figs.py  (writes examples/figs/*.png)
"""

import json
import os

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
FIGS = os.path.join(HERE, "figs")

# fixed categorical assignment, one entity = one hue everywhere
C_R2P = "#2a78d6"      # walnuts (R2P)      — blue
C_D = "#eb6834"        # walnuts (D)        — orange
C_NUTS = "#1baf7a"     # NUTS               — aqua
C_NATIVE = "#eda100"   # native C++ engine  — yellow
C_JAX = "#4a3aa7"      # JAX scan engine    — violet
INK = "#0b0b0b"
INK2 = "#52514e"
SURFACE = "#fcfcfb"

SAMPLER_COLOR = {"walnuts_r2p": C_R2P, "walnuts_d": C_D, "nuts": C_NUTS}
SAMPLER_LABEL = {"walnuts_r2p": "WALNUTS (R2P)",
                 "walnuts_d": "WALNUTS (D)", "nuts": "NUTS"}


def _load(name):
    with open(os.path.join(HERE, name)) as f:
        return json.load(f)


def _style(ax, title):
    ax.set_facecolor(SURFACE)
    ax.set_title(title, color=INK, fontsize=10, loc="left")
    ax.grid(True, color="#e6e4df", linewidth=0.6, zorder=0)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color(INK2)
    ax.tick_params(colors=INK2, labelsize=8)


def fig_gauss_ess():
    d = _load("out_gaussian_ess.json")
    rows = d["rows"]
    dims = np.array([r["d"] for r in rows], float)
    fig, axes = plt.subplots(1, 2, figsize=(9, 3.6), dpi=150)
    fig.patch.set_facecolor(SURFACE)
    for ax, fn, fname in zip(
            axes, ("ess_per_1000_grad_q0", "ess_per_1000_grad_sumsq"),
            ("functional q[0]", "functional sum q^2")):
        for tag in ("walnuts_r2p", "walnuts_d", "nuts"):
            y = np.array([r[tag][fn] for r in rows], float)
            ax.loglog(dims, y, "-o", color=SAMPLER_COLOR[tag],
                      label=SAMPLER_LABEL[tag], linewidth=1.8,
                      markersize=4, zorder=3)
        # d^{-1/4} theory guide anchored at the first WALNUTS-D point
        y0 = rows[0]["walnuts_d"][fn]
        ax.loglog(dims, y0 * (dims / dims[0]) ** -0.25, "--",
                  color=INK2, linewidth=1.2, zorder=2,
                  label=r"$d^{-1/4}$ guide")
        _style(ax, f"ESS per 1000 grad evals — {fname}")
        ax.set_xlabel("dimension d", color=INK2, fontsize=9)
    axes[0].set_ylabel("ESS / 1000 grads", color=INK2, fontsize=9)
    axes[0].legend(frameon=False, fontsize=8, labelcolor=INK)
    s = d["summary"]
    fig.suptitle(
        "Gaussian ESS scaling (committed out_gaussian_ess.json; "
        f"fit slope {s['fit_slope_log_ess_vs_log_d']:.3f}"
        f" ± {s['fit_slope_stderr']:.3f} vs theory -0.25)",
        fontsize=10, color=INK)
    fig.tight_layout()
    fig.savefig(os.path.join(FIGS, "fig_gauss_ess.png"),
                facecolor=SURFACE)
    plt.close(fig)


def fig_gauss_transient():
    d = _load("out_gaussian_transient.json")
    rows = d["rows"]
    n = len(rows)
    fig, axes = plt.subplots(1, n, figsize=(2.6 * n, 3.2), dpi=150,
                             sharey=True)
    fig.patch.set_facecolor(SURFACE)
    for ax, r in zip(np.atleast_1d(axes), rows):
        for tag in ("walnuts_r2p", "walnuts_d", "nuts"):
            y = np.array(r[tag]["frac_inside_by_iter"], float)
            ax.plot(np.arange(len(y)), y, color=SAMPLER_COLOR[tag],
                    linewidth=1.8, label=SAMPLER_LABEL[tag], zorder=3)
        ax.axhline(0.95, color=INK2, linestyle="--", linewidth=1.0,
                   zorder=2)
        _style(ax, f"d = {r['d']}")
        ax.set_xlabel("iteration", color=INK2, fontsize=9)
        ax.set_ylim(0, 1.05)
    np.atleast_1d(axes)[0].set_ylabel(
        "fraction of chains inside the\n95% chi-square band",
        color=INK2, fontsize=9)
    np.atleast_1d(axes)[0].legend(frameon=False, fontsize=8,
                                  labelcolor=INK, loc="lower right")
    fig.suptitle("Gaussian transient: convergence of |q|^2 into its "
                 "chi-square band (committed out_gaussian_transient"
                 ".json)", fontsize=10, color=INK)
    fig.tight_layout()
    fig.savefig(os.path.join(FIGS, "fig_gauss_transient.png"),
                facecolor=SURFACE)
    plt.close(fig)


def fig_funnel_transient():
    d = _load("out_funnel_transient.json")
    x = _load("out_funnel_transient_xla_f64.json")
    fig, (ax, ax2) = plt.subplots(
        2, 1, figsize=(7, 5.4), dpi=150, sharex=True,
        gridspec_kw={"height_ratios": [2.2, 1.0]})
    fig.patch.set_facecolor(SURFACE)
    for i, ch in enumerate(d["native_chains"]):
        tr = np.array(ch["omega_trace"], float)
        ax.plot(np.arange(len(tr))[:400], tr[:400], color=C_NATIVE,
                linewidth=1.4, alpha=0.8 if i else 1.0,
                label="native C++ chains" if i == 0 else None,
                zorder=3)
    tr = np.array(x["omega_trace_chain0"], float)
    ax.plot(np.arange(len(tr)), tr, color=C_JAX, linewidth=1.8,
            label="JAX scan engine (f64), chain 0", zorder=4)
    trm = np.array(x["omega_trace_median"], float)
    ax.plot(np.arange(len(trm)), trm, color=C_JAX, linewidth=1.2,
            linestyle=":", label="JAX engine, chain median", zorder=4)
    ax.axhspan(-3 * 3, 3 * 3, color="#e8f0fb", zorder=1,
               label="omega ~ N(0, 9) bulk")
    _style(ax, "funnel transient from omega = -30 (maxC = 30)")
    ax.set_ylabel("omega", color=INK2, fontsize=9)
    ax.legend(frameon=False, fontsize=8, labelcolor=INK,
              loc="lower right")

    mh = np.array(x["micro_h_min_chain0"], float)
    ax2.semilogy(np.arange(len(mh)), mh, color=C_JAX, linewidth=1.6,
                 zorder=3)
    _style(ax2, "micro step-size floor reached by the halving search "
                "(JAX chain 0)")
    ax2.set_xlabel("iteration", color=INK2, fontsize=9)
    ax2.set_ylabel("min micro h", color=INK2, fontsize=9)
    fig.tight_layout()
    fig.savefig(os.path.join(FIGS, "fig_funnel_transient.png"),
                facecolor=SURFACE)
    plt.close(fig)


def fig_stock_watson_bands():
    d = _load("out_stock_watson.json")
    runs = d["runs"]
    quantities = ("sigma", "z", "x", "tau")
    tags = ("walnuts_d", "walnuts_r2p", "nuts")
    fig, axes = plt.subplots(1, len(quantities),
                             figsize=(2.6 * len(quantities), 3.4),
                             dpi=150)
    fig.patch.set_facecolor(SURFACE)
    for ax, qty in zip(axes, quantities):
        for i, tag in enumerate(tags):
            b = runs[tag]["bands"][qty]
            ax.vlines(i, b["q10"], b["q90"],
                      color=SAMPLER_COLOR[tag], linewidth=5,
                      alpha=0.45, zorder=2)
            ax.plot([i], [b["q50"]], "o", color=SAMPLER_COLOR[tag],
                    markersize=8, zorder=3)
        ax.set_xticks(range(len(tags)))
        ax.set_xticklabels([SAMPLER_LABEL[t].replace("WALNUTS ", "W")
                            for t in tags], fontsize=7, color=INK2)
        ax.set_xlim(-0.6, len(tags) - 0.4)
        _style(ax, qty)
    axes[0].set_ylabel("time-averaged posterior q10 / q50 / q90",
                       color=INK2, fontsize=9)
    fig.suptitle(
        "Stock-Watson: posterior quantile-band agreement across "
        "samplers (committed out_stock_watson.json; bands are "
        "time-averaged)", fontsize=10, color=INK)
    fig.tight_layout()
    fig.savefig(os.path.join(FIGS, "fig_stock_watson_bands.png"),
                facecolor=SURFACE)
    plt.close(fig)


def main():
    os.makedirs(FIGS, exist_ok=True)
    fig_gauss_ess()
    fig_gauss_transient()
    fig_funnel_transient()
    fig_stock_watson_bands()
    print("wrote 4 figures to", FIGS)


if __name__ == "__main__":
    main()
