"""Validation statistics matching the reference's analysis utilities
(``WALNUTSpy/MCMCutils.py:15-40``) as data-producing functions (no
plotting — return the arrays the reference would plot).
"""

import jax.numpy as jnp
from jax.scipy.special import ndtri


def qq_normal(samples):
    """Theoretical-vs-sample normal quantiles (``MCMCutils.py:15-25``).

    Returns ``(theoretical, sorted_samples)`` where ``theoretical`` are
    standard-normal quantiles at the plotting positions
    ``(i + 0.5) / n``, scaled by the sample mean/sd.
    """
    x = jnp.sort(jnp.ravel(samples))
    n = x.shape[0]
    probs = (jnp.arange(n) + 0.5) / n
    theo = ndtri(probs) * jnp.std(x) + jnp.mean(x)
    return theo, x


def index_stat_histogram(diagnostics, bins: int = 20):
    """Histogram of |diagnostics[..., 23]| — the normalised signed
    time-position of the selected state.  Near-uniform on (0, 1) for a
    correct sampler (``MCMCutils.py:28-40``).

    Returns ``(counts, edges, chi2)`` where ``chi2`` is the uniformity
    chi-square against the flat expectation.
    """
    x = jnp.abs(jnp.asarray(diagnostics)[..., 23].ravel())
    x = x[x > 0]
    counts, edges = jnp.histogram(x, bins=bins, range=(0.0, 1.0))
    expect = x.shape[0] / bins
    chi2 = jnp.sum((counts - expect) ** 2 / expect)
    return counts, edges, chi2
