"""Effective sample size and Rhat, batched over chains and parameters.

Implements the standard multi-chain ESS estimator (autocovariance via
FFT, Geyer initial-monotone-positive-sequence truncation, cross-chain
variance pooling) that the reference obtains by calling ``arviz.ess``
(``WALNUTSpy_examples/gaussian/mainGaussESS.py:51-55``,
``isokinetic/MCMCutils.py:9-10``), and split-Rhat per Vehtari et al.
(2021).  Everything is jittable; reductions over the chain axis are
plain ``mean``/``var`` ops, so on a chain-sharded batch XLA lowers
them to ``psum``-style collectives automatically.
"""

import jax
import jax.numpy as jnp


def _autocov(x):
    """Per-chain autocovariance via FFT.  ``x`` is ``[N, C]`` (time
    major); returns ``[N, C]`` biased autocovariances (divided by N,
    matching the Stan/arviz convention)."""
    n = x.shape[0]
    xc = x - jnp.mean(x, axis=0, keepdims=True)
    m = 1 << (2 * n - 1).bit_length()  # pad >= 2n for linear correlation
    f = jnp.fft.rfft(xc, n=m, axis=0)
    acov = jnp.fft.irfft(f * jnp.conj(f), n=m, axis=0)[:n]
    return jnp.real(acov) / n


def ess(draws):
    """Multi-chain bulk ESS.

    Args:
        draws: ``[N, C]`` or ``[N, C, K]`` array of ``N`` draws for
            ``C`` chains (and optionally ``K`` parameters).

    Returns:
        scalar (or ``[K]``) effective sample size.
    """
    draws = jnp.asarray(draws)
    if draws.ndim == 2:
        return _ess_nc(draws)
    return jax.vmap(_ess_nc, in_axes=2)(draws)


def _ess_nc(x):
    n, c = x.shape
    dtype = x.dtype
    acov = _autocov(x)                      # [N, C]
    chain_mean = jnp.mean(x, axis=0)        # [C]
    mean_var = jnp.mean(acov[0]) * n / (n - 1.0)
    var_plus = mean_var * (n - 1.0) / n
    if c > 1:
        var_plus = var_plus + jnp.var(chain_mean, ddof=1)

    rho = 1.0 - (mean_var - jnp.mean(acov, axis=1)) / var_plus  # [N]

    # Geyer pairing (Stan convention): P_k = rho_{2k} + rho_{2k+1}
    # including P_0 = rho_0 + rho_1; truncate at the first negative
    # pair and enforce monotone decrease — fixed-shape via masked
    # cumulative ops.
    n_pairs = n // 2
    even = rho[0:2 * n_pairs:2]
    odd = rho[1:2 * n_pairs:2]
    p = even + odd                                # [n_pairs]
    positive = p > 0
    keep = jnp.cumprod(positive.astype(dtype)) > 0
    p = jnp.where(keep, p, 0.0)
    p = jax.lax.associative_scan(jnp.minimum, p)  # monotone decreasing
    p = jnp.maximum(p, 0.0)
    tau = -1.0 + 2.0 * jnp.sum(p)
    tau = jnp.maximum(tau, 1.0 / jnp.log10(jnp.asarray(float(n * c), dtype)))
    return n * c / tau


def ess_per_grad(draws, n_grad_evals):
    """ESS per 1000 gradient evaluations — the reference's efficiency
    metric (``mainGaussESS.py:50-55``)."""
    return 1000.0 * ess(draws) / n_grad_evals


def rhat(draws):
    """Classic (non-split) potential scale reduction over ``[N, C]`` or
    ``[N, C, K]`` draws."""
    draws = jnp.asarray(draws)
    if draws.ndim == 2:
        return _rhat_nc(draws)
    return jax.vmap(_rhat_nc, in_axes=2)(draws)


def _rhat_nc(x):
    n = x.shape[0]
    chain_mean = jnp.mean(x, axis=0)
    chain_var = jnp.var(x, axis=0, ddof=1)
    w = jnp.mean(chain_var)
    b = n * jnp.var(chain_mean, ddof=1)
    var_plus = (n - 1.0) / n * w + b / n
    return jnp.sqrt(var_plus / w)


def split_rhat(draws):
    """Split-Rhat: halve each chain before computing Rhat (Vehtari et
    al. 2021), catching within-chain non-stationarity."""
    draws = jnp.asarray(draws)
    n = draws.shape[0] // 2
    first = draws[:n]
    second = draws[n:2 * n]
    split = jnp.concatenate([first, second], axis=1)
    return rhat(split)
