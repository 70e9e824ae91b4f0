"""Analytic example targets (layer L0).

Covers the reference's test/experiment distributions:
``WALNUTSpy/targetDistr.py:18-93``, ``test/targets.py:4-29``,
``isokinetic/targets.py:6-68``.  Gradients come from autodiff on the
scalar densities; the batched closed forms below exist where a fused
analytic gradient is cheaper than the autodiff pass.

The funnel family is generalised to arbitrary dimension: ``funnel(D)``
has ``omega ~ N(0, scale^2)`` and ``x_i | omega ~ N(0, e^omega)`` for
``i = 1..D-1`` — ``funnel(11)`` reproduces ``funnel10``
(``targetDistr.py:74-78``), ``funnel(2)`` reproduces ``funnel1``, and
``funnel(101)`` is the driver's headline benchmark config.
"""

import math

import jax.numpy as jnp

from .base import Target

_LOG_2PI = math.log(2.0 * math.pi)


def _norm_logpdf(x, loc=0.0, scale=1.0):
    z = (x - loc) / scale
    return -0.5 * z * z - jnp.log(scale) - 0.5 * _LOG_2PI


# ----------------------------------------------------------------------
def std_gauss(dim: int, generated=None) -> Target:
    """IID standard normal (``targetDistr.py:18-21``).

    ``generated``: optional stored-sample transform (the ``generated``
    argument of ``WALNUTS.py:111``) — e.g. keep only ``sum(q^2)`` for
    the transient experiment instead of the full position history.
    """

    def logp(q):
        return -0.5 * jnp.sum(q * q)

    def logp_grad(q):
        lp = -0.5 * jnp.sum(q * q, axis=-1)
        return lp, -q

    return Target(logp, dim, name=f"std_gauss_{dim}",
                  logp_grad=logp_grad, generated=generated)


def corr_gauss(rho: float = 0.5) -> Target:
    """Bivariate unit-variance normal with correlation rho (``targetDistr.py:25-31``)."""
    tmp = 1.0 - rho**2

    def logp(q):
        return -0.5 * q[0] ** 2 - (0.5 / tmp) * (q[1] - rho * q[0]) ** 2

    def logp_grad(q):
        q0, q1 = q[..., 0], q[..., 1]
        lp = -0.5 * q0**2 - (0.5 / tmp) * (q1 - rho * q0) ** 2
        g = jnp.stack([-(q0 - rho * q1) / tmp, -(q1 - rho * q0) / tmp], axis=-1)
        return lp, g

    return Target(logp, 2, name=f"corr_gauss_rho{rho}", logp_grad=logp_grad)


def smile() -> Target:
    """q0 ~ N(0,1), q1 | q0 ~ N(q0^2, 1) (``targetDistr.py:34-38``)."""

    def logp(q):
        return -0.5 * q[0] ** 2 - 0.5 * (q[1] - q[0] ** 2) ** 2

    return Target(logp, 2, name="smile")


def rosenbrock() -> Target:
    """Rosenbrock-shaped density (``test/targets.py:14-21``)."""

    def logp(q):
        return -0.5 * q[0] ** 2 - 0.5 * (q[1] - q[0] ** 2) ** 2 / 0.19**2

    return Target(logp, 2, name="rosenbrock")


def mod_funnel() -> Target:
    """Smoothed 2-D funnel with bounded curvature (``targetDistr.py:41-51``)."""

    def logp(q):
        x, y = q[0], q[1]
        t2 = 1.0 + jnp.exp(-3.0 * x)
        return -0.5 * (t2 * y**2 + jnp.log(1.0 / t2) + x**2)

    return Target(logp, 2, name="mod_funnel")


def funnel(dim: int, scale: float = 3.0, generated=None) -> Target:
    """Neal's funnel in ``dim`` dimensions.

    ``q[0] = omega ~ N(0, scale^2)``; ``q[1:] | omega ~ N(0, e^omega)``.
    ``funnel(11)`` matches the reference ``funnel10``
    (``targetDistr.py:74-78``); the exact ``omega`` marginal is the
    validation invariant used by the funnel acceptance suite
    (``WALNUTSpy_examples/funnel/plotsFunnel.py:49``).

    ``generated``: optional stored-sample transform (reference:
    the ``generated`` argument of ``WALNUTS.py:111``) — e.g. keep only
    ``(omega, sum x^2)`` summaries on long runs.
    """
    k = dim - 1

    def logp(q):
        w = q[0]
        x = q[1:]
        return _norm_logpdf(w, 0.0, scale) + jnp.sum(
            -0.5 * x * x * jnp.exp(-w) - 0.5 * w - 0.5 * _LOG_2PI
        )

    def logp_grad(q):
        w = q[..., 0]
        x = q[..., 1:]
        e = jnp.exp(-w)
        ss = jnp.sum(x * x, axis=-1)
        lp = (
            -0.5 * (w / scale) ** 2
            - math.log(scale)
            - 0.5 * _LOG_2PI
            - 0.5 * e * ss
            - 0.5 * k * w
            - 0.5 * k * _LOG_2PI
        )
        gw = -w / scale**2 + 0.5 * e * ss - 0.5 * k
        gx = -x * e[..., None]
        return lp, jnp.concatenate([gw[..., None], gx], axis=-1)

    return Target(logp, dim, name=f"funnel_{dim}", logp_grad=logp_grad,
                  generated=generated)


def funnel_rescaled(dim: int, scale: float = 3.0) -> Target:
    """Funnel with the omega coordinate pre-scaled to unit prior sd
    (``targetDistr.py:81-86``)."""
    base = funnel(dim, scale)
    s = jnp.ones(dim).at[0].set(scale)

    def logp(q):
        return base._logp(s * q)

    def logp_grad(q):
        lp, g = base.logp_grad(s * q)
        return lp, s * g

    return Target(logp, dim, name=f"funnel_rescaled_{dim}", logp_grad=logp_grad)


def ill_conditioned_gauss(dim: int, kappa: float = 1e4) -> Target:
    """Diagonal Gaussian with log-linearly spaced variances in [1, kappa]."""
    var = jnp.logspace(0.0, math.log10(kappa), dim)

    def logp(q):
        return -0.5 * jnp.sum(q * q / var)

    def logp_grad(q):
        lp = -0.5 * jnp.sum(q * q / var, axis=-1)
        return lp, -q / var

    return Target(logp, dim, name=f"ill_gauss_{dim}_k{kappa:g}", logp_grad=logp_grad)
