"""Hamiltonian utilities with optional diagonal inverse-mass metric.

Unifies the reference's two conventions: the pseudocode package's
explicit diagonal inverse mass (``walnuts/walnuts.py:97-141``) and
WALNUTSpy's identity-metric velocities (``WALNUTSpy/WALNUTS.py:256``).
Setting ``inv_mass = 1`` recovers the latter exactly.

All functions are batched: ``q, v`` are ``[..., D]``; reductions are
over the trailing dimension only, so a chain batch costs one fused VPU
pass.
"""

import jax.numpy as jnp


def kinetic_energy(v, inv_mass=None):
    """``0.5 * v^T M^{-1} v`` (reference ``walnuts.py:111-124``)."""
    if inv_mass is None:
        return 0.5 * jnp.sum(v * v, axis=-1)
    return 0.5 * jnp.sum(v * inv_mass * v, axis=-1)


def hamiltonian(lp, v, inv_mass=None):
    """``-logp(q) + K(v)`` given a precomputed log density."""
    return -lp + kinetic_energy(v, inv_mass)


def uturn(q_earlier, v_earlier, q_later, v_later, inv_mass=None):
    """Batched U-turn predicate between two phase-space points.

    ``True`` where ``dot(v_later, M^{-1}(q_later - q_earlier)) < 0`` or
    the same with ``v_earlier`` (reference ``walnuts/walnuts.py:16-33``;
    identity-metric special case ``WALNUTSpy/WALNUTS.py:95-97``).  The
    first argument must be the temporally *earlier* state.
    """
    d = q_later - q_earlier
    if inv_mass is not None:
        d = d * inv_mass
    return (jnp.sum(v_later * d, axis=-1) < 0.0) | (
        jnp.sum(v_earlier * d, axis=-1) < 0.0
    )


def refresh_momentum(key, shape, inv_mass=None, dtype=jnp.float32):
    """Draw ``v ~ N(0, M)`` so that ``M^{-1} v`` has covariance ``M^{-1}``.

    With ``inv_mass=None`` this is a standard-normal velocity refresh
    (``WALNUTSpy/WALNUTS.py:236``); otherwise ``v = M^{1/2} z``
    (``walnuts/walnuts.py:322-325``).
    """
    import jax

    z = jax.random.normal(key, shape, dtype)
    if inv_mass is None:
        return z
    return z * (inv_mass ** -0.5)
