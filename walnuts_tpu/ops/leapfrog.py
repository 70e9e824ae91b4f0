"""Masked multi-step symplectic integration — the engine's hot loop.

The reference advances one chain at a time through Python ``for`` loops
of leapfrog micro steps (``WALNUTSpy/adaptiveIntegrators.py:78-84``,
``walnuts/walnuts.py:74-95``).  Here the same dynamics run as a single
``lax.while_loop`` over an entire chain batch ``[C, D]``: each
iteration performs **one batched gradient evaluation** for every chain
that still has micro steps remaining, with per-chain step counts and
per-chain micro step sizes.  Chains whose counter hit zero ride along
masked — this is the fixed-shape execution model that keeps the TPU
dense while chains disagree about how much refinement they need.

Energy bookkeeping is streaming: instead of materialising the
``Hams[0..n]`` array the reference builds per macro step
(``adaptiveIntegrators.py:75``), we carry the running endpoint energy,
the running max consecutive energy jump (feeds the third-order step
size model ``igrConst``, ``adaptiveIntegrators.py:101``), a running
max per-step flow error (for the Flow criteria,
``adaptiveIntegrators.py:246-356``), and an all-finite flag.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .hamiltonian import hamiltonian

# 4th-order Yoshida composition coefficients
# (reference ``adaptiveIntegrators.py:143-144``).
YOSHIDA_W1 = 1.351207191959658
YOSHIDA_W2 = -1.702414383919315


class PhasePoint(NamedTuple):
    """A batch of phase-space points in integration orientation."""

    q: jnp.ndarray     # [C, D] position
    v: jnp.ndarray     # [C, D] velocity (already xi-oriented)
    g: jnp.ndarray     # [C, D] gradient of logp at q
    lp: jnp.ndarray    # [C]    logp at q


class MultistepResult(NamedTuple):
    state: PhasePoint
    h_end: jnp.ndarray        # [C] Hamiltonian at the final state
    max_dh: jnp.ndarray       # [C] max |H_k - H_{k-1}| over executed steps
    max_step_err: jnp.ndarray  # [C] max per-step flow-error estimate
    all_finite: jnp.ndarray   # [C] bool


def leapfrog_step(target, state: PhasePoint, hh, inv_mass=None):
    """One velocity-Verlet micro step; one gradient evaluation.

    ``hh`` is per-chain ``[C]``.  (Reference kernel:
    ``adaptiveIntegrators.py:78-84``.)
    """
    h = hh[:, None]
    vh = state.v + 0.5 * h * state.g
    dq = vh if inv_mass is None else inv_mass * vh
    q2 = state.q + h * dq
    lp2, g2 = target.logp_grad(q2)
    v2 = vh + 0.5 * h * g2
    err = jnp.zeros_like(hh)
    return PhasePoint(q2, v2, g2, lp2), err, 1


def yoshida_step(target, state: PhasePoint, hh, inv_mass=None):
    """One 4th-order 3-stage Yoshida step; three gradient evaluations
    (reference ``adaptiveIntegrators.py:156-175``)."""
    s = state
    for w in (YOSHIDA_W1, YOSHIDA_W2, YOSHIDA_W1):
        s, _, _ = leapfrog_step(target, s, w * hh, inv_mass)
    return s, jnp.zeros_like(hh), 3


def leapfrog_flow_step(target, state: PhasePoint, hh, inv_mass=None):
    """Leapfrog step plus Hermite forward/backward flow-error estimate.

    Two gradient evaluations per step: one at the endpoint, one at the
    reconstructed midpoint (reference ``adaptiveIntegrators.py:260-287``).
    The error is the max-norm discrepancy between the leapfrog update
    and 4th-order Hermite reconstructions in both directions.
    """
    h = hh[:, None]
    q_old, v_old, g_old = state.q, state.v, state.g
    new, _, _ = leapfrog_step(target, state, hh, inv_mass)
    q2, v2, g2 = new.q, new.v, new.g

    q_mid = 0.5 * (q2 + q_old) + (h / 8.0) * (v_old - v2)
    _, g_mid = target.logp_grad(q_mid)

    qf = q_old + h * v_old + h * h * (g_old / 6.0 + g_mid / 3.0)
    err = jnp.max(jnp.abs(qf - q2), axis=-1)
    vf = v_old + (h / 6.0) * (g_old + g2 + 4.0 * g_mid)
    err = jnp.maximum(err, jnp.max(jnp.abs(vf - v2), axis=-1))
    qb = q2 - h * v2 + h * h * (g2 / 6.0 + g_mid / 3.0)
    err = jnp.maximum(err, jnp.max(jnp.abs(qb - q_old), axis=-1))
    vb = -(-v2 + (h / 6.0) * (g_old + g2 + 4.0 * g_mid))
    err = jnp.maximum(err, jnp.max(jnp.abs(vb - v_old), axis=-1))
    return new, err, 2


STEP_FNS = {
    "leapfrog": leapfrog_step,
    "yoshida": yoshida_step,
    "leapfrog_flow": leapfrog_flow_step,
}


def masked_multistep(
    target,
    state: PhasePoint,
    h0_energy,
    h_micro,
    nsteps,
    inv_mass=None,
    step_fn=leapfrog_step,
):
    """Advance each chain ``nsteps[c]`` micro steps of size ``h_micro[c]``.

    Runs ``max(nsteps)`` batched iterations; chains with fewer steps
    freeze in place once their counter is exhausted.  ``nsteps == 0``
    chains pass through untouched (they still occupy lanes in the
    shared gradient evaluations — the cost of fixed-shape execution).
    """
    def cond(carry):
        k, *_ = carry
        return jnp.any(k < nsteps)

    def body(carry):
        k, s, h_end, max_dh, max_err, finite = carry
        active = k < nsteps
        s_new, err, _ = step_fn(target, s, jnp.where(active, h_micro, 0.0), inv_mass)
        h_new = hamiltonian(s_new.lp, s_new.v, inv_mass)
        dh = jnp.abs(h_new - h_end)
        a1 = active[:, None]
        s_out = PhasePoint(
            q=jnp.where(a1, s_new.q, s.q),
            v=jnp.where(a1, s_new.v, s.v),
            g=jnp.where(a1, s_new.g, s.g),
            lp=jnp.where(active, s_new.lp, s.lp),
        )
        h_end = jnp.where(active, h_new, h_end)
        max_dh = jnp.where(active, jnp.maximum(max_dh, dh), max_dh)
        max_err = jnp.where(active, jnp.maximum(max_err, err), max_err)
        finite = jnp.where(active, finite & jnp.isfinite(h_new), finite)
        return (k + 1, s_out, h_end, max_dh, max_err, finite)

    zeros = jnp.zeros_like(h0_energy)
    init = (
        jnp.zeros((), jnp.int32),
        state,
        h0_energy,
        zeros,
        zeros,
        jnp.ones(h0_energy.shape, bool),
    )
    _, s, h_end, max_dh, max_err, finite = jax.lax.while_loop(cond, body, init)
    return MultistepResult(s, h_end, max_dh, max_err, finite)
