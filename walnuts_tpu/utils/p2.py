"""Batched, functional P-squared online quantile estimator.

Implements the Jain & Chlamtac (1985, CACM 28(10)) P^2 algorithm as a
pure-JAX state machine so it can ride inside ``lax.scan`` carries, one
estimator per chain (arbitrary leading batch dims).

The reference keeps this as a tiny mutable class
(``WALNUTSpy/P2quantile.py:16-92``) that is pushed once per accepted
integrator step during warmup to drive macro-step-size adaptation
(``WALNUTSpy/WALNUTS.py:139-141,711-712``).  Here every update is a
masked, fixed-shape tensor op: five marker heights ``q``, five marker
positions ``n``, and the first-five-sample buffer ``x`` all live in the
carry, and a ``mask`` argument makes pushes no-ops for chains that did
not produce a sample this step.

Deviation from the reference (documented): when a sample ties the top
marker exactly, the reference's interval search falls off the end of a
Python loop (returns ``None``) and accidentally bumps every marker
position; we classify it into the top interval instead.  Ties have
probability zero for continuous inputs.
"""

from typing import NamedTuple

import jax.numpy as jnp


class P2State(NamedTuple):
    npush: jnp.ndarray  # [...] int32, number of samples pushed
    x: jnp.ndarray      # [..., 5] first-five-sample buffer
    q: jnp.ndarray      # [..., 5] marker heights
    n: jnp.ndarray      # [..., 5] int32 marker positions (1-based)
    p: jnp.ndarray      # [...] probe probability


def p2_init(prob, batch_shape=(), dtype=jnp.float32):
    prob = jnp.broadcast_to(jnp.asarray(prob, dtype), batch_shape)
    return P2State(
        npush=jnp.zeros(batch_shape, jnp.int32),
        x=jnp.zeros(batch_shape + (5,), dtype),
        q=jnp.zeros(batch_shape + (5,), dtype),
        n=jnp.broadcast_to(jnp.arange(1, 6, dtype=jnp.int32), batch_shape + (5,)).copy(),
        p=prob,
    )


def p2_quantile(state: P2State):
    """Current estimate: the middle marker height."""
    return state.q[..., 2]


def _push(state: P2State, xi):
    npush = state.npush + 1
    dtype = state.q.dtype
    xi = jnp.asarray(xi, dtype)
    idx5 = jnp.arange(5, dtype=jnp.int32)

    # --- warm-up phase: buffer the first five samples, then sort ---
    x = jnp.where(idx5 == (npush - 1)[..., None], xi[..., None], state.x)
    q_sorted = jnp.sort(x, axis=-1)
    in_warmup = npush <= 5
    at_five = npush == 5

    # --- steady state: classify xi into a marker interval ---
    q = state.q
    n = state.n
    below = xi < q[..., 0]
    above = xi > q[..., 4]
    # interior interval: 1 + #{j in 1..3 : xi >= q[j]}
    k_mid = 1 + jnp.sum(
        (xi[..., None] >= q[..., 1:4]).astype(jnp.int32), axis=-1
    )
    k = jnp.where(below, 0, jnp.where(above, 5, k_mid))

    # extreme samples replace the end markers
    q = q.at[..., 0].set(jnp.where(below, xi, q[..., 0]))
    q = q.at[..., 4].set(jnp.where(above, xi, q[..., 4]))
    k = jnp.clip(k, 1, 4)

    # shift marker positions at and above interval k
    n = n + (idx5 >= k[..., None]).astype(jnp.int32)

    # desired (fractional) positions, reference WALNUTSpy/P2quantile.py:64-68
    nn = npush.astype(dtype)
    pp = state.p
    npp = jnp.stack(
        [
            jnp.ones_like(nn),
            0.5 * (nn - 1.0) * pp + 1.0,
            (nn - 1.0) * pp + 1.0,
            (nn - 1.0) * (1.0 + pp) / 2.0 + 1.0,
            nn,
        ],
        axis=-1,
    )

    # parabolic / linear marker adjustment for interior markers 2..4
    for i in range(1, 4):  # 0-based marker index
        ni = n[..., i].astype(dtype)
        nip = n[..., i + 1].astype(dtype)
        nim = n[..., i - 1].astype(dtype)
        di = npp[..., i] - ni
        move = ((di >= 1.0) & (nip - ni > 1.0)) | ((di <= -1.0) & (nim - ni < -1.0))
        d = jnp.sign(di)
        qi = q[..., i]
        q_para = qi + (d / (nip - nim)) * (
            (ni - nim + d) * (q[..., i + 1] - qi) / (nip - ni)
            + (nip - ni - d) * (qi - q[..., i - 1]) / (ni - nim)
        )
        ok = (q[..., i - 1] < q_para) & (q_para < q[..., i + 1])
        # linear fallback toward the neighbour in direction d
        d_int = d.astype(jnp.int32)
        q_nb = jnp.where(d_int > 0, q[..., i + 1], q[..., i - 1])
        n_nb = jnp.where(d_int > 0, n[..., i + 1], n[..., i - 1]).astype(dtype)
        q_lin = qi + d * (q_nb - qi) / (n_nb - ni)
        q_new = jnp.where(ok, q_para, q_lin)
        q = q.at[..., i].set(jnp.where(move, q_new, qi))
        n = n.at[..., i].set(jnp.where(move, n[..., i] + d_int, n[..., i]))

    q_out = jnp.where(in_warmup[..., None], jnp.where(at_five[..., None], q_sorted, state.q), q)
    n_out = jnp.where(in_warmup[..., None], state.n, n)
    return P2State(npush=npush, x=x, q=q_out, n=n_out, p=state.p)


def p2_push(state: P2State, xi, mask=None):
    """Push one sample per batch element; ``mask=False`` elements are no-ops."""
    new = _push(state, xi)
    if mask is None:
        return new
    m = jnp.asarray(mask)
    m1 = m[..., None]
    return P2State(
        npush=jnp.where(m, new.npush, state.npush),
        x=jnp.where(m1, new.x, state.x),
        q=jnp.where(m1, new.q, state.q),
        n=jnp.where(m1, new.n, state.n),
        p=state.p,
    )
