"""Riemannian Monge-metric integrators (reference ``monge/monge.py``).

The Monge metric is ``G = alpha^2 g g^T + diag(m)`` with ``g`` the
score; its inverse applications and determinants have closed forms via
the matrix-determinant lemma, so the integrators below need only
Hessian-*vector* products (``target.hvp``, the JAX analogue of the
reference's ``lpFun(q, v=...)`` convention, ``monge/monge.py:11-44``).

* :func:`monge_init` — cached state ``(q, p, f, g, r, L, v, Hr, Hv,
  Ham)`` with ``Ham = -f + 0.5 log L + 0.5 v^T G v``
  (``monge.py:51-97``);
* :func:`monge_int` — the Lan-et-al-style explicit integrator in
  ``(q, p)`` with a running log-Jacobian from four determinant factors
  per step (``monge.py:123-187``);
* :func:`monge_ode_rhs` / :func:`monge_int_adapt` — the exact Monge
  ODE; the reference integrates it with ``scipy.solve_ivp`` at
  rtol/atol 1e-10 (``monge.py:99-118``); here
  ``jax.experimental.ode.odeint`` (adaptive Dormand-Prince);
* :func:`monge_eps_int` — the extended-phase-space explicit symmetric
  composition ``Phi_B Phi_A Phi_C Phi_A Phi_B`` with harmonic coupling
  ``omega`` and the divergence check ``max|q - qt| < h^2``
  (``monge.py:209-312``; assumes unit mass like the reference).

Everything is chain-batched ``[C, D]``.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp


class MongeState(NamedTuple):
    q: jnp.ndarray    # [C, D]
    p: jnp.ndarray    # [C, D]
    lp: jnp.ndarray   # [C]
    g: jnp.ndarray    # [C, D]
    r: jnp.ndarray    # [C, D]  g / m
    big_l: jnp.ndarray  # [C]   L = 1 + alpha^2 r.g
    v: jnp.ndarray    # [C, D]  G^{-1} p
    hr: jnp.ndarray   # [C, D]  H r
    hv: jnp.ndarray   # [C, D]  H v
    ham: jnp.ndarray  # [C]


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def monge_init(target, q, p, alpha=0.5, m=1.0):
    """Evaluate the full cached state (``state.evalFirst``,
    ``monge.py:76-92``)."""
    lp, g = target.logp_grad(q)
    r = g / m
    big_l = 1.0 + alpha**2 * _dot(r, g)
    v = p / m - (alpha**2 / big_l)[:, None] * _dot(r, p)[:, None] * r
    hr = target.hvp(q, r)
    hv = target.hvp(q, v)
    gv = m * v + alpha**2 * _dot(g, v)[:, None] * g
    ham = -lp + 0.5 * jnp.log(big_l) + 0.5 * _dot(v, gv)
    return MongeState(q, p, lp, g, r, big_l, v, hr, hv, ham)


def monge_flip(s: MongeState):
    return s._replace(p=-s.p, v=-s.v, hv=-s.hv)


def monge_int(target, s: MongeState, h, nstep: int, alpha=0.5, m=1.0):
    """Explicit Monge integrator with running log-Jacobian
    (``mongeInt``, ``monge.py:123-187``).  ``h`` is per-chain ``[C]``.

    Returns ``(state, log_jac)``.
    """
    a2 = alpha**2
    hh = h[:, None]

    def body(carry, _):
        q, r, g, v, big_l, phi_grad, hv, log_jac = carry
        aL = (a2 / big_l)
        t1 = v - 0.5 * hh * (phi_grad / m - aL[:, None]
                             * _dot(r, phi_grad)[:, None] * r)
        det0 = 1.0 + 0.5 * h * aL * _dot(r, hv)
        log_jac = log_jac - jnp.log(det0)
        vh = t1 - 0.5 * hh * (aL / det0)[:, None] * _dot(hv, t1)[:, None] * r

        hvh0 = target.hvp(q, vh)
        det1 = 1.0 - 0.5 * h * aL * _dot(r, hvh0)
        log_jac = log_jac + jnp.log(det1)

        q = q + hh * vh
        lp, g = target.logp_grad(q)
        hvh1 = target.hvp(q, vh)
        r = g / m
        big_l = 1.0 + a2 * _dot(r, g)
        aL = a2 / big_l
        det2 = 1.0 + 0.5 * h * aL * _dot(r, hvh1)
        log_jac = log_jac - jnp.log(det2)

        hr = target.hvp(q, r)
        phi_grad = -g + aL[:, None] * hr
        t1 = vh - 0.5 * hh * (phi_grad / m - aL[:, None]
                              * _dot(r, phi_grad)[:, None] * r)
        v = t1 - 0.5 * hh * (aL / det2)[:, None] * _dot(hvh1, t1)[:, None] * r
        hv = target.hvp(q, v)
        det3 = 1.0 - 0.5 * h * aL * _dot(r, hv)
        log_jac = log_jac + jnp.log(det3)
        return (q, r, g, v, big_l, phi_grad, hv, log_jac), (lp, hr)

    phi_grad0 = -s.g + (a2 / s.big_l)[:, None] * s.hr
    init = (s.q, s.r, s.g, s.v, s.big_l, phi_grad0, s.hv,
            -jnp.log(s.big_l))
    (q, r, g, v, big_l, phi_grad, hv, log_jac), (lps, hrs) = jax.lax.scan(
        body, init, None, length=nstep)
    lp = lps[-1]
    hr = hrs[-1]
    log_jac = log_jac + jnp.log(big_l)

    p = m * v + a2 * _dot(g, v)[:, None] * g
    ginv_p = p / m - (a2 / big_l)[:, None] * _dot(r, p)[:, None] * r
    ham = -lp + 0.5 * jnp.log(big_l) + 0.5 * _dot(p, ginv_p)
    out = MongeState(q, p, lp, g, r, big_l, v, hr, hv, ham)
    return out, log_jac


def monge_ode_rhs(target, q, p, alpha=0.5, m=1.0):
    """Exact Monge ODE right-hand side (``mongeIntAdapt``'s inner
    ``ode``, ``monge.py:100-111``): returns ``(dq, dp)``."""
    a2 = alpha**2
    lp, g = target.logp_grad(q)
    r = g / m
    big_l = 1.0 + a2 * _dot(r, g)
    v = p / m - (a2 / big_l)[:, None] * _dot(r, p)[:, None] * r
    hr = target.hvp(q, r)
    phi_grad = -g + (a2 / big_l)[:, None] * hr
    hv = target.hvp(q, v)
    p_force = phi_grad - a2 * _dot(v, g)[:, None] * hv
    return v, -p_force


def monge_int_adapt(target, q0, p0, t_max, alpha=0.5, m=1.0,
                    rtol=1e-10, atol=1e-10):
    """Ground-truth trajectory by adaptive ODE integration (the
    reference's ``solve_ivp`` oracle, ``monge.py:99-118``)."""
    from jax.experimental.ode import odeint

    def rhs(y, t):
        q, p = y
        dq, dp = monge_ode_rhs(target, q, p, alpha, m)
        return (dq, dp)

    ts = jnp.asarray([0.0, t_max])
    qs, ps = odeint(rhs, (q0, p0), ts, rtol=rtol, atol=atol)
    return qs[-1], ps[-1]


def monge_eps_int(target, q, p, qt=None, pt=None, *, key=None, h=0.3,
                  omega=100.0, nstep: int = 1, alpha=0.5):
    """Extended-phase-space integrator (``mongeEPSInt``,
    ``monge.py:209-312``): doubled variables with harmonic coupling,
    symmetric composition B-A-C-A-B; unit mass.

    Returns ``(q, p, qt, pt, ok)`` where ``ok`` is the per-chain
    divergence check ``max|q - qt| < h^2 and max|p - pt| < h^2``.
    """
    a2 = alpha**2
    if qt is None:
        if key is None:
            raise ValueError("key required to jitter the phase-space copy")
        k1, k2 = jax.random.split(key)
        qt = q + h**2 * jax.random.uniform(k1, q.shape, q.dtype, -1.0, 1.0)
        pt = p + h**2 * jax.random.uniform(k2, p.shape, p.dtype, -1.0, 1.0)

    wt1 = 0.5 * jnp.cos(2.0 * omega * h)
    wt2 = 0.5 * jnp.sin(2.0 * omega * h)

    def phi_b(q, p, qt, pt):
        _, gt = target.logp_grad(qt)
        lt = 1.0 + a2 * _dot(gt, gt)
        tmp1 = a2 * _dot(gt, p) / lt
        q = q + 0.5 * h * (p - tmp1[:, None] * gt)
        htgt = target.hvp(qt, gt)
        htp = target.hvp(qt, p)
        pt = pt - 0.5 * h * (-gt + (tmp1**2 + a2 / lt)[:, None] * htgt
                             - tmp1[:, None] * htp)
        return q, p, qt, pt

    def phi_a(q, p, qt, pt):
        _, g = target.logp_grad(q)
        l_ = 1.0 + a2 * _dot(g, g)
        tmp1 = a2 * _dot(g, pt) / l_
        qt = qt + 0.5 * h * (pt - tmp1[:, None] * g)
        hg = target.hvp(q, g)
        hpt = target.hvp(q, pt)
        p = p - 0.5 * h * (-g + (tmp1**2 + a2 / l_)[:, None] * hg
                           - tmp1[:, None] * hpt)
        return q, p, qt, pt

    def phi_c(q, p, qt, pt):
        qbar, pbar = 0.5 * (q + qt), 0.5 * (p + pt)
        dq, dp = q - qt, p - pt
        q = qbar + wt1 * dq + wt2 * dp
        qt = qbar - wt1 * dq - wt2 * dp
        p = pbar + wt1 * dp - wt2 * dq
        pt = pbar - wt1 * dp + wt2 * dq
        return q, p, qt, pt

    def body(carry, _):
        q, p, qt, pt = carry
        q, p, qt, pt = phi_b(q, p, qt, pt)
        q, p, qt, pt = phi_a(q, p, qt, pt)
        q, p, qt, pt = phi_c(q, p, qt, pt)
        q, p, qt, pt = phi_a(q, p, qt, pt)
        q, p, qt, pt = phi_b(q, p, qt, pt)
        return (q, p, qt, pt), None

    (q, p, qt, pt), _ = jax.lax.scan(body, (q, p, qt, pt), None,
                                     length=nstep)
    ok = (jnp.max(jnp.abs(q - qt), axis=-1) < h**2) & (
        jnp.max(jnp.abs(p - pt), axis=-1) < h**2)
    return q, p, qt, pt, ok


def monge_hamiltonian(target, q, p, alpha=0.5):
    """Marginal Monge Hamiltonian at ``(q, p)`` with unit mass
    (``monge.py:219-222``)."""
    a2 = alpha**2
    lp, g = target.logp_grad(q)
    l_ = 1.0 + a2 * _dot(g, g)
    ginv_p = p - (a2 / l_)[:, None] * _dot(g, p)[:, None] * g
    return -lp + 0.5 * jnp.log(l_) + 0.5 * _dot(p, ginv_p)
