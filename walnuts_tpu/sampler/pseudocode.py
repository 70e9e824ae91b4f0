"""Paper-pseudocode WALNUTS ("walnuts/" package mode).

Replicates the reference's clean pseudocode implementation
(``walnuts/walnuts.py:16-408``) — the semantic ground truth "that
follows the pseudocode in the paper" (``README.md:42-45``) — as a
chain-batched JAX program.  This mode differs from the instrumented
engine (:mod:`.transition`) in exactly the ways the reference's two
implementations differ:

* diagonal **inverse-mass metric** everywhere (momentum refresh
  ``rho ~ N(0, inv_mass^{-1})``, kinetic energy, U-turn metric;
  ``walnuts/walnuts.py:97-141,322-325``);
* ``stable_steps``: minimal ``ell = 2^n, n <= max_n`` such that the
  max-min **range** of the Hamiltonian over the macro step is within
  ``max_error`` (``walnuts.py:144-182``) — a range criterion, not the
  endpoint criterion of WALNUTSpy;
* micro-step randomisation ``uniform_3``: ``ell ~ U{ell/2, ell,
  2 ell}`` with a ``-log 3`` pmf Hastings correction
  (``walnuts.py:185-208``);
* whole-subtree extension per depth (``2^depth`` macro steps), then
  iterative power-of-2-span sub-U-turn scan over the new segment
  (``sub_uturn``, ``walnuts.py:62-70``), biased subtree acceptance
  ``exp(lse(W_ext) - lse(W_old))`` with softmax selection within the
  accepted subtree (``walnuts_step``, ``walnuts.py:279-359``).

Documented deviations — the reference has two outright bugs here that
we fix to the paper's intended semantics (cf. SURVEY §7.4):

1. ``extend_orbit`` flips the stored momentum on *every* backward
   extension (``walnuts.py:246-249``), but backward-generated states
   store backward-frame momenta, so the second and later backward
   extensions **retrace the existing orbit** instead of extending it
   (verified empirically against the mounted reference).  We store
   time-oriented momenta and flip exactly once per backward leg.
2. ``choose_micro_steps`` draws from ``{ell//2, ell, 2 ell}`` which
   contains 0 when ``ell_stable == 1`` (``walnuts.py:185-196``),
   producing a division by zero (the reason ``disable_runtime_warnings``
   exists).  We floor the support at 1; the matching pmf gives the
   collapsed support ``{1, 2}`` probabilities ``{2/3, 1/3}`` so the
   Hastings ratio stays exact.
"""

from functools import partial
from typing import NamedTuple

import math

import jax
import jax.numpy as jnp

from ..ops.hamiltonian import hamiltonian, refresh_momentum, uturn
from ..ops.leapfrog import PhasePoint, leapfrog_step

_LOG3 = math.log(3.0)       # python float: no device array at import


class PseudoResult(NamedTuple):
    q: jnp.ndarray            # [C, D] selected positions
    n_grad: jnp.ndarray       # [C] gradient evaluations this transition
    depth_stopped: jnp.ndarray  # [C] depth at which expansion stopped


def _h_range_multistep(target, q, rho, h_micro, nsteps, inv_mass):
    """Leapfrog ``nsteps[c]`` micro steps tracking the min/max
    Hamiltonian over all intermediate states (``walnuts.py:160-178``).
    """
    lp, g = target.logp_grad(q)
    h0 = hamiltonian(lp, rho, inv_mass)

    def cond(carry):
        k, *_ = carry
        return jnp.any(k < nsteps)

    def body(carry):
        k, s, h_min, h_max, nev = carry
        active = k < nsteps
        s2, _, _, _ = leapfrog_step(
            target, s, jnp.where(active, h_micro, 0.0), inv_mass)
        h_cur = hamiltonian(s2.lp, s2.v, inv_mass)
        s_out = PhasePoint(
            q=jnp.where(active[:, None], s2.q, s.q),
            v=jnp.where(active[:, None], s2.v, s.v),
            g=jnp.where(active[:, None], s2.g, s.g),
            lp=jnp.where(active, s2.lp, s.lp),
        )
        h_min = jnp.where(active, jnp.minimum(h_min, h_cur), h_min)
        h_max = jnp.where(active, jnp.maximum(h_max, h_cur), h_max)
        return (k + 1, s_out, h_min, h_max, nev + active.astype(jnp.int32))

    init = (jnp.zeros((), jnp.int32), PhasePoint(q, rho, g, lp), h0, h0,
            jnp.zeros(h0.shape, jnp.int32))
    _, s, h_min, h_max, nev = jax.lax.while_loop(cond, body, init)
    return s, h_min, h_max, nev


def stable_steps(target, q, rho, inv_mass, macro_step, max_error,
                 active, max_n: int = 10):
    """Smallest ``ell = 2^n`` bounding the Hamiltonian range
    (``stable_steps``, ``walnuts.py:144-182``).  Returns
    ``(success, ell, n_grad)``."""
    C = q.shape[0]

    def cond(carry):
        n, done, *_ = carry
        return (n <= max_n) & jnp.any(~done)

    def body(carry):
        n, done, success, ell, nev = carry
        ell_try = jnp.left_shift(jnp.ones((), jnp.int32), n)
        nsteps = jnp.where(done, 0, ell_try)
        h_micro = macro_step / ell_try.astype(macro_step.dtype)
        _, h_min, h_max, nev_k = _h_range_multistep(
            target, q, rho, h_micro, nsteps, inv_mass)
        ok = jnp.isfinite(h_max) & (h_max - h_min <= max_error)
        take = ~done & (ok | (n == max_n))
        success = jnp.where(take, ok, success)
        ell = jnp.where(take, ell_try, ell)
        return (n + 1, done | take, success, ell, nev + nev_k)

    init = (jnp.zeros((), jnp.int32), ~active, jnp.zeros((C,), bool),
            jnp.ones((C,), jnp.int32), jnp.zeros((C,), jnp.int32))
    _, _, success, ell, nev = jax.lax.while_loop(cond, body, init)
    return success, ell, nev


def choose_micro_steps(key, ell_stable, policy: str = "uniform_3"):
    """Draw the simulated micro-step count around ``ell_stable``.

    The reference repo contains three mutually inconsistent
    randomisation schemes (SURVEY §7.4); here they are a named policy:

    * ``"uniform_3"`` — ``ell ~ U{ell/2, ell, 2 ell}`` floored at 1
      (``walnuts/walnuts.py:185-196`` with the zero-step fix);
    * ``"shifted_23"`` — the MATLAB line's scheme
      (``walnuts_imc/p_micro.m:1-6``): exponent ``+0`` w.p. 2/3,
      ``+1`` w.p. 1/3, i.e. ``{ell, 2 ell}`` at ``(2/3, 1/3)``.
      (The third scheme, ``geometric_2``, is the R2P integrator's
      exponent-space version, ``adaptiveIntegrators.py:392-424``.)
    """
    if policy == "uniform_3":
        r = jax.random.randint(key, ell_stable.shape, 0, 3)
        return jnp.where(r == 0, jnp.maximum(ell_stable // 2, 1),
                         jnp.where(r == 1, ell_stable, 2 * ell_stable))
    if policy == "shifted_23":
        coarse = jax.random.uniform(key, ell_stable.shape) < 2.0 / 3.0
        return jnp.where(coarse, ell_stable, 2 * ell_stable)
    raise ValueError(f"unknown micro-step policy {policy!r}")


def micro_steps_logp(ell, ell_stable, policy: str = "uniform_3"):
    """log pmf matching :func:`choose_micro_steps`
    (``walnuts.py:199-208``; ``pmf_p_micro.m:1-7``)."""
    dtype = jnp.result_type(float)
    if policy == "uniform_3":
        lo = jnp.maximum(ell_stable // 2, 1)
        in_support = ((ell == lo) | (ell == ell_stable)
                      | (ell == 2 * ell_stable))
        collapsed = lo == ell_stable  # ell_stable == 1
        p = jnp.where(
            collapsed & (ell == ell_stable), jnp.log(2.0 / 3.0),
            -_LOG3).astype(dtype)
        return jnp.where(in_support, p, -jnp.inf)
    if policy == "shifted_23":
        p = jnp.where(ell == ell_stable, jnp.log(2.0 / 3.0),
                      jnp.log(1.0 / 3.0)).astype(dtype)
        in_support = (ell == ell_stable) | (ell == 2 * ell_stable)
        return jnp.where(in_support, p, -jnp.inf)
    raise ValueError(f"unknown micro-step policy {policy!r}")


def _masked_leapfrog(target, q, rho, g, lp, h_micro, nsteps, inv_mass):
    """``nsteps[c]`` plain leapfrog steps (``walnuts.py:74-95``)."""
    def cond(carry):
        k, *_ = carry
        return jnp.any(k < nsteps)

    def body(carry):
        k, s, nev = carry
        active = k < nsteps
        s2, _, _, _ = leapfrog_step(
            target, s, jnp.where(active, h_micro, 0.0), inv_mass)
        s_out = PhasePoint(
            q=jnp.where(active[:, None], s2.q, s.q),
            v=jnp.where(active[:, None], s2.v, s.v),
            g=jnp.where(active[:, None], s2.g, s.g),
            lp=jnp.where(active, s2.lp, s.lp),
        )
        return (k + 1, s_out, nev + active.astype(jnp.int32))

    init = (jnp.zeros((), jnp.int32), PhasePoint(q, rho, g, lp),
            jnp.zeros(lp.shape, jnp.int32))
    _, s, nev = jax.lax.while_loop(cond, body, init)
    return s, nev


@partial(jax.jit, static_argnames=("target", "max_depth", "max_n",
                                   "micro_policy"))
def walnuts_step_pseudo(key, q, *, target, inv_mass, macro_step,
                        max_depth: int = 10, max_error=0.1, max_n: int = 10,
                        micro_policy: str = "uniform_3"):
    """One paper-mode WALNUTS transition for a ``[C, D]`` batch
    (``walnuts_step``, ``walnuts.py:279-359``)."""
    C, D = q.shape
    dtype = q.dtype
    inv_mass = jnp.broadcast_to(jnp.asarray(inv_mass, dtype), (D,))
    macro = jnp.broadcast_to(jnp.asarray(macro_step, dtype), (C,))
    max_err = jnp.asarray(max_error, dtype)

    k_mom, k_loop = jax.random.split(key)
    rho0 = refresh_momentum(k_mom, (C, D), inv_mass, dtype)
    lp0, g0 = target.logp_grad(q)
    lw0 = -hamiltonian(lp0, rho0, inv_mass)

    # carried endpoint states (time-oriented momenta; deviation 1)
    qp, rhop, gp, lpp = q, rho0, g0, lp0
    qm, rhom, gm, lpm = q, rho0, g0, lp0
    q_sel = q
    log_w_old = lw0          # logsumexp of the accepted orbit's weights
    w_end_f = lw0            # log weight of forward end state
    w_end_b = lw0
    done = jnp.zeros((C,), bool)
    n_grad = jnp.zeros((C,), jnp.int32)
    depth_stop = jnp.full((C,), max_depth, jnp.int32)

    for depth in range(max_depth):
        n_steps = 2**depth
        k_depth = jax.random.fold_in(k_loop, depth)
        k_dir, k_acc, k_pick, k_scan = jax.random.split(k_depth, 4)
        backward = jax.random.bernoulli(k_dir, 0.5, (C,))
        active = ~done

        # starting state of the extension, momentum oriented in the
        # direction of travel
        q_e = jnp.where(backward[:, None], qm, qp)
        rho_e = jnp.where(backward[:, None], -rhom, rhop)
        g_e = jnp.where(backward[:, None], gm, gp)
        lp_e = jnp.where(backward, lpm, lpp)
        w_e = jnp.where(backward, w_end_b, w_end_f)

        def macro_body(carry, j):
            qq, rr, gg, ll, ww, nev = carry
            kj = jax.random.fold_in(k_scan, j)
            k_ell = jax.random.fold_in(kj, 0)
            h_here = hamiltonian(ll, rr, inv_mass)
            _, ell_st, nev1 = stable_steps(
                target, qq, rr, inv_mass, macro, max_err, active, max_n)
            ell = choose_micro_steps(k_ell, ell_st, micro_policy)
            ell_run = jnp.where(active, ell, 0)
            s, nev2 = _masked_leapfrog(
                target, qq, rr, gg, ll,
                macro / ell.astype(dtype), ell_run, inv_mass)
            _, ell_st_next, nev3 = stable_steps(
                target, s.q, -s.v, inv_mass, macro, max_err, active, max_n)
            h_next = hamiltonian(s.lp, s.v, inv_mass)
            ww = ww + jnp.where(
                active,
                (-h_next) - (-h_here)
                + micro_steps_logp(ell, ell_st_next, micro_policy)
                - micro_steps_logp(ell, ell_st, micro_policy),
                0.0)
            # non-finite Hamiltonians poison the weight, not the carry
            ww = jnp.where(jnp.isnan(ww), -jnp.inf, ww)
            nev = nev + nev1 + nev2 + nev3
            return ((s.q, s.v, s.g, s.lp, ww, nev),
                    (s.q, s.v, ww))

        (q_e, rho_e, g_e, lp_e, w_e, nev), (seg_q, seg_rho, seg_w) = \
            jax.lax.scan(macro_body, (q_e, rho_e, g_e, lp_e, w_e,
                                      jnp.zeros((C,), jnp.int32)),
                         jnp.arange(n_steps))
        n_grad = n_grad + nev
        # seg_* are [n_steps, C, ...] in travel order; flip backward
        # segments into time order with time-oriented momenta
        t_ord = jnp.where(backward[None, :, None],
                          jnp.flip(seg_q, 0), seg_q)
        t_rho = jnp.where(backward[None, :, None],
                          -jnp.flip(seg_rho, 0), seg_rho)

        # iterative sub-U-turn scan over the segment
        # (``sub_uturn``, ``walnuts.py:62-70``)
        sub_ut = jnp.zeros((C,), bool)
        span = n_steps
        while span >= 2:
            for i in range(n_steps // span):
                a_idx, b_idx = span * i, span * (i + 1) - 1
                sub_ut = sub_ut | uturn(
                    t_ord[a_idx], t_rho[a_idx],
                    t_ord[b_idx], t_rho[b_idx], inv_mass)
            span //= 2

        su = active & sub_ut
        done = done | su
        depth_stop = jnp.where(su, depth, depth_stop)
        ok = active & ~sub_ut

        # biased subtree accept + softmax selection within the subtree
        # (``walnuts.py:345-350``)
        lse_ext = jax.scipy.special.logsumexp(seg_w, axis=0)
        u_acc = jax.random.uniform(k_acc, (C,), dtype)
        accept = ok & (jnp.log(jnp.maximum(u_acc, 1e-300))
                       < lse_ext - log_w_old)
        gumbel = jax.random.gumbel(k_pick, seg_w.shape, dtype)
        pick = jnp.argmax(seg_w + gumbel, axis=0)          # [C]
        q_pick = seg_q[pick, jnp.arange(C), :]
        q_sel = jnp.where(accept[:, None], q_pick, q_sel)

        # update endpoints (travel-order end is the new extreme state)
        new_end_rho = rho_e  # travel-frame momentum at the new end
        qp = jnp.where((ok & ~backward)[:, None], q_e, qp)
        rhop = jnp.where((ok & ~backward)[:, None], new_end_rho, rhop)
        gp = jnp.where((ok & ~backward)[:, None], g_e, gp)
        lpp = jnp.where(ok & ~backward, lp_e, lpp)
        w_end_f = jnp.where(ok & ~backward, w_e, w_end_f)
        qm = jnp.where((ok & backward)[:, None], q_e, qm)
        rhom = jnp.where((ok & backward)[:, None], -new_end_rho, rhom)
        gm = jnp.where((ok & backward)[:, None], g_e, gm)
        lpm = jnp.where(ok & backward, lp_e, lpm)
        w_end_b = jnp.where(ok & backward, w_e, w_end_b)

        # joined-orbit U-turn with time-oriented momenta
        # (``walnuts.py:352``; deviation 1 makes this the WALNUTSpy
        # convention)
        joined = uturn(qm, rhom, qp, rhop, inv_mass)
        stop_j = ok & joined
        done = done | stop_j
        depth_stop = jnp.where(stop_j, depth + 1, depth_stop)

        log_w_old = jnp.where(ok & ~joined,
                              jnp.logaddexp(log_w_old, lse_ext), log_w_old)

    return PseudoResult(q=q_sel, n_grad=n_grad, depth_stopped=depth_stop)


@partial(jax.jit, static_argnames=("target", "max_depth", "max_n",
                                   "iter_warmup", "iter_sample",
                                   "micro_policy"))
def walnuts_pseudo(key, theta_init, *, target, inv_mass, macro_step,
                   max_depth: int = 10, max_error=0.1,
                   iter_warmup: int = 0, iter_sample: int = 1000,
                   max_n: int = 10, micro_policy: str = "uniform_3"):
    """Chain driver (``walnuts()``, ``walnuts.py:362-408``): no
    adaptation; returns ``draws [iter_sample, C, D]``."""
    q = jnp.asarray(theta_init)

    def step(qq, i):
        k = jax.random.fold_in(key, i)
        res = walnuts_step_pseudo(
            k, qq, target=target, inv_mass=inv_mass, macro_step=macro_step,
            max_depth=max_depth, max_error=max_error, max_n=max_n,
            micro_policy=micro_policy)
        return res.q, res.q

    q, draws = jax.lax.scan(step, q, jnp.arange(iter_warmup + iter_sample))
    return draws[iter_warmup:]
