"""Pluggable step kernels for the generic-step NUTS sampler.

The reference's isokinetic line makes NUTS generic over "step objects"
(``isokinetic/WALNUTS.py:113-338`` runs over both ``adaptHMCstepE``
and ``adaptMCstepE``).  Here a kernel is a small static Python object
bundling the state conventions of one dynamics:

* ``init/refresh/flip`` — state construction and momentum handling;
* ``velocity`` — what enters U-turn checks (``s.velocity()``,
  ``isokinetic/WALNUTS.py:108-110``);
* ``ham`` — the energy whose negative exponent weights states;
* ``step`` — one adaptive macro step returning
  ``(state, lwt, StepStats)``.

Kernels are hashable (static) so they can be closed over by jit.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.isokinetic import (
    MCState,
    StepStats,
    adapt_mc_step_e,
    adapt_mc_step_flow2,
    fixed_mc_step,
    isokinetic_multistep,
    refresh_u,
)
from ..ops.leapfrog import PhasePoint, leapfrog_step, masked_multistep
from ..utils.constants import LOG_ZERO


def _pow2(c):
    return jnp.left_shift(jnp.ones((), jnp.int32), c)


def _traj_flow_step(integrate, state, h_macro, delta, active, c_min, c_max):
    """Trajectory-comparison flow-error halving protocol shared by
    ``adaptMCstepFlow`` (``microCanonical.py:323-464``) and
    ``adaptHMCstepF`` (``hamiltonian.py:212-309``).

    ``integrate(state, h_micro, nsteps) -> (state, log_jac, ok, nev)``
    runs one refinement trial.  Acceptance at level ``c`` requires (a)
    the endpoint to move less than ``delta`` (sup-norm over position
    and velocity) relative to the previous refinement's endpoint, and
    (b) an explicit reversal check: integrating back from the flipped
    endpoint at level ``c-1`` must return within ``delta`` of the
    start.  The backward pass (run when ``If > c_min + 1``) applies
    the same two-part test from the flipped endpoint.
    """
    C, D = state.q.shape
    dtype = state.q.dtype
    big = jnp.full((C, D), 1.0e30, dtype)

    def _dist(qa, ua, qb, ub, flip_u):
        dq = jnp.max(jnp.abs(qa - qb), axis=-1)
        du = jnp.max(jnp.abs(ua + ub if flip_u else ua - ub), axis=-1)
        return jnp.maximum(dq, du)

    def _search(s0, act):
        def cond(carry):
            c, done, *_ = carry
            return (c <= c_max) & jnp.any(~done)

        def body(carry):
            c, done, prev_q, prev_u, out, w_out, ok_out, i_acc, cobs, nev \
                = carry
            nsteps = jnp.where(done, 0, _pow2(c))
            h_micro = h_macro / _pow2(c).astype(dtype)
            r_state, r_jac, r_ok, r_nev = integrate(s0, h_micro, nsteps)
            err = _dist(r_state.q, r_state.u, prev_q, prev_u, False)
            cand = ~done & r_ok & (err < delta)

            # reversal check at level c-1 (masked)
            nb = jnp.where(cand, _pow2(jnp.maximum(c - 1, 0)), 0)
            h_b = h_macro / _pow2(jnp.maximum(c - 1, 0)).astype(dtype)
            rb_state, _, rb_ok, rb_nev = integrate(
                r_state._replace(u=-r_state.u), h_b, nb)
            err_b = _dist(rb_state.q, rb_state.u, s0.q, s0.u, True)
            accept = cand & rb_ok & (err_b < delta)

            n_half = (_pow2(c) // 2).astype(dtype)
            cobs_c = jnp.maximum(err, err_b) * n_half**2 / h_macro**3

            take = accept | (~done & (c == c_max))
            sel = take[:, None]
            out = MCState(
                q=jnp.where(sel, r_state.q, out.q),
                u=jnp.where(sel, r_state.u, out.u),
                g=jnp.where(sel, r_state.g, out.g),
                lp=jnp.where(take, r_state.lp, out.lp),
            )
            w_out = jnp.where(take, r_jac, w_out)
            ok_out = jnp.where(take, r_ok, ok_out)
            i_acc = jnp.where(take, c, i_acc)
            cobs = jnp.where(take, cobs_c, cobs)
            nev = nev + r_nev + rb_nev
            prev_q = jnp.where(done[:, None], prev_q, r_state.q)
            prev_u = jnp.where(done[:, None], prev_u, r_state.u)
            return (c + 1, done | take, prev_q, prev_u, out, w_out, ok_out,
                    i_acc, cobs, nev)

        zf = jnp.zeros((C,), dtype)
        zi = jnp.zeros((C,), jnp.int32)
        init = (jnp.asarray(c_min, jnp.int32), ~act, big, big, s0, zf,
                jnp.ones((C,), bool), jnp.full((C,), c_max, jnp.int32),
                zf, zi)
        (_, _, _, _, out, w_out, ok_out, i_acc, cobs, nev) = \
            jax.lax.while_loop(cond, body, init)
        return out, w_out, ok_out, i_acc, cobs, nev

    out, w_out, ok_out, i_f, cobs, nev_f = _search(state, active)

    bw_active = active & (i_f > c_min + 1)
    state_b = out._replace(u=-out.u)
    out_b, _, _, i_b0, _, nev_b = _search(state_b, bw_active)
    i_b = jnp.where(bw_active, jnp.minimum(i_b0, i_f), i_f)

    lwt = -w_out + jnp.where(i_b < i_f, LOG_ZERO, 0.0)
    lwt = jnp.where(ok_out, lwt, LOG_ZERO)
    lwt = jnp.where(active, lwt, 0.0)
    stats = StepStats(
        n_evals=jnp.where(active, nev_f + nev_b, 0),
        i_f=jnp.where(active, i_f, 0),
        i_b=jnp.where(active, i_b, 0),
        energy_err=jnp.zeros((C,), dtype),
        c_obs=jnp.where(active, cobs, 0.0),
        basic=active & (i_f <= c_min + 1),
    )
    out = MCState(
        q=jnp.where(active[:, None], out.q, state.q),
        u=jnp.where(active[:, None], out.u, state.u),
        g=jnp.where(active[:, None], out.g, state.g),
        lp=jnp.where(active, out.lp, state.lp),
    )
    return out, lwt, stats


class IsokineticKernel(NamedTuple):
    """Isokinetic dynamics with unit-sphere velocity
    (``microCanonical.py:16-316``).

    ``variant``: ``"energy"`` = modified-energy halving
    (``adaptMCstepE``), ``"flow"`` = trajectory-comparison flow error
    (``adaptMCstepFlow``), ``"flow2"`` = Euler-comparison flow error
    (``adaptMCstepFlow2``).  ``adaptive=False`` = single fixed step
    (``fixedMCstep``)."""

    c_min: int = 0
    c_max: int = 10
    adaptive: bool = True
    variant: str = "energy"

    def init(self, target, q):
        lp, g = target.logp_grad(q)
        return MCState(q, jnp.zeros_like(q), g, lp)

    def refresh(self, key, state):
        return state._replace(u=refresh_u(key, state.q.shape, state.q.dtype))

    def flip(self, state):
        return state._replace(u=-state.u)

    def velocity(self, state):
        return state.u

    def ham(self, state):
        return -state.lp

    def step(self, key, target, state, h_macro, delta, active):
        if not self.adaptive:
            return fixed_mc_step(key, target, state, h_macro, delta, active,
                                 c_min=self.c_min, c_max=self.c_max)
        if self.variant == "energy":
            return adapt_mc_step_e(key, target, state, h_macro, delta,
                                   active, c_min=self.c_min,
                                   c_max=self.c_max)
        if self.variant == "flow2":
            return adapt_mc_step_flow2(key, target, state, h_macro, delta,
                                       active, c_min=self.c_min,
                                       c_max=self.c_max)
        if self.variant == "flow":
            def integrate(s, h_micro, nsteps):
                r = isokinetic_multistep(target, s, h_micro, nsteps)
                return r.state, r.log_jac, r.all_ok, r.n_evals

            return _traj_flow_step(integrate, state, h_macro, delta, active,
                                   self.c_min, self.c_max)
        raise ValueError(f"unknown isokinetic variant {self.variant!r}")


class HMCKernel(NamedTuple):
    """Hamiltonian dynamics with Gaussian momentum; ``adaptHMCstepE``'s
    energy-error halving protocol (``isokinetic/hamiltonian.py:122-210``).
    The state reuses ``MCState`` with ``u`` holding the full velocity.

    ``variant``: ``"energy"`` = energy-error halving
    (``adaptHMCstepE``), ``"flow"`` = trajectory-comparison flow error
    with explicit reversal checks (``adaptHMCstepF``,
    ``hamiltonian.py:212-309``).
    """

    c_min: int = 0
    c_max: int = 10
    adaptive: bool = True
    variant: str = "energy"

    def init(self, target, q):
        lp, g = target.logp_grad(q)
        return MCState(q, jnp.zeros_like(q), g, lp)

    def refresh(self, key, state):
        v = jax.random.normal(key, state.q.shape, state.q.dtype)
        return state._replace(u=v)

    def flip(self, state):
        return state._replace(u=-state.u)

    def velocity(self, state):
        return state.u

    def ham(self, state):
        return -state.lp + 0.5 * jnp.sum(state.u * state.u, axis=-1)

    def step(self, key, target, state, h_macro, delta, active):
        del key
        if self.adaptive and self.variant == "flow":
            def integrate(s, h_micro, nsteps):
                pp = PhasePoint(s.q, s.u, s.g, s.lp)
                r = masked_multistep(target, pp, -s.lp, h_micro, nsteps,
                                     None, leapfrog_step)
                out = MCState(r.state.q, r.state.v, r.state.g, r.state.lp)
                return (out, jnp.zeros_like(s.lp), r.all_finite, r.n_evals)

            return _traj_flow_step(integrate, state, h_macro, delta, active,
                                   self.c_min, self.c_max)

        C = state.lp.shape[0]
        dtype = state.q.dtype
        start = PhasePoint(state.q, state.u, state.g, state.lp)
        ham0 = self.ham(state)

        def fwd_cond(carry):
            c, done, *_ = carry
            return (c <= self.c_max) & jnp.any(~done)

        def fwd_body(carry):
            c, done, out, h_out, i_f, err, cobs, nev = carry
            if not self.adaptive:
                nsteps = jnp.where(done, 0, 1)
                h_micro = h_macro
            else:
                nsteps = jnp.where(done, 0, _pow2(c))
                h_micro = h_macro / _pow2(c).astype(dtype)
            r = masked_multistep(target, start, ham0, h_micro, nsteps,
                                 None, leapfrog_step)
            e = jnp.abs(r.h_end - ham0)
            n_f = _pow2(c).astype(dtype)
            accept = r.all_finite & (e < delta)
            if not self.adaptive:
                accept = jnp.ones_like(accept)
            take = ~done & (accept | (c == self.c_max))
            sel = take[:, None]
            out = PhasePoint(
                q=jnp.where(sel, r.state.q, out.q),
                v=jnp.where(sel, r.state.v, out.v),
                g=jnp.where(sel, r.state.g, out.g),
                lp=jnp.where(take, r.state.lp, out.lp),
            )
            h_out = jnp.where(take, r.h_end, h_out)
            i_f = jnp.where(take, c, i_f)
            err = jnp.where(take, r.h_end - ham0, err)
            cobs = jnp.where(take, e * n_f**2 / h_macro**3, cobs)
            nev = nev + r.n_evals
            return (c + 1, done | take, out, h_out, i_f, err, cobs, nev)

        zf = jnp.zeros((C,), dtype)
        zi = jnp.zeros((C,), jnp.int32)
        c_hi = self.c_max if self.adaptive else self.c_min
        init = (jnp.asarray(self.c_min, jnp.int32), ~active, start, ham0,
                zi, zf, zf, zi)
        (_, _, out, h_out, i_f, err, cobs, nev_f) = jax.lax.while_loop(
            fwd_cond, fwd_body, init)
        del c_hi

        # backward Ib pass (``hamiltonian.py:139-158``)
        start_b = PhasePoint(out.q, -out.v, out.g, out.lp)
        ham_b0 = h_out
        bw_active = active & (i_f > self.c_min) & jnp.asarray(self.adaptive)
        max_try = i_f - 1

        def bwd_cond(carry):
            c, found, *_ = carry
            return jnp.any(~found & (c <= max_try))

        def bwd_body(carry):
            c, found, i_b, nev = carry
            do = ~found & (c <= max_try)
            nsteps = jnp.where(do, _pow2(c), 0)
            h_micro = h_macro / _pow2(c).astype(dtype)
            r = masked_multistep(target, start_b, ham_b0, h_micro, nsteps,
                                 None, leapfrog_step)
            accept = do & r.all_finite & (jnp.abs(r.h_end - ham_b0) < delta)
            i_b = jnp.where(accept, c, i_b)
            nev = nev + r.n_evals
            return (c + 1, found | accept, i_b, nev)

        init_b = (jnp.asarray(self.c_min, jnp.int32), ~bw_active, i_f, zi)
        _, _, i_b, nev_b = jax.lax.while_loop(bwd_cond, bwd_body, init_b)

        lwt = jnp.where(i_b < i_f, LOG_ZERO, 0.0).astype(dtype)
        lwt = jnp.where(active, lwt, 0.0)
        new_state = MCState(
            q=jnp.where(active[:, None], out.q, state.q),
            u=jnp.where(active[:, None], out.v, state.u),
            g=jnp.where(active[:, None], out.g, state.g),
            lp=jnp.where(active, out.lp, state.lp),
        )
        stats = StepStats(
            n_evals=jnp.where(active, nev_f + nev_b, 0),
            i_f=jnp.where(active, i_f, 0),
            i_b=jnp.where(active, i_b, 0),
            energy_err=jnp.where(active, err, 0.0),
            c_obs=jnp.where(active, cobs, 0.0),
            basic=active & (i_f == self.c_min),
        )
        return new_state, lwt, stats
