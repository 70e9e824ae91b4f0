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
    fixed_mc_step,
    isokinetic_multistep,
    refresh_u,
)
from ..ops.leapfrog import PhasePoint, leapfrog_step, masked_multistep
from ..utils.constants import LOG_ZERO


class IsokineticKernel(NamedTuple):
    """Isokinetic dynamics with unit-sphere velocity
    (``microCanonical.py:16-316``)."""

    c_min: int = 0
    c_max: int = 10
    adaptive: bool = True

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
        fn = adapt_mc_step_e if self.adaptive else fixed_mc_step
        return fn(key, target, state, h_macro, delta, active,
                  c_min=self.c_min, c_max=self.c_max)


class HMCKernel(NamedTuple):
    """Hamiltonian dynamics with Gaussian momentum; ``adaptHMCstepE``'s
    energy-error halving protocol (``isokinetic/hamiltonian.py:122-210``).
    The state reuses ``MCState`` with ``u`` holding the full velocity.
    """

    c_min: int = 0
    c_max: int = 10
    adaptive: bool = True

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
        C = state.lp.shape[0]
        dtype = state.q.dtype
        start = PhasePoint(state.q, state.u, state.g, state.lp)
        ham0 = self.ham(state)

        def _pow2(c):
            return jnp.left_shift(jnp.ones((), jnp.int32), c)

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
