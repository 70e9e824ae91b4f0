"""Pallas-fused adaptive integrators (TPU hot-loop kernels).

The XLA versions in :mod:`.integrators` execute each leapfrog micro
step as ~20 separate small ops inside nested ``lax.while_loop``s;
at funnel-scale shapes (``[chains, ~100]``) the chip is dispatch- and
latency-bound — measured ~20x below raw leapfrog throughput.  This
module fuses an *entire macro step* — the forward halving search, the
R2P two-point draw, and the backward reversibility pass — into one
``pallas_call``: positions/velocities/gradients stay in VMEM across
every micro step and all control flow runs inside the kernel.

Requirements on the target (checked by the caller):

* its batched ``logp_grad`` must be expressible in Pallas-supported
  jnp ops (elementwise + lane reductions — true for the analytic
  targets), and
* it must be **zero-invariant on padded lanes**: the feature dimension
  is padded to a multiple of 128, and a state whose padded lanes are
  zero must keep them zero through ``logp_grad`` (gradient zero on
  padded lanes) and contribute nothing to ``logp``.  All shipped
  analytic targets satisfy this because their per-lane terms vanish at
  ``q_i = 0`` and dimension-dependent constants are baked in
  statically.

The kernel reproduces the exact semantics of
:func:`walnuts_tpu.ops.integrators.adapt_leapfrog_r2p`
(reference ``adaptiveIntegrators.py:361-475``) and
``adapt_leapfrog_d`` (``:65-137``); equality is tested pairwise
against the XLA implementations.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.constants import LOG_ZERO
from .integrators import IntegratorResult

_BLOCK = 128  # chains per kernel instance


def _pad_dim(d):
    return ((d + 127) // 128) * 128


def _r2p_kernel(q_ref, v_ref, g_ref, sc_ref,
                oq, ov, og, osc,
                *, grad_fn, min_c, max_c, r2p_prob0, mode):
    """One fused R2P (or deterministic-D) macro step for a chain block.

    mode: 0 = deterministic D, 1 = R2P.
    Per-chain scalars travel as lanes of the ``(B, 128)`` ``sc`` panel
    (rank-1 refs hit XLA/Mosaic layout mismatches): inputs
    ``[lp, h0, h_macro, delta, u, active]`` in lanes 0-5; outputs
    ``[lp, h_end, i_f, i_b, c_sim, lwt, igr, n_f, n_b]`` in lanes 0-8
    (index fields as f32).
    """
    q0 = q_ref[:]
    v0 = v_ref[:]
    g0 = g_ref[:]
    sc = sc_ref[:]
    lp0 = sc[:, 0]
    h0 = sc[:, 1]
    hm = sc[:, 2]
    delta = sc[:, 3]
    u_draw = sc[:, 4]
    act = sc[:, 5] > 0.5

    f32 = q0.dtype

    def _col(b):
        # bool [:, None] needs a widen-reshape-compare dance: Mosaic
        # only supports minor-dim insertion on 32-bit vectors
        return b.astype(f32)[:, None] > 0.0

    def multistep(q, v, g, lp, h_start, h_micro, nsteps):
        """Per-chain ``nsteps`` masked micro-step loop (the in-kernel
        analogue of ``leapfrog.masked_multistep``)."""
        def cond(c):
            k = c[0]
            return jnp.any(k < nsteps)

        def body(c):
            k, q, v, g, lp, h_end, max_dh, finite = c
            on = k < nsteps
            hh = jnp.where(on, h_micro, 0.0)[:, None]
            vh = v + 0.5 * hh * g
            q2 = q + hh * vh
            lp2, g2 = grad_fn(q2)
            v2 = vh + 0.5 * hh * g2
            h_new = -lp2 + 0.5 * jnp.sum(v2 * v2, axis=-1)
            o1 = _col(on)
            q = jnp.where(o1, q2, q)
            v = jnp.where(o1, v2, v)
            g = jnp.where(o1, g2, g)
            lp = jnp.where(on, lp2, lp)
            dh = jnp.abs(h_new - h_end)
            max_dh = jnp.where(on, jnp.maximum(max_dh, dh), max_dh)
            # per-chain masks carried as f32: Mosaic cannot round-trip
            # i1 vectors through loop carries
            bad = on & ~jnp.isfinite(h_new)
            finite = jnp.where(bad, 0.0, finite)
            h_end = jnp.where(on, h_new, h_end)
            return (k + 1, q, v, g, lp, h_end, max_dh, finite)

        init = (jnp.int32(0), q, v, g, lp, h_start,
                jnp.zeros_like(h_start), jnp.ones_like(h_start))
        out = jax.lax.while_loop(cond, body, init)
        (q, v, g, lp, h_end, max_dh, finite) = out[1:]
        return (q, v, g, lp, h_end, max_dh, finite > 0.5)

    # ---------------- forward halving search -----------------------
    def fwd_cond(carry):
        c, done_f, *_ = carry
        return (c <= max_c) & jnp.any(done_f < 0.5)

    def fwd_body(carry):
        (c, done_f, bq, bv, bg, blp, bh, i_f, igr, nf) = carry
        done = done_f > 0.5
        n_c = jnp.left_shift(1, c)
        nsteps = jnp.where(done, 0, n_c)
        h_micro = hm / n_c.astype(f32)
        tq, tv, tg, tlp, th, tdh, tfin = multistep(
            q0, v0, g0, lp0, h0, h_micro, nsteps)
        err = jnp.abs(h0 - th)
        accept = tfin & (err < delta)
        take = ~done & (accept | (c == max_c))
        t1 = _col(take)
        bq = jnp.where(t1, tq, bq)
        bv = jnp.where(t1, tv, bv)
        bg = jnp.where(t1, tg, bg)
        blp = jnp.where(take, tlp, blp)
        bh = jnp.where(take, th, bh)
        i_f = jnp.where(take, c, i_f)
        igr = jnp.where(
            take, h_micro * jnp.maximum(tdh, 1e-30) ** (-1.0 / 3.0), igr)
        nf = nf + nsteps
        done_f = jnp.where(take, 1.0, done_f)
        return (c + 1, done_f, bq, bv, bg, blp, bh, i_f, igr, nf)

    zi = jnp.zeros(h0.shape, jnp.int32)
    init = (jnp.int32(min_c), jnp.where(act, 0.0, 1.0), q0, v0, g0, lp0,
            h0, zi, jnp.zeros_like(h0), zi)
    (_, _, bq, bv, bg, blp, bh, i_f, igr, nf) = jax.lax.while_loop(
        fwd_cond, fwd_body, init)

    if mode == 1:
        # ---------------- two-point randomisation -------------------
        coarse = u_draw < r2p_prob0
        c_fine = i_f + 1
        sel = ~coarse & act
        h_micro_fine = hm / jnp.exp2(c_fine.astype(f32))
        nsteps_fine = jnp.where(sel, jnp.left_shift(1, c_fine), 0)
        tq, tv, tg, tlp, th, tdh, tfin = multistep(
            q0, v0, g0, lp0, h0, h_micro_fine, nsteps_fine)
        s1 = _col(sel)
        bq = jnp.where(s1, tq, bq)
        bv = jnp.where(s1, tv, bv)
        bg = jnp.where(s1, tg, bg)
        blp = jnp.where(sel, tlp, blp)
        bh = jnp.where(sel, th, bh)
        igr = jnp.where(
            sel, h_micro_fine * jnp.maximum(tdh, 1e-30) ** (-1.0 / 3.0),
            igr)
        nf = nf + nsteps_fine
        c_sim = jnp.where(coarse, i_f, c_fine)
        max_try = jnp.where(coarse, i_f - 1, max_c)
        default_ib = jnp.where(coarse, i_f, max_c)
    else:
        c_sim = i_f
        max_try = i_f - 1
        default_ib = i_f

    # ---------------- backward pass ---------------------------------
    bw_act = act & (max_try >= min_c)

    def bwd_cond(carry):
        c, found_f, *_ = carry
        return jnp.any((found_f < 0.5) & (c <= max_try))

    def bwd_body(carry):
        c, found_f, i_b, nb = carry
        do = (found_f < 0.5) & (c <= max_try)
        n_c = jnp.left_shift(1, c)
        nsteps = jnp.where(do, n_c, 0)
        h_micro = hm / n_c.astype(f32)
        tq, tv, tg, tlp, th, tdh, tfin = multistep(
            bq, -bv, bg, blp, bh, h_micro, nsteps)
        err = jnp.abs(bh - th)
        accept = do & tfin & (err < delta)
        i_b = jnp.where(accept, c, i_b)
        nb = nb + nsteps
        found_f = jnp.where(accept, 1.0, found_f)
        return (c + 1, found_f, i_b, nb)

    init_b = (jnp.int32(min_c), jnp.where(bw_act, 0.0, 1.0), default_ib,
              zi)
    _, _, i_b, nb = jax.lax.while_loop(bwd_cond, bwd_body, init_b)

    # ---------------- weight -----------------------------------------
    if mode == 1:
        lp0c = math.log(r2p_prob0)
        lp1c = math.log(1.0 - r2p_prob0)
        lwt_f = jnp.where(coarse, lp0c, lp1c)
        lwt_b = jnp.where(c_sim == i_b, lp0c,
                         jnp.where(c_sim == i_b + 1, lp1c, LOG_ZERO))
        lwt = (lwt_b - lwt_f).astype(f32)
    else:
        lwt = jnp.where(i_f != i_b, LOG_ZERO, 0.0).astype(f32)

    a1 = _col(act)
    oq[:] = jnp.where(a1, bq, q0)
    ov[:] = jnp.where(a1, bv, v0)
    og[:] = jnp.where(a1, bg, g0)
    out_cols = jnp.stack([
        jnp.where(act, blp, lp0),
        jnp.where(act, bh, h0),
        jnp.where(act, i_f, 0).astype(f32),
        jnp.where(act, i_b, 0).astype(f32),
        jnp.where(act, c_sim, 0).astype(f32),
        jnp.where(act, lwt, 0.0),
        jnp.where(act, igr, 1.0),
        jnp.where(act, nf, 0).astype(f32),
        jnp.where(act, nb, 0).astype(f32),
    ], axis=-1)
    b = out_cols.shape[0]
    osc[:] = jnp.concatenate(
        [out_cols, jnp.zeros((b, 128 - out_cols.shape[1]), f32)], axis=-1)


def _pad(x, dp):
    d = x.shape[-1]
    if d == dp:
        return x
    return jnp.pad(x, ((0, 0), (0, dp - d)))


@functools.lru_cache(maxsize=32)
def _build_call(grad_fn, dim, min_c, max_c, r2p_prob0, mode, interpret):
    dp = _pad_dim(dim)
    B = _BLOCK
    kern = functools.partial(
        _r2p_kernel, grad_fn=grad_fn, min_c=min_c, max_c=max_c,
        r2p_prob0=r2p_prob0, mode=mode)

    def mat_spec(d):
        return pl.BlockSpec((B, d), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def call(C):
        return pl.pallas_call(
            kern,
            grid=(C // B,),
            in_specs=[mat_spec(dp), mat_spec(dp), mat_spec(dp),
                      mat_spec(128)],
            out_specs=(mat_spec(dp), mat_spec(dp), mat_spec(dp),
                       mat_spec(128)),
            out_shape=(
                jax.ShapeDtypeStruct((C, dp), jnp.float32),
                jax.ShapeDtypeStruct((C, dp), jnp.float32),
                jax.ShapeDtypeStruct((C, dp), jnp.float32),
                jax.ShapeDtypeStruct((C, 128), jnp.float32),
            ),
            interpret=interpret,
        )

    return call


def make_pallas_integrator(target, *, mode="r2p", interpret=False):
    """Build a fused Pallas integrator for ``target``.

    Returns a function with the standard integrator signature
    (see :data:`walnuts_tpu.ops.integrators.INTEGRATORS`).  The target
    must expose an analytic batched ``logp_grad`` that is
    zero-invariant under lane padding (all shipped analytic targets).
    """
    if target._logp_grad is None:
        raise ValueError(
            f"target {target.name} has no analytic batched logp_grad; "
            "the fused Pallas integrator requires one")
    grad_fn = target._logp_grad
    mode_i = {"d": 0, "r2p": 1}[mode]

    def integrator(key, tgt, q, v, g, lp, h0, h_macro, xi, delta, inv_mass,
                   active, cfg):
        del tgt
        if inv_mass is not None:
            raise NotImplementedError(
                "pallas integrator supports identity metric only")
        C, D = q.shape
        dp = _pad_dim(D)
        call = _build_call(grad_fn, D, cfg.min_c, cfg.max_c,
                           cfg.r2p_prob0, mode_i, interpret)(C)
        u = jax.random.uniform(key, (C,), jnp.float32)
        x1 = xi[:, None]
        sc_in = jnp.zeros((C, 128), jnp.float32)
        for i, col in enumerate([lp, h0, h_macro, delta, u,
                                 active.astype(jnp.float32)]):
            sc_in = sc_in.at[:, i].set(col.astype(jnp.float32))
        oq, ov, og, osc = call(
            _pad(q, dp).astype(jnp.float32),
            _pad(x1 * v, dp).astype(jnp.float32),
            _pad(g, dp).astype(jnp.float32),
            sc_in)
        return IntegratorResult(
            q=oq[:, :D].astype(q.dtype),
            v=(x1 * ov[:, :D]).astype(q.dtype),
            g=og[:, :D].astype(q.dtype),
            lp=osc[:, 0].astype(lp.dtype),
            h_end=osc[:, 1].astype(h0.dtype),
            n_eval_f=osc[:, 7].astype(jnp.int32),
            n_eval_b=osc[:, 8].astype(jnp.int32),
            i_f=osc[:, 2].astype(jnp.int32),
            i_b=osc[:, 3].astype(jnp.int32),
            c=osc[:, 4].astype(jnp.int32),
            lwt=osc[:, 5].astype(h0.dtype),
            igr_const=osc[:, 6].astype(h0.dtype),
        )

    return integrator
