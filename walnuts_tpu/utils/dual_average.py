"""Nesterov-style dual averaging for log-scale tuning parameters.

Functional, batch-ready equivalent of the reference's
``isokinetic/dualAverage.py:6-34`` (which itself mirrors the external
C++ engine's ``dual_average.hpp``).  Used to drive the fixed-orbit
multinomial sampler's ``delta`` toward an ESS-fraction target
(``isokinetic/samplers.py:107-109,259-263``) and available as an
alternative step-size adapter for the WALNUTS warmup.
"""

from typing import NamedTuple

import jax.numpy as jnp


class DualAverageState(NamedTuple):
    log_est: jnp.ndarray
    log_est_avg: jnp.ndarray
    grad_avg: jnp.ndarray
    obs_count: jnp.ndarray
    log_step_offset: jnp.ndarray
    target: jnp.ndarray


def da_init(init_par, target, batch_shape=(), dtype=jnp.float32):
    log0 = jnp.broadcast_to(jnp.log(jnp.asarray(init_par, dtype)), batch_shape)
    return DualAverageState(
        log_est=log0,
        log_est_avg=log0,
        grad_avg=jnp.zeros(batch_shape, dtype),
        obs_count=jnp.zeros(batch_shape, dtype),
        log_step_offset=jnp.log(10.0) + log0,
        target=jnp.broadcast_to(jnp.asarray(target, dtype), batch_shape),
    )


def da_observe(state: DualAverageState, target_draw, mask=None,
               obs_count_offset=10.0, learn_rate=0.05, decay_rate=0.75):
    count = state.obs_count + 1.0
    prop = 1.0 / (count + obs_count_offset)
    grad_avg = (1.0 - prop) * state.grad_avg + prop * (state.target - target_draw)
    log_est = state.log_step_offset - jnp.sqrt(count) / learn_rate * grad_avg
    prop2 = count ** (-decay_rate)
    log_est_avg = prop2 * log_est + (1.0 - prop2) * state.log_est_avg
    new = DualAverageState(
        log_est=log_est,
        log_est_avg=log_est_avg,
        grad_avg=grad_avg,
        obs_count=count,
        log_step_offset=state.log_step_offset,
        target=state.target,
    )
    if mask is None:
        return new
    m = jnp.asarray(mask)
    return DualAverageState(
        log_est=jnp.where(m, new.log_est, state.log_est),
        log_est_avg=jnp.where(m, new.log_est_avg, state.log_est_avg),
        grad_avg=jnp.where(m, new.grad_avg, state.grad_avg),
        obs_count=jnp.where(m, new.obs_count, state.obs_count),
        log_step_offset=state.log_step_offset,
        target=state.target,
    )


def da_par(state: DualAverageState):
    """Current iterate-averaged parameter estimate (natural scale)."""
    return jnp.exp(state.log_est_avg)
