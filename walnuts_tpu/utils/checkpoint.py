"""Checkpoint / resume for sampler state.

The reference's only resume mechanism is warm-starting tuning
parameters from a previous run's diagnostics rows
(``mainFunnel.py:38`` reads ``H0 = diagnostics[-1,15]``,
``delta0 = diagnostics[-1,18]``) plus whole-interpreter ``dill``
session dumps (``MCsim.py:51``).  Here the full per-chain
``SamplerState`` pytree (positions, cached gradients, tuning, P2
estimator, delta-adaptation history, iteration counter) round-trips
through a flat ``.npz``, so a run can stop and continue exactly —
including mid-warmup.
"""

import numpy as np

import jax

from .p2 import P2State


def save_state(path: str, state) -> None:
    leaves, _ = jax.tree.flatten(state)
    np.savez(path, *[np.asarray(x) for x in leaves])


def load_state(path: str):
    with np.load(path) as f:
        leaves = [f[k] for k in f.files]
    _, treedef = jax.tree.flatten(_template(leaves))
    return jax.tree.unflatten(treedef, leaves)


def _template(leaves):
    # SamplerState(q, lp, g, h, delta, P2State(npush, x, q, n, p),
    #              err_facs, iter_n) — 12 leaves in flatten order.
    # Imported lazily: sampler imports utils at package init.
    import jax.numpy as jnp

    from ..sampler.driver import SamplerState

    z = [jnp.asarray(x) for x in leaves]
    return SamplerState(
        q=z[0], lp=z[1], g=z[2], h=z[3], delta=z[4],
        p2=P2State(npush=z[5], x=z[6], q=z[7], n=z[8], p=z[9]),
        err_facs=z[10], iter_n=z[11],
    )
