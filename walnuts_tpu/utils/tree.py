"""Small pytree helpers used throughout the samplers."""

import jax
import jax.numpy as jnp


def tree_where(pred, on_true, on_false):
    """Per-chain select over matching pytrees.

    ``pred`` has shape ``[C]`` (one bool per chain); leaves have shape
    ``[C, ...]``.  Broadcasts the predicate against each leaf's trailing
    dims.  This is the masking primitive that lets finished chains idle
    through fixed-shape orbit expansion.
    """

    def _sel(a, b):
        p = pred.reshape(pred.shape + (1,) * (a.ndim - pred.ndim))
        return jnp.where(p, a, b)

    return jax.tree.map(_sel, on_true, on_false)


def tree_stack(trees):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)
