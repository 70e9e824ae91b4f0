"""Post-hoc MCMC diagnostics (the reference delegates these to arviz
and matplotlib: ``isokinetic/MCMCutils.py:9-10``,
``WALNUTSpy/MCMCutils.py:15-40``).  Here they are batched JAX programs
so cross-chain reductions can ride XLA collectives on a sharded batch.
"""

from .ess import ess, ess_per_grad, rhat, split_rhat
from .stats import index_stat_histogram, qq_normal

__all__ = [
    "ess",
    "ess_per_grad",
    "rhat",
    "split_rhat",
    "index_stat_histogram",
    "qq_normal",
]
