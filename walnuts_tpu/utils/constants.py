"""Numeric sentinels shared across the framework.

Mirrors the semantics of the reference constants
(``WALNUTSpy/constants.py:13-14``): ``LOG_ZERO`` is "this multinomial
weight is numerically zero" expressed in log space, and
``WT_SUM_THRESH`` guards the online categorical update against
dividing by an all-dead weight sum.

Both values are safe in float32: ``exp(-700)`` underflows to exactly
0.0 in every IEEE format we run, and the sentinel is only ever *added*
to log-weights (never exponentiated on its own in a denominator).
"""

LOG_ZERO = -700.0
WT_SUM_THRESH = 2.7189761758644324e-304  # exp(LOG_ZERO + 1), as in the reference

# Isokinetic blow-up guard (reference: isokinetic/microCanonical.py:12).
ISOKINETIC_DELTA_THRESH = 100.0
