from .constants import LOG_ZERO, WT_SUM_THRESH, ISOKINETIC_DELTA_THRESH
from .tree import tree_where, tree_stack
from .p2 import P2State, p2_init, p2_push, p2_quantile
from .dual_average import DualAverageState, da_init, da_observe, da_par
from .checkpoint import save_state, load_state

__all__ = [
    "save_state",
    "load_state",
    "LOG_ZERO",
    "WT_SUM_THRESH",
    "ISOKINETIC_DELTA_THRESH",
    "tree_where",
    "tree_stack",
    "P2State",
    "p2_init",
    "p2_push",
    "p2_quantile",
    "DualAverageState",
    "da_init",
    "da_observe",
    "da_par",
]
