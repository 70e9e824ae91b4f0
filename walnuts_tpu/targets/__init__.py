from .base import Target
from .analytic import (
    std_gauss,
    corr_gauss,
    smile,
    rosenbrock,
    mod_funnel,
    funnel,
    funnel_rescaled,
    ill_conditioned_gauss,
)
from .stock_watson import stock_watson, load_sw_data

__all__ = [
    "Target",
    "std_gauss",
    "corr_gauss",
    "smile",
    "rosenbrock",
    "mod_funnel",
    "funnel",
    "funnel_rescaled",
    "ill_conditioned_gauss",
    "stock_watson",
    "load_sw_data",
]
