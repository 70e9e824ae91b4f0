from .plans import build_schedule, subtree_checks, OrbitSchedule
from .transition import WalnutsConfig, TransitionResult, walnuts_transition
from .driver import (
    WarmupConfig,
    SamplerState,
    init_state,
    sampler_step,
    run_walnuts,
    masked_quantile,
)

__all__ = [
    "build_schedule",
    "subtree_checks",
    "OrbitSchedule",
    "WalnutsConfig",
    "TransitionResult",
    "walnuts_transition",
    "WarmupConfig",
    "SamplerState",
    "init_state",
    "sampler_step",
    "run_walnuts",
    "masked_quantile",
]
