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
from .kernels import IsokineticKernel, HMCKernel
from .generic_nuts import (
    generic_nuts_transition,
    run_generic_nuts,
    DIAG_COLS as GENERIC_DIAG_COLS,
)
from .multinomial import MultinomialConfig, run_multinomial
from .streaming import run_walnuts_streaming
from .megakernel import run_walnuts_fused
from .pseudocode import (
    walnuts_step_pseudo,
    walnuts_pseudo,
    stable_steps,
    choose_micro_steps,
    micro_steps_logp,
)

__all__ = [
    "IsokineticKernel",
    "HMCKernel",
    "generic_nuts_transition",
    "run_generic_nuts",
    "GENERIC_DIAG_COLS",
    "MultinomialConfig",
    "run_multinomial",
    "run_walnuts_streaming",
    "run_walnuts_fused",
    "walnuts_step_pseudo",
    "walnuts_pseudo",
    "stable_steps",
    "choose_micro_steps",
    "micro_steps_logp",
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
