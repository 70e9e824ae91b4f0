from .hamiltonian import kinetic_energy, hamiltonian, uturn, refresh_momentum
from .leapfrog import (
    PhasePoint,
    MultistepResult,
    masked_multistep,
    leapfrog_step,
    yoshida_step,
    leapfrog_flow_step,
)
from .integrators import (
    IntegratorConfig,
    IntegratorResult,
    get_integrator,
    INTEGRATORS,
    fixed_leapfrog,
    adapt_leapfrog_d,
    adapt_yoshida_d,
    adapt_leapfrog_flow_d,
    adapt_leapfrog_r2p,
)

__all__ = [
    "kinetic_energy",
    "hamiltonian",
    "uturn",
    "refresh_momentum",
    "PhasePoint",
    "MultistepResult",
    "masked_multistep",
    "leapfrog_step",
    "yoshida_step",
    "leapfrog_flow_step",
    "IntegratorConfig",
    "IntegratorResult",
    "get_integrator",
    "INTEGRATORS",
    "fixed_leapfrog",
    "adapt_leapfrog_d",
    "adapt_yoshida_d",
    "adapt_leapfrog_flow_d",
    "adapt_leapfrog_r2p",
]
