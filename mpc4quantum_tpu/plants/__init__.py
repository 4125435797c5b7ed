from .quantum import (
    QuantumPlant,
    LiftKind,
    lift_state,
    proj_state,
    quantum_step,
    quantum_step_taylor,
    quantum_simulate,
    quantum_observe,
    quantum_expectations,
    partial_trace_lift,
    tensor_proj,
    truncate_lift,
)
from .synthesis import SynthesisPlant, lift_unitary, proj_process, synthesis_simulate
from .classical import ClassicalPlant, VanDerPol, Rotor, rk4_simulate
