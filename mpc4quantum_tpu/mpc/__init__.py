from .clock import StepClock
from .driver import MPCConfig, MPCResult, mpc, make_mpc_step
