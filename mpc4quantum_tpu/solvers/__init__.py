from .boxqp import BoxQPParams, BoxQPResult, solve_boxqp
from .condense import condense_horizon, quad_program, QPResult
from .lqr import lqr_quad_program
