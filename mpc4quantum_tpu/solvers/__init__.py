from .boxqp import BoxQPParams, BoxQPResult, solve_boxqp, solve_boxqp_fixed, ns_inverse
from .condense import condense_horizon, quad_program, QPResult
from .lqr import lqr_quad_program
