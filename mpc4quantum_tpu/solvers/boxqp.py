"""Box-constrained QP solver: OSQP-style ADMM, fully on-device.

Solves   min 1/2 x^T P x + q^T x   s.t.  lb <= x <= ub
with P symmetric PSD. This is the entire constraint class the condensed MPC
horizon problem needs (state dynamics are eliminated by condensing; control
saturation and the first-step slew limit are both boxes on U - see
condense.py), so the OSQP generality of a sparse constraint matrix
(reference optimize.py:59 solves via OSQP-in-C through CVXPY) collapses to
the special case A = I:

    x~_{k+1} = (P + (sigma+rho) I)^{-1} (sigma x_k - q + rho z_k - y_k)
    x_{k+1}  = alpha x~ + (1-alpha) x_k
    z_{k+1}  = clip(alpha x~ + (1-alpha) z_k + y_k/rho, lb, ub)
    y_{k+1}  = y_k + rho (alpha x~ + (1-alpha) z_k - z_{k+1})

One Cholesky factorization per QP (vs CVXPY re-canonicalizing the whole
problem every IQP iteration, reference mpc.py:189/optimize.py:18-58); the
iteration is a `lax.while_loop` of (n,n) triangular solves, n = H*dim_u <=
~150, which batches cleanly under vmap across scenarios.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class BoxQPParams:
    rho: float = 0.1
    sigma: float = 1e-6
    alpha: float = 1.6
    eps_abs: float = 1e-7
    max_iter: int = struct.field(pytree_node=False, default=1000)
    check_every: int = struct.field(pytree_node=False, default=10)


class BoxQPResult(NamedTuple):
    x: jnp.ndarray  # primal solution (projected: feasible)
    y: jnp.ndarray  # dual of the box constraint
    iters: jnp.ndarray  # iterations used
    prim_res: jnp.ndarray
    dual_res: jnp.ndarray
    converged: jnp.ndarray  # bool


def solve_boxqp(P, q, lb, ub, x0=None, params: BoxQPParams | None = None) -> BoxQPResult:
    """ADMM solve of the box QP. All args are device arrays; `params` fields
    are data except the static iteration bounds.

    :param P: (n, n) symmetric PSD (real).
    :param q: (n,) linear term.
    :param lb, ub: (n,) bounds (may be +-inf).
    :param x0: optional warm start.
    """
    if params is None:
        params = BoxQPParams()
    n = q.shape[0]
    dtype = q.dtype
    P = 0.5 * (P + P.T)

    # Scale rho by the problem: rho relative to typical curvature improves
    # conditioning of the splitting for badly scaled costs.
    diag_scale = jnp.maximum(jnp.mean(jnp.diag(P)), 1e-12)
    rho = params.rho * diag_scale
    sigma = params.sigma

    K = P + (sigma + rho) * jnp.eye(n, dtype=dtype)
    L = jnp.linalg.cholesky(K)

    def kkt_solve(rhs):
        return jax.scipy.linalg.cho_solve((L, True), rhs)

    x_init = jnp.clip(jnp.zeros(n, dtype=dtype) if x0 is None else x0, lb, ub)
    z_init = x_init
    y_init = jnp.zeros(n, dtype=dtype)

    def residuals(x, z, y):
        prim = jnp.max(jnp.abs(x - z))
        dual = jnp.max(jnp.abs(P @ x + q + y))
        return prim, dual

    def cond(state):
        x, z, y, it, done = state
        return jnp.logical_and(~done, it < params.max_iter)

    def body(state):
        x, z, y, it, _ = state
        x_t = kkt_solve(sigma * x - q + rho * z - y)
        # relaxation on the z-update argument (standard OSQP form)
        z_arg = params.alpha * x_t + (1 - params.alpha) * z
        z_new = jnp.clip(z_arg + y / rho, lb, ub)
        y_new = y + rho * (z_arg - z_new)
        x_new = x_t
        it = it + 1
        prim, dual = residuals(x_new, z_new, y_new)
        done = jnp.logical_and(
            it % params.check_every == 0,
            jnp.logical_and(prim < params.eps_abs, dual < params.eps_abs * diag_scale),
        )
        return x_new, z_new, y_new, it, done

    x, z, y, iters, done = jax.lax.while_loop(
        cond, body, (x_init, z_init, y_init, jnp.array(0), jnp.array(False))
    )
    prim, dual = residuals(x, z, y)
    converged = jnp.logical_and(prim < 10 * params.eps_abs, dual < 10 * params.eps_abs * diag_scale)
    # Return the projected iterate: always box-feasible.
    return BoxQPResult(x=z, y=y, iters=iters, prim_res=prim, dual_res=dual, converged=converged)
