"""Experimental fused batched box-QP kernel (Pallas, batch-on-lanes).

Solves B independent small box QPs
    min 1/2 x^T P_b x + q_b^T x   s.t.  lb_b <= x <= ub_b
- one per lane - with a fixed-iteration ADMM whose x-update uses an explicit
inverse of K = P + (sigma+rho) I computed in-kernel by unpivoted
Gauss-Jordan (K is SPD with a rho*I shift, so pivoting-free elimination is
stable). Everything is FMA on (1, TB) lane vectors: no factorizations, no
data-dependent control flow - deterministic cost, the same
structure-of-arrays design as ops/pallas_expm.py.

This is the QP-side speed-of-light path for scenario fleets (the XLA ADMM in
solvers/boxqp.py re-factorizes per problem and synchronizes convergence
checks across the vmap batch); kept experimental until validated on real
TPU hardware (interpret-mode parity tests in tests/test_pallas_qp.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _qp_kernel(p_ref, q_ref, lb_ref, ub_ref, x_ref, *, n: int, iters: int,
               rho_scale: float, sigma: float, alpha: float):
    TB = q_ref.shape[1]
    P = [p_ref[i : i + 1, :] for i in range(n * n)]
    q = [q_ref[i : i + 1, :] for i in range(n)]
    lb = [lb_ref[i : i + 1, :] for i in range(n)]
    ub = [ub_ref[i : i + 1, :] for i in range(n)]

    # rho per lane: rho_scale * mean(diag P)
    diag_sum = None
    for i in range(n):
        d = P[i * n + i]
        diag_sum = d if diag_sum is None else diag_sum + d
    rho = rho_scale * diag_sum / float(n)
    rho = jnp.maximum(rho, 1e-8)

    # K = P + (sigma + rho) I
    K = [list(P[i * n : (i + 1) * n]) for i in range(n)]
    for i in range(n):
        K[i][i] = K[i][i] + sigma + rho

    # explicit inverse by unpivoted Gauss-Jordan: [K | I] -> [I | K^-1]
    inv = [[jnp.ones_like(rho) if i == j else jnp.zeros_like(rho) for j in range(n)]
           for i in range(n)]
    for col in range(n):
        piv = 1.0 / K[col][col]
        for j in range(n):
            K[col][j] = K[col][j] * piv
            inv[col][j] = inv[col][j] * piv
        for r in range(n):
            if r == col:
                continue
            f = K[r][col]
            for j in range(n):
                K[r][j] = K[r][j] - f * K[col][j]
                inv[r][j] = inv[r][j] - f * inv[col][j]

    def matvec(M_rows, v):
        out = []
        for i in range(n):
            acc = None
            for j in range(n):
                t = M_rows[i][j] * v[j] if isinstance(M_rows[i], list) else M_rows[i * n + j] * v[j]
                acc = t if acc is None else acc + t
            out.append(acc)
        return out

    x = [jnp.minimum(jnp.maximum(jnp.zeros_like(rho), lb[i]), ub[i]) for i in range(n)]
    z = list(x)
    y = [jnp.zeros_like(rho) for _ in range(n)]

    for _ in range(iters):
        rhs = [sigma * x[i] - q[i] + rho * z[i] - y[i] for i in range(n)]
        x = matvec(inv, rhs)
        z_arg = [alpha * x[i] + (1.0 - alpha) * z[i] for i in range(n)]
        z = [jnp.minimum(jnp.maximum(z_arg[i] + y[i] / rho, lb[i]), ub[i]) for i in range(n)]
        y = [y[i] + rho * (z_arg[i] - z[i]) for i in range(n)]

    for i in range(n):
        x_ref[i : i + 1, :] = z[i]


@functools.partial(jax.jit, static_argnames=("iters", "tile_b", "interpret"))
def boxqp_pallas(P, q, lb, ub, iters: int = 60, rho_scale: float = 0.1,
                 sigma: float = 1e-6, alpha: float = 1.6,
                 tile_b: int = 256, interpret: bool = False):
    """Solve a batch of box QPs with the fused lane-batched kernel.

    :param P: (B, n, n) SPD matrices (f32); n <= ~16 (fully unrolled).
    :param q, lb, ub: (B, n).
    :return: (B, n) box-feasible solutions.
    """
    P = jnp.asarray(P, jnp.float32)
    B, n, _ = P.shape
    tb = min(tile_b, max(_LANE, _LANE * ((B + _LANE - 1) // _LANE)))
    Bp = ((B + tb - 1) // tb) * tb

    pad = lambda M, rows: jnp.zeros((rows, Bp), jnp.float32).at[:, :B].set(
        jnp.asarray(M, jnp.float32).reshape(B, rows).T)
    p_in = pad(P, n * n)
    q_in = pad(q, n)
    # pad lanes beyond B with harmless bounds
    lb_in = jnp.full((n, Bp), -1.0, jnp.float32).at[:, :B].set(jnp.asarray(lb, jnp.float32).T)
    ub_in = jnp.full((n, Bp), 1.0, jnp.float32).at[:, :B].set(jnp.asarray(ub, jnp.float32).T)
    # padded P lanes are zero -> K = (sigma+rho_min) I, benign

    kernel = functools.partial(_qp_kernel, n=n, iters=iters, rho_scale=rho_scale,
                               sigma=sigma, alpha=alpha)
    out = pl.pallas_call(
        kernel,
        grid=(Bp // tb,),
        in_specs=[
            pl.BlockSpec((n * n, tb), lambda b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, tb), lambda b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, tb), lambda b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, tb), lambda b: (0, b), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, tb), lambda b: (0, b), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, Bp), jnp.float32),
        interpret=interpret,
    )(p_in, q_in, lb_in, ub_in)
    return out[:, :B].T
