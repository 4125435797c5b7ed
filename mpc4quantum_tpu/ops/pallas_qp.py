"""Fused batched box-QP kernel (Pallas, batch-on-lanes).

Solves B independent small box QPs
    min 1/2 x^T P_b x + q_b^T x   s.t.  lb_b <= x <= ub_b
- one per lane - with the SAME algorithm as solvers/boxqp.solve_boxqp_fixed:
`rounds` rounds of exactly `iters` OSQP-style ADMM iterations each, the
x-update using an explicit inverse of K = P + (sigma+rho) I computed
in-kernel by unpivoted Gauss-Jordan (K is SPD with a rho*I shift, so
pivoting-free elimination is stable), rho rebalanced between rounds by the
OSQP residual-balancing rule, warm-started from `x0`. Everything is FMA on
(1, TB) lane vectors: no factorizations, no data-dependent control flow -
deterministic cost, the same structure-of-arrays design as
ops/pallas_expm.py.

The kernel also emits the final primal/dual residuals and the inf-norm
scalings, so callers apply the exact acceptance rule of the XLA path
(solvers/boxqp.py:254-260) - kernel and XLA solves are interchangeable in
the MPC driver (mpc/hostloop.py qp_impl="pallas").

This is the QP-side speed-of-light path for scenario fleets: the XLA ADMM
in solvers/boxqp.py round-trips HBM between the small batched matmuls of
each iteration, while here the entire solve - inverse, iterations,
residuals - stays VMEM-resident per tile.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128

# aux output rows: [prim, dual, xmax, zmax, pxmax, qmax, ymax, rho]
_AUX_ROWS = 8


def _qp_kernel(p_ref, q_ref, lb_ref, ub_ref, x0_ref, x_ref, aux_ref, *,
               n: int, iters: int, rounds: int,
               rho_scale: float, sigma: float, alpha: float, pack: int):
    # batch packed over (pack sublanes x lanes): logical row i is the
    # (pack, TB) block at physical rows [i*pack, (i+1)*pack) - every
    # multiply-add fills the full (8, 128) f32 VPU tile instead of 1/8 of it
    row = lambda ref, i: ref[i * pack : (i + 1) * pack, :]
    P = [row(p_ref, i) for i in range(n * n)]
    q = [row(q_ref, i) for i in range(n)]
    lb = [row(lb_ref, i) for i in range(n)]
    ub = [row(ub_ref, i) for i in range(n)]

    # rho per lane: rho_scale * mean(diag P), exactly as the XLA path
    # (solvers/boxqp.py:207-208; no extra floor - parity requires identical
    # iterates)
    diag_sum = None
    for i in range(n):
        d = P[i * n + i]
        diag_sum = d if diag_sum is None else diag_sum + d
    diag_scale = jnp.maximum(diag_sum / float(n), 1e-12)
    rho = rho_scale * diag_scale

    def inverse_of_K(rho):
        """[K | I] -> [I | K^-1] by unpivoted Gauss-Jordan, K = P+(sigma+rho)I."""
        K = [list(P[i * n : (i + 1) * n]) for i in range(n)]
        for i in range(n):
            K[i][i] = K[i][i] + sigma + rho
        inv = [[jnp.ones_like(rho) if i == j else jnp.zeros_like(rho)
                for j in range(n)] for i in range(n)]
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
        return inv

    def matvec(M, v):
        out = []
        for i in range(n):
            acc = None
            for j in range(n):
                t = (M[i][j] if isinstance(M[i], list) else M[i * n + j]) * v[j]
                acc = t if acc is None else acc + t
            out.append(acc)
        return out

    def maxabs(rows):
        m = jnp.abs(rows[0])
        for r in rows[1:]:
            m = jnp.maximum(m, jnp.abs(r))
        return m

    # warm start, clipped into the box (solvers/boxqp.py:209-211)
    x = [jnp.minimum(jnp.maximum(row(x0_ref, i), lb[i]), ub[i]) for i in range(n)]
    z = list(x)
    y = [jnp.zeros_like(rho) for _ in range(n)]

    prim = dual = xmax = zmax = pxmax = ymax = jnp.zeros_like(rho)
    qmax = maxabs(q)

    for rnd in range(rounds):
        inv = inverse_of_K(rho)
        for _ in range(iters):
            rhs = [sigma * x[i] - q[i] + rho * z[i] - y[i] for i in range(n)]
            x = matvec(inv, rhs)
            z_arg = [alpha * x[i] + (1.0 - alpha) * z[i] for i in range(n)]
            z = [jnp.minimum(jnp.maximum(z_arg[i] + y[i] / rho, lb[i]), ub[i])
                 for i in range(n)]
            y = [y[i] + rho * (z_arg[i] - z[i]) for i in range(n)]

        # residuals + OSQP rho rebalancing (solvers/boxqp.py:245-252)
        Px = matvec(P, x)
        prim = maxabs([x[i] - z[i] for i in range(n)])
        dual = maxabs([Px[i] + q[i] + y[i] for i in range(n)])
        xmax, zmax = maxabs(x), maxabs(z)
        pxmax, ymax = maxabs(Px), maxabs(y)
        if rnd + 1 < rounds:
            prim_s = prim / jnp.maximum(jnp.maximum(xmax, zmax), 1e-12)
            dual_s = dual / jnp.maximum(jnp.maximum(pxmax, jnp.maximum(qmax, ymax)), 1e-12)
            ratio = jnp.sqrt(prim_s / jnp.maximum(dual_s, 1e-16))
            rho = jnp.clip(rho * ratio, 1e-8 * diag_scale, 1e8 * diag_scale)

    for i in range(n):
        x_ref[i * pack : (i + 1) * pack, :] = z[i]
    for r, v in enumerate((prim, dual, xmax, zmax, pxmax, qmax, ymax, rho)):
        aux_ref[r * pack : (r + 1) * pack, :] = v


class BoxQPPallasAux(NamedTuple):
    prim: jnp.ndarray   # (B,) final primal residual |x - z|_inf
    dual: jnp.ndarray   # (B,) final dual residual |Px + q + y|_inf
    xmax: jnp.ndarray
    zmax: jnp.ndarray
    pxmax: jnp.ndarray
    qmax: jnp.ndarray
    ymax: jnp.ndarray
    rho: jnp.ndarray


def boxqp_accept(aux: BoxQPPallasAux, eps_abs: float, eps_rel: float,
                 accept_abs: float, accept_rel: float):
    """The XLA path's acceptance rule (solvers/boxqp.py:254-260) applied to
    kernel residuals: (B,) bool convergence flags."""
    ep = eps_abs + eps_rel * jnp.maximum(aux.xmax, aux.zmax)
    ed = eps_abs + eps_rel * jnp.maximum(aux.pxmax, jnp.maximum(aux.qmax, aux.ymax))
    acc_p = accept_abs + accept_rel * jnp.maximum(aux.xmax, aux.zmax)
    acc_d = accept_abs + accept_rel * jnp.maximum(aux.pxmax, jnp.maximum(aux.qmax, aux.ymax))
    return jnp.logical_and(aux.prim <= jnp.maximum(ep, acc_p),
                           aux.dual <= jnp.maximum(ed, acc_d))


@functools.partial(jax.jit, static_argnames=("iters", "rounds", "tile_b",
                                             "interpret", "return_aux",
                                             "rho_scale", "sigma", "alpha",
                                             "sublanes"))
def boxqp_pallas(P, q, lb, ub, x0=None, iters: int = 60, rounds: int = 1,
                 rho_scale: float = 0.1, sigma: float = 1e-6, alpha: float = 1.6,
                 tile_b: int = 256, interpret: bool = False,
                 return_aux: bool = False, sublanes: int = 8):
    """Solve a batch of box QPs with the fused lane-batched kernel.

    :param P: (B, n, n) SPD matrices (f32); n <= ~16 (fully unrolled).
    :param q, lb, ub: (B, n).
    :param x0: optional (B, n) warm start (clipped into the box).
    :param iters: ADMM iterations per round; `rounds` rounds with rho
        rebalanced between them (mirrors BoxQPParams.max_iter/n_rounds).
    :param sublanes: batch-packing factor across the sublane dimension -
        each logical row becomes a (sublanes, lanes) block so VPU tiles are
        fully utilized (8 = the f32 tile height; 1 = lanes-only layout).
    :return: (B, n) box-feasible solutions; with return_aux=True, a
        (solutions, BoxQPPallasAux) pair for acceptance checks.
    """
    P = jnp.asarray(P, jnp.float32)
    # symmetrize like the XLA path (solvers/boxqp.py:203) so iterates and
    # residuals agree for not-exactly-symmetric inputs
    P = 0.5 * (P + jnp.swapaxes(P, -1, -2))
    B, n, _ = P.shape
    S = sublanes
    # packed width W (lanes) and padded batch Bp = S * W; batch element
    # b = s * W + j sits at sublane s, lane j of its row block
    W_min = _LANE * ((B + S * _LANE - 1) // (S * _LANE))
    tb = min(tile_b, W_min)
    W = ((W_min + tb - 1) // tb) * tb
    Bp = S * W

    def pack(flat2d):
        # (rows, Bp) -> (rows*S, W) with b = s*W + j
        rows = flat2d.shape[0]
        return flat2d.reshape(rows * S, W)

    pad = lambda M, rows: jnp.zeros((rows, Bp), jnp.float32).at[:, :B].set(
        jnp.asarray(M, jnp.float32).reshape(B, rows).T)
    p_in = pack(pad(P, n * n))
    q_in = pack(pad(q, n))
    # pad lanes beyond B with harmless bounds
    lb_in = pack(jnp.full((n, Bp), -1.0, jnp.float32).at[:, :B].set(
        jnp.asarray(lb, jnp.float32).T))
    ub_in = pack(jnp.full((n, Bp), 1.0, jnp.float32).at[:, :B].set(
        jnp.asarray(ub, jnp.float32).T))
    x0_in = pack(jnp.zeros((n, Bp), jnp.float32) if x0 is None else pad(x0, n))
    # padded P lanes are zero with q = x0 = 0 -> K = (sigma + rho_pad) I
    # with rho_pad = rho_scale * 1e-12 (diag_scale floor): x/z/y stay
    # exactly 0 through every iteration - benign

    kernel = functools.partial(_qp_kernel, n=n, iters=iters, rounds=rounds,
                               rho_scale=rho_scale, sigma=sigma, alpha=alpha,
                               pack=S)
    out, aux = pl.pallas_call(
        kernel,
        grid=(W // tb,),
        in_specs=[
            pl.BlockSpec((n * n * S, tb), lambda b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((n * S, tb), lambda b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((n * S, tb), lambda b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((n * S, tb), lambda b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((n * S, tb), lambda b: (0, b), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n * S, tb), lambda b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((_AUX_ROWS * S, tb), lambda b: (0, b), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n * S, W), jnp.float32),
            jax.ShapeDtypeStruct((_AUX_ROWS * S, W), jnp.float32),
        ],
        interpret=interpret,
    )(p_in, q_in, lb_in, ub_in, x0_in)
    x_out = out.reshape(n, Bp)[:, :B].T
    if not return_aux:
        return x_out
    a = aux.reshape(_AUX_ROWS, Bp)[:, :B]
    return x_out, BoxQPPallasAux(*[a[r] for r in range(_AUX_ROWS)])
