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


def _qp_kernel(p_ref, q_ref, lb_ref, ub_ref, x0_ref, y0_ref, rho0_ref,
               *rest,
               n: int, iters: int, rounds: int,
               rho_scale: float, sigma: float, alpha: float, pack: int,
               eps_abs: float, eps_rel: float,
               acc_abs: float, acc_rel: float, scaled: bool = False):
    # batch packed over (pack sublanes x lanes): logical row i is the
    # (pack, TB) block at physical rows [i*pack, (i+1)*pack) - every
    # multiply-add fills the full (8, 128) f32 VPU tile instead of 1/8 of it
    # scaled=True adds a d_ref input (the Jacobi weights) and reports all
    # residual stats in the ORIGINAL coordinates (primal rows * d, dual rows
    # / d - solvers/boxqp._residual_stats semantics); scaled=False keeps the
    # historical program byte-identical (no extra input, no weight ops)
    if scaled:
        d_ref, x_ref, aux_ref, y_ref = rest
    else:
        x_ref, aux_ref, y_ref = rest
    row = lambda ref, i: ref[i * pack : (i + 1) * pack, :]
    P = [row(p_ref, i) for i in range(n * n)]
    q = [row(q_ref, i) for i in range(n)]
    lb = [row(lb_ref, i) for i in range(n)]
    ub = [row(ub_ref, i) for i in range(n)]

    # rho per lane: rho_scale * mean(diag P), exactly as the XLA path
    # (solvers/boxqp.py:207-208; no extra floor - parity requires identical
    # iterates). A carried rho0 > 0 (dual warm-start across an MPC step
    # sequence) overrides the cold default, clipped to the adaptation range
    # - mirrors solvers/boxqp._warm_rho.
    diag_sum = None
    for i in range(n):
        d = P[i * n + i]
        diag_sum = d if diag_sum is None else diag_sum + d
    diag_scale = jnp.maximum(diag_sum / float(n), 1e-12)
    rho0 = row(rho0_ref, 0)
    rho = jnp.where(rho0 > 0,
                    jnp.clip(rho0, 1e-8 * diag_scale, 1e8 * diag_scale),
                    rho_scale * diag_scale)

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

    # warm start, clipped into the box (solvers/boxqp.py:209-211); the dual
    # starts from the carried y0 (zeros = the cold default)
    x = [jnp.minimum(jnp.maximum(row(x0_ref, i), lb[i]), ub[i]) for i in range(n)]
    z = list(x)
    y = [row(y0_ref, i) for i in range(n)]

    prim = dual = xmax = zmax = pxmax = ymax = jnp.zeros_like(rho)
    if scaled:
        dd = [row(d_ref, i) for i in range(n)]
        wpm = lambda rows: [dd[i] * rows[i] for i in range(n)]
        wdm = lambda rows: [rows[i] / dd[i] for i in range(n)]
    else:
        wpm = wdm = lambda rows: rows
    qmax = maxabs(wdm(q))

    for rnd in range(rounds):
        inv = inverse_of_K(rho)
        for _ in range(iters):
            rhs = [sigma * x[i] - q[i] + rho * z[i] - y[i] for i in range(n)]
            x = matvec(inv, rhs)
            z_arg = [alpha * x[i] + (1.0 - alpha) * z[i] for i in range(n)]
            z = [jnp.minimum(jnp.maximum(z_arg[i] + y[i] / rho, lb[i]), ub[i])
                 for i in range(n)]
            y = [y[i] + rho * (z_arg[i] - z[i]) for i in range(n)]

        # residuals + OSQP rho rebalancing, frozen once the iterates pass
        # the acceptance rule - the exact mirror of solve_boxqp_fixed
        # (solvers/boxqp.py): a healthy solve carries its working rho
        # forward unchanged (the dual warm-start value for the next MPC
        # solve), a struggling one adapts, after the final round too.
        Px = matvec(P, x)
        prim = maxabs(wpm([x[i] - z[i] for i in range(n)]))
        dual = maxabs(wdm([Px[i] + q[i] + y[i] for i in range(n)]))
        xmax, zmax = maxabs(wpm(x)), maxabs(wpm(z))
        pxmax, ymax = maxabs(wdm(Px)), maxabs(wdm(y))
        ep = eps_abs + eps_rel * jnp.maximum(xmax, zmax)
        ed = eps_abs + eps_rel * jnp.maximum(pxmax, jnp.maximum(qmax, ymax))
        ap = acc_abs + acc_rel * jnp.maximum(xmax, zmax)
        ad = acc_abs + acc_rel * jnp.maximum(pxmax, jnp.maximum(qmax, ymax))
        accepted = jnp.logical_and(prim <= jnp.maximum(ep, ap),
                                   dual <= jnp.maximum(ed, ad))
        prim_s = prim / jnp.maximum(jnp.maximum(xmax, zmax), 1e-12)
        dual_s = dual / jnp.maximum(jnp.maximum(pxmax, jnp.maximum(qmax, ymax)), 1e-12)
        ratio = jnp.sqrt(prim_s / jnp.maximum(dual_s, 1e-16))
        rho = jnp.where(accepted, rho,
                        jnp.clip(rho * ratio, 1e-8 * diag_scale, 1e8 * diag_scale))

    for i in range(n):
        x_ref[i * pack : (i + 1) * pack, :] = z[i]
        y_ref[i * pack : (i + 1) * pack, :] = y[i]
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
    rho: jnp.ndarray    # (B,) final (post-rebalance) penalty - warm value
    y: jnp.ndarray = None  # (B, n) final dual - warm value for the next solve
    # (B, n, n) final-round K-inverse (boxqp_pallas_big only; in the solve's
    # own Jacobi-scaled coordinates) - the kinv0 warm start for the next
    # solve's Newton-Schulz refresh. None from the small kernel (its
    # Gauss-Jordan inverse lives in-kernel and is not materialized).
    kinv: jnp.ndarray = None


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
                                             "sublanes", "eps_abs", "eps_rel",
                                             "acc_abs", "acc_rel", "scale"))
def boxqp_pallas(P, q, lb, ub, x0=None, iters: int = 60, rounds: int = 1,
                 rho_scale: float = 0.1, sigma: float = 1e-6, alpha: float = 1.6,
                 tile_b: int = 256, interpret: bool = False,
                 return_aux: bool = False, sublanes: int = 8,
                 y0=None, rho0=None,
                 eps_abs: float = 1e-6, eps_rel: float = 1e-6,
                 acc_abs: float = 1e-3, acc_rel: float = 1e-3,
                 scale: bool = False):
    """Solve a batch of box QPs with the fused lane-batched kernel.

    :param P: (B, n, n) SPD matrices (f32); n <= ~16 (fully unrolled).
    :param q, lb, ub: (B, n).
    :param x0: optional (B, n) warm start (clipped into the box).
    :param iters: ADMM iterations per round; `rounds` rounds with rho
        rebalanced between them (mirrors BoxQPParams.max_iter/n_rounds).
    :param sublanes: batch-packing factor across the sublane dimension -
        each logical row becomes a (sublanes, lanes) block so VPU tiles are
        fully utilized (8 = the f32 tile height; 1 = lanes-only layout).
    :param y0: optional (B, n) dual warm start (zeros = cold).
    :param rho0: optional (B,) penalty warm start; lanes <= 0 use the cold
        rho_scale * mean(diag P) default (solvers/boxqp._warm_rho semantics).
    :return: (B, n) box-feasible solutions; with return_aux=True, a
        (solutions, BoxQPPallasAux) pair for acceptance checks and dual
        warm-starting (aux.y, aux.rho).
    """
    P = jnp.asarray(P, jnp.float32)
    # symmetrize like the XLA path (solvers/boxqp.py:203) so iterates and
    # residuals agree for not-exactly-symmetric inputs
    P = 0.5 * (P + jnp.swapaxes(P, -1, -2))
    d_eq = None
    if scale:
        # Jacobi equilibration OUTSIDE the kernel (cheap batched elementwise
        # XLA): the kernel solves the scaled problem, outputs are unscaled
        # below - same helper as the XLA path so iterates are bit-identical
        from ..solvers.boxqp import jacobi_scale_boxqp
        f32 = lambda a: None if a is None else jnp.asarray(a, jnp.float32)
        P, q, lb, ub, x0, y0, d_eq = jacobi_scale_boxqp(
            P, f32(q), f32(lb), f32(ub), f32(x0), f32(y0))
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
    y0_in = pack(jnp.zeros((n, Bp), jnp.float32) if y0 is None else pad(y0, n))
    # rho0 sentinel 0 = cold default (padded lanes always cold)
    rho0_in = pack(jnp.zeros((1, Bp), jnp.float32) if rho0 is None
                   else jnp.zeros((1, Bp), jnp.float32).at[0, :B].set(
                       jnp.asarray(rho0, jnp.float32)))
    # padded P lanes are zero with q = x0 = 0 -> K = (sigma + rho_pad) I
    # with rho_pad = rho_scale * 1e-12 (diag_scale floor): x/z/y stay
    # exactly 0 through every iteration - benign

    kernel = functools.partial(_qp_kernel, n=n, iters=iters, rounds=rounds,
                               rho_scale=rho_scale, sigma=sigma, alpha=alpha,
                               pack=S, eps_abs=eps_abs, eps_rel=eps_rel,
                               acc_abs=acc_abs, acc_rel=acc_rel,
                               scaled=scale)
    vec = lambda rows: pl.BlockSpec((rows * S, tb), lambda b: (0, b),
                                    memory_space=pltpu.VMEM)
    inputs = [p_in, q_in, lb_in, ub_in, x0_in, y0_in, rho0_in]
    in_specs = [vec(n * n), vec(n), vec(n), vec(n), vec(n), vec(n), vec(1)]
    if scale:
        # Jacobi weights as an extra input (padded lanes get d = 1 so their
        # residual stats stay finite); unscaled programs keep the historical
        # 7-input signature byte-identical
        d_in = pack(jnp.full((n, Bp), 1.0, jnp.float32).at[:, :B].set(
            jnp.asarray(d_eq, jnp.float32).T))
        inputs.append(d_in)
        in_specs.append(vec(n))
    out, aux, yout = pl.pallas_call(
        kernel,
        grid=(W // tb,),
        in_specs=in_specs,
        out_specs=[vec(n), vec(_AUX_ROWS), vec(n)],
        out_shape=[
            jax.ShapeDtypeStruct((n * S, W), jnp.float32),
            jax.ShapeDtypeStruct((_AUX_ROWS * S, W), jnp.float32),
            jax.ShapeDtypeStruct((n * S, W), jnp.float32),
        ],
        interpret=interpret,
    )(*inputs)
    x_out = out.reshape(n, Bp)[:, :B].T
    if d_eq is not None:
        x_out = d_eq * x_out
    if not return_aux:
        return x_out
    a = aux.reshape(_AUX_ROWS, Bp)[:, :B]
    y_out = yout.reshape(n, Bp)[:, :B].T
    if d_eq is not None:
        y_out = y_out / d_eq
    return x_out, BoxQPPallasAux(*[a[r] for r in range(_AUX_ROWS)], y=y_out)


# ---------------------------------------------------------------------------
# Large-n looped kernel (n up to ~160: every preset's condensed QP)
# ---------------------------------------------------------------------------
#
# The kernel above fully unrolls both the n x n inverse and the ADMM chain as
# per-element python lists - ideal at n <= 16 (flagship n = 10) where the
# whole program is a short flat FMA chain, but its program size grows as
# O(n^3 + n^2 * iters): at the reference's larger QPs (not_state_freq n = 50,
# drag n = 32, crosstalk n = 40, cnot n = 150 - reference optimize.py:59
# solves all of these through OSQP) it is uncompilable. This variant keeps
# the data SoA (lanes = batch) but swaps both explosions for loops:
#
#   - the K^-1 factorization moves OUT of the kernel: between rho rounds the
#     host program computes Kinv = ns_inverse(P + (sigma+rho) I) as batched
#     XLA matmuls (MXU-shaped, and the exact same inverse the XLA path
#     solvers/boxqp.solve_boxqp_fixed uses - kernel iterates mirror it);
#   - the `iters` ADMM iterations run under a fori_loop with (x, z, y)
#     VMEM-resident, the x-update accumulated column-by-column
#     (acc += Kinv[:, j] * rhs[j], a (n, LANE) broadcast-FMA per column), so
#     Kinv is read from VMEM once per iteration and nothing round-trips HBM;
#   - rho rebalancing between rounds is plain batched XLA on the (B, n)
#     state (OSQP residual-balancing rule, identical to the small kernel).
#
# One jit program = `rounds` x [XLA inverse + one kernel dispatch] - the
# "chunked ADMM" form: deep budgets (cnot's 3 x 300) cost loop trips, not
# program size.


def _admm_loop_kernel(kinv_ref, q_ref, lb_ref, ub_ref, rho_ref,
                      x_ref, z_ref, y_ref, xo_ref, zo_ref, yo_ref, *,
                      n: int, iters: int, sigma: float, alpha: float,
                      unroll: bool = False):
    """`iters` relaxed-ADMM iterations for a (n, LANES) lane block.

    kinv_ref is COLUMN-major: kinv_ref[j] = Kinv[:, j] per lane, so the
    x-update is a running (n, LANES) FMA over columns with no per-row
    scatter. rho_ref is a (1, LANES) per-lane row, broadcast over n.

    unroll=True flattens the iteration loop too (no fori_loop at all): at
    small n * iters this is the shortest-program form, and with the inverse
    already outside the kernel it is ~2x shorter than the in-kernel
    Gauss-Jordan form (`_qp_kernel`) at the same budget - measured 2.2-2.7x
    faster than the small kernel at flagship size on the axon chip
    (/tmp/r3_kernels.log: 158 ms vs 433 ms steady at B=8192, 2x10).
    unroll=False keeps a fori_loop over iterations so deep budgets (cnot's
    2x50 at n=150) cost loop trips, not program size.
    """
    q = q_ref[:]
    lb = lb_ref[:]
    ub = ub_ref[:]
    rho = rho_ref[:]  # (1, LANES)

    def body(xzy):
        x, z, y = xzy
        rhs = sigma * x - q + rho * z - y
        # column accumulation is STATICALLY unrolled in both forms (n is a
        # trace-time constant): dynamic ref indexing / lax.dynamic_slice is
        # an unimplemented Pallas-TPU lowering on the axon backend (measured:
        # "Unimplemented primitive ... KernelType.TC: dynamic_slice"), and a
        # static O(n) FMA chain per iteration is small even at n = 150.
        # unroll only controls whether the ITERS loop is flattened too.
        x_t = None
        for j in range(n):
            t = kinv_ref[j] * rhs[j : j + 1, :]
            x_t = t if x_t is None else x_t + t
        z_arg = alpha * x_t + (1.0 - alpha) * z
        z_new = jnp.minimum(jnp.maximum(z_arg + y / rho, lb), ub)
        y_new = y + rho * (z_arg - z_new)
        return (x_t, z_new, y_new)

    xzy = (x_ref[:], z_ref[:], y_ref[:])
    if unroll:
        for _ in range(iters):
            xzy = body(xzy)
        x, z, y = xzy
    else:
        x, z, y = jax.lax.fori_loop(0, iters, lambda _, s: body(s), xzy)
    xo_ref[:] = x
    zo_ref[:] = z
    yo_ref[:] = y


def _admm_iters_lanes(Kinv, q_l, lb_l, ub_l, rho_l, x_l, z_l, y_l,
                      iters: int, sigma: float, alpha: float,
                      interpret: bool, unroll: bool = False):
    """Dispatch the looped kernel over lane tiles.

    All operands lane-last: Kinv (B, n, n) batch-first (transposed here),
    vectors (n, Bp), rho (1, Bp); Bp a multiple of _LANE. Returns updated
    (x, z, y) in lane layout.

    VMEM sizing: a (n, n, LANE) Kinv block is n^2 * 512 bytes; while a
    double-buffered pipeline fits (~<=4 MB, n <= ~90) the whole batch runs as
    ONE grid; beyond that (cnot n = 150: 11.5 MB/block) each lane tile is its
    own single-block dispatch so only one Kinv block is ever resident.
    """
    n = q_l.shape[0]
    Bp = q_l.shape[1]
    # column-major lane layout: kinv_l[j, i, b] = Kinv[b, i, j]
    kinv_l = jnp.transpose(Kinv, (2, 1, 0))
    kernel = functools.partial(_admm_loop_kernel, n=n, iters=iters,
                               sigma=sigma, alpha=alpha, unroll=unroll)
    n_tiles = Bp // _LANE
    block_bytes = n * n * _LANE * 4

    def call(grid, kspec_map, vspec_map, rspec_map, TB, args):
        vec = lambda m: pl.BlockSpec((n, TB), m, memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((n, n, TB), kspec_map, memory_space=pltpu.VMEM),
                vec(vspec_map), vec(vspec_map), vec(vspec_map),
                pl.BlockSpec((1, TB), rspec_map, memory_space=pltpu.VMEM),
                vec(vspec_map), vec(vspec_map), vec(vspec_map),
            ],
            out_specs=[vec(vspec_map)] * 3,
            out_shape=[jax.ShapeDtypeStruct((n, args[1].shape[1]),
                                            jnp.float32)] * 3,
            interpret=interpret,
        )(*args)

    if n_tiles == 1 or block_bytes <= 4 * 1024 * 1024:
        # one pipelined grid over lane tiles
        return call((n_tiles,),
                    lambda b: (0, 0, b), lambda b: (0, b), lambda b: (0, b),
                    _LANE, (kinv_l, q_l, lb_l, ub_l, rho_l, x_l, z_l, y_l))
    # big-n: one single-block dispatch per lane tile (no double buffering)
    outs = []
    for g in range(n_tiles):
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, g * _LANE, _LANE, axis=-1)
        outs.append(call((1,),
                         lambda b: (0, 0, 0), lambda b: (0, 0), lambda b: (0, 0),
                         _LANE,
                         (sl(kinv_l), sl(q_l), sl(lb_l), sl(ub_l), sl(rho_l),
                          sl(x_l), sl(z_l), sl(y_l))))
    return tuple(jnp.concatenate([o[k] for o in outs], axis=1) for k in range(3))


@functools.partial(jax.jit, static_argnames=("iters", "rounds", "ns_iters",
                                             "rho_scale", "sigma", "alpha",
                                             "interpret", "return_aux",
                                             "eps_abs", "eps_rel",
                                             "acc_abs", "acc_rel",
                                             "unroll_iters", "scale",
                                             "ns_refresh", "ns_guard",
                                             "ns_polish", "lqr_unroll",
                                             "lqr_pscan", "kinv_method"))
def boxqp_pallas_big(P, q, lb, ub, x0=None, iters: int = 60, rounds: int = 1,
                     rho_scale: float = 0.1, sigma: float = 1e-6,
                     alpha: float = 1.6, ns_iters: int = 30,
                     interpret: bool = False, return_aux: bool = False,
                     y0=None, rho0=None,
                     eps_abs: float = 1e-6, eps_rel: float = 1e-6,
                     acc_abs: float = 1e-3, acc_rel: float = 1e-3,
                     unroll_iters: bool = False, scale: bool = False,
                     kinv0=None, ns_refresh: int = 10,
                     ns_guard: float = 0.9,
                     lqr_data=None, ns_polish: int = 1,
                     lqr_unroll: bool = True, lqr_pscan: bool = False,
                     kinv_method: str = "ns"):
    """Batch box-QP solve with the looped large-n kernel.

    Same algorithm and acceptance semantics as `boxqp_pallas` and
    solvers/boxqp.solve_boxqp_fixed (warm start, `rounds` x `iters`
    fixed-iteration relaxed ADMM, OSQP rho rebalancing between rounds), with
    the x-update inverse computed by the SAME Newton-Schulz iteration the XLA
    "ns" backend uses - the two paths are interchangeable in the MPC driver
    at any n the condensed horizon produces (tested to n = 150, cnot_state).

    :param P: (B, n, n) SPD matrices (f32); any n (kernel loops, program
        size is independent of n and iters).
    :param q, lb, ub, x0: (B, n).
    :param unroll_iters: flatten the in-kernel ADMM loop into a static FMA
        chain (small n * iters only). With the inverse outside the kernel
        this is the shortest-serial-chain form for flagship-sized QPs:
        ~iters * n ops per round vs the in-kernel Gauss-Jordan form's
        additional ~2 n^3 - and the proven-to-lower form on TPU backends
        with limited in-kernel loop support.
    :param kinv0: optional (B, n, n) K-inverse carried from the previous
        solve of an MPC step chain (pass the previous aux.kinv unchanged).
        When given, the between-round Newton-Schulz inverses run only
        `ns_refresh` warm-started iterations instead of the cold `ns_iters`
        - the exact mirror of solvers/boxqp.solve_boxqp_fixed(kinv0=...):
        round 1 contraction-guarded from kinv0, later rounds from the
        previous round's inverse rescaled by the provably-contracting
        rho-shift factor. The NS chain is the dominant serial cost of this
        kernel's solves at production budgets (experiments/logs/
        r4_ns_share.log: freq 1.7x, drag 2.0x rollout swing over the
        ns_iters range).
    :param lqr_data: optional (Ar (B, H, m, m), Br (B, H, m, du),
        Qr (H+1, m, m), Rr (H, du, du)) real-embedded LTV problem whose
        condensed Hessian is this P (solvers/riccati.embed_ltv/embed_costs;
        Ar/Br per-lane, costs shared). When given, round 1's K-inverse is
        computed EXACTLY by the Riccati factorization + `ns_polish` NS
        cleanup iterations - O(H m^2 (m + n)) small batched matmuls instead
        of the O(ns_iters n^3) cold NS chain (VERDICT r4 item 2; the
        measured dominant rollout cost, experiments/logs/r4_ns_share.log).
        Rounds >= 2 refresh via the rho-shift rescale (`ns_refresh` iters).
        Takes precedence over kinv0. `lqr_unroll` python-unrolls the two
        horizon passes (the no-scan chip form, like the condensed assembly);
        `lqr_pscan` uses the O(log H)-depth associative-scan factorization
        instead (solvers/riccati.riccati_kinv_pscan).
    :return: (B, n) solutions; with return_aux=True, (x, BoxQPPallasAux).
    """
    P = jnp.asarray(P, jnp.float32)
    P = 0.5 * (P + jnp.swapaxes(P, -1, -2))
    B, n, _ = P.shape
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    q, lb, ub = f32(q), f32(lb), f32(ub)
    d_eq = None
    if scale:
        # Jacobi equilibration outside the kernel (same helper as the XLA
        # path - bit-identical scaled problems); outputs unscaled at return
        from ..solvers.boxqp import jacobi_scale_boxqp
        P, q, lb, ub, x0, y0, d_eq = jacobi_scale_boxqp(
            P, q, lb, ub,
            None if x0 is None else f32(x0),
            None if y0 is None else f32(y0))
    x0 = jnp.zeros((B, n), jnp.float32) if x0 is None else f32(x0)

    from ..solvers.boxqp import _warm_rho

    diag_scale = jnp.maximum(
        jnp.mean(jnp.diagonal(P, axis1=1, axis2=2), axis=1), 1e-12)  # (B,)
    rho = _warm_rho(rho0, rho_scale * diag_scale, diag_scale)
    x = jnp.clip(x0, lb, ub)
    z = x
    y = jnp.zeros_like(x) if y0 is None else f32(y0)

    # pad the batch to a lane multiple with benign identity QPs (q = 0,
    # x0 = 0 -> the padded lanes stay exactly 0 through every iteration)
    Bp = _LANE * ((B + _LANE - 1) // _LANE)
    pad_n = Bp - B
    eye = jnp.eye(n, dtype=jnp.float32)
    padm = lambda M: jnp.concatenate(
        [M, jnp.tile(eye[None], (pad_n, 1, 1))], axis=0) if pad_n else M
    padv = lambda v, fill: jnp.concatenate(
        [v, jnp.full((pad_n, n), fill, jnp.float32)], axis=0) if pad_n else v
    pads = lambda s, fill: jnp.concatenate(
        [s, jnp.full((pad_n,), fill, jnp.float32)], axis=0) if pad_n else s

    P_p = padm(P)
    q_p, lb_p, ub_p = padv(q, 0.0), padv(lb, -1.0), padv(ub, 1.0)
    x_p, z_p, y_p = padv(x, 0.0), padv(z, 0.0), padv(y, 0.0)
    rho_p = pads(rho, rho_scale)
    ds_p = pads(diag_scale, 1.0)
    # residual/acceptance stats in ORIGINAL coordinates (solvers/boxqp
    # _residual_stats semantics): primal-space rows weight by d, dual-space
    # rows by 1/d; unscaled path keeps the raw (weightless) ops
    d_p = None if d_eq is None else padv(d_eq, 1.0)
    wp = (lambda M: M) if d_p is None else (lambda M: d_p * M)
    wd = (lambda M: M) if d_p is None else (lambda M: M / d_p)

    inf_rows = lambda M: jnp.max(jnp.abs(M), axis=1)  # (Bp, n) -> (Bp,)

    from ..solvers.boxqp import ns_inverse

    # exact round-1 inverse via the Riccati factorization (computed on the
    # UNPADDED batch - rho/d_eq exist there; padded lanes then get the
    # identity, benign exactly as for the kinv0 carry below)
    kexact = None
    if lqr_data is not None:
        from ..solvers.riccati import riccati_kinv_batch

        Ar_b, Br_b, Qr_s, Rr_s = (jnp.asarray(a, jnp.float32)
                                  for a in lqr_data)
        kexact = riccati_kinv_batch(Ar_b, Br_b, Qr_s, Rr_s, rho,
                                    sigma, d=d_eq, unroll=lqr_unroll,
                                    pscan=lqr_pscan)
        kinv0 = None  # exact inverse supersedes the cross-solve carry

    # carried-inverse warm start (mirror of solve_boxqp_fixed kinv0): padded
    # lanes get the identity, whose guard residual |1 - (1+sigma+rho)| is
    # within the contraction bound - benign either way
    kinv_prev = None
    if kinv0 is not None:
        kinv_prev = padm(jnp.asarray(kinv0, jnp.float32))
    rho_prev = None
    ric_prev = ric_rho = None

    lanes = lambda v: v.T  # (Bp, n) -> (n, Bp)
    for rnd in range(rounds):
        K = P_p + (sigma + rho_p)[:, None, None] * eye
        if kinv_method == "gj":
            # exact matrix-form Gauss-Jordan inverse every round: O(n)
            # whole-tensor ops, no NS chain and no carry bookkeeping
            # (experiments/logs/r5_roofline.log - the inverse is the
            # kernels' measured fixed cost, not the ADMM iterations)
            from ..utils.linalg import gj_inverse

            Kinv = gj_inverse(K)
        elif kexact is not None and rnd == 0:
            Kinv = padm(kexact)
            for _ in range(ns_polish):
                Kinv = Kinv @ (2.0 * eye - K @ Kinv)
            ric_prev, ric_rho = Kinv, rho_p
        elif kexact is not None:
            c = jnp.minimum(1.0, (sigma + ric_rho) / (sigma + rho_p))
            Kinv = ns_inverse(K, iters=ns_refresh,
                              X0=c[:, None, None] * ric_prev, guard=jnp.inf)
            ric_prev, ric_rho = Kinv, rho_p
        elif kinv_prev is None:
            Kinv = ns_inverse(K, iters=ns_iters)
        elif rho_prev is None:
            Kinv = ns_inverse(K, iters=ns_refresh, X0=kinv_prev,
                              guard=ns_guard)
        else:
            # trust the rho-shift rescale (boxqp.py mirror: any r0 < 1 is
            # provable here and no finite guard separates a huge-but-exact
            # rho jump from a partial previous inverse)
            c = jnp.minimum(1.0, (sigma + rho_prev) / (sigma + rho_p))
            Kinv = ns_inverse(K, iters=ns_refresh,
                              X0=c[:, None, None] * kinv_prev, guard=jnp.inf)
        if kinv0 is not None:
            kinv_prev, rho_prev = Kinv, rho_p
        x_l, z_l, y_l = _admm_iters_lanes(
            Kinv, lanes(q_p), lanes(lb_p), lanes(ub_p), rho_p[None, :],
            lanes(x_p), lanes(z_p), lanes(y_p),
            iters=iters, sigma=sigma, alpha=alpha, interpret=interpret,
            unroll=unroll_iters)
        x_p, z_p, y_p = x_l.T, z_l.T, y_l.T

        # OSQP residual balancing, frozen once the iterates pass the
        # acceptance rule - the exact mirror of solve_boxqp_fixed: a healthy
        # solve carries its working rho forward unchanged (the dual
        # warm-start value for the next MPC solve), a struggling one adapts,
        # after the final round too (solvers/boxqp.py rho-adaptation block)
        Px = jnp.einsum("bij,bj->bi", P_p, x_p)
        prim = inf_rows(wp(x_p - z_p))
        dual = inf_rows(wd(Px + q_p + y_p))
        xmax = jnp.maximum(inf_rows(wp(x_p)), inf_rows(wp(z_p)))
        dmax = jnp.maximum(inf_rows(wd(Px)),
                           jnp.maximum(inf_rows(wd(q_p)), inf_rows(wd(y_p))))
        ep = eps_abs + eps_rel * xmax
        ed = eps_abs + eps_rel * dmax
        ap = acc_abs + acc_rel * xmax
        ad = acc_abs + acc_rel * dmax
        accepted = jnp.logical_and(prim <= jnp.maximum(ep, ap),
                                   dual <= jnp.maximum(ed, ad))
        prim_s = prim / jnp.maximum(xmax, 1e-12)
        dual_s = dual / jnp.maximum(dmax, 1e-12)
        ratio = jnp.sqrt(prim_s / jnp.maximum(dual_s, 1e-16))
        rho_p = jnp.where(accepted, rho_p,
                          jnp.clip(rho_p * ratio, 1e-8 * ds_p, 1e8 * ds_p))

    x_out = z_p[:B]
    if d_eq is not None:
        x_out = d_eq * x_out
    if not return_aux:
        return x_out
    xb, zb, yb, qb = x_p[:B], z_p[:B], y_p[:B], q_p[:B]
    Px = jnp.einsum("bij,bj->bi", P, xb)
    y_ret = yb if d_eq is None else yb / d_eq
    wpb = (lambda M: M) if d_eq is None else (lambda M: d_eq * M)
    wdb = (lambda M: M) if d_eq is None else (lambda M: M / d_eq)
    return x_out, BoxQPPallasAux(
        prim=inf_rows(wpb(xb - zb)), dual=inf_rows(wdb(Px + qb + yb)),
        xmax=inf_rows(wpb(xb)), zmax=inf_rows(wpb(zb)), pxmax=inf_rows(wdb(Px)),
        qmax=inf_rows(wdb(qb)), ymax=inf_rows(wdb(yb)), rho=rho_p[:B], y=y_ret,
        kinv=Kinv[:B])
