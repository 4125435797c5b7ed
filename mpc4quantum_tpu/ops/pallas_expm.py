"""Fused batched small-matrix exponential as a Pallas TPU kernel.

The plant hot op is expm of *many tiny* complex matrices (d = 4..16, batch =
horizon x scenarios). The XLA path (ops/expm.py) maps this to batched d x d
matmuls - far below MXU tile size, so the array is mostly idle and every
Pade step round-trips HBM. This kernel flips the layout: the BATCH becomes
the lane dimension ("structure of arrays"), so each multiply-add in the
d^3-step matrix product processes a full vector register of scenarios on the
VPU, and the entire chain - norm, scaling, Taylor, squaring - fuses into one
VMEM-resident kernel.

Algorithm: scaling-and-squaring with a degree-K Taylor/Horner evaluation
(no linear solve, unlike Pade - division-free is what makes the kernel
trivially vectorizable and avoids pivoting). With ||X|| <= 1 after scaling,
K = 18 gives ~1e-15 truncation (f32 rounding dominates).

Complex support: matrices are carried as (re, im) planes; complex multiplies
expand to 4 real FMAs. This also sidesteps backends with incomplete complex
lowering.

Layout contract: inputs (B, d, d) are transposed to (d*d, B') with B' padded
to the sublane*lane multiple, then packed so each matrix element owns a
(sublanes, W) block - batch fills BOTH tile dimensions of the (8, 128) f32
tile, not just lanes. The kernel indexes matrix element (i, k) as the row
block [i*d*pack + k*pack, ...), a static slice.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TAYLOR_K = 18
_LANE = 128


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def _matmul_rows(a_r, a_i, b_r, b_i, d):
    """Complex matmul on row-list representation: each of a_r[i*d+k] is a
    (1, TB) vector; returns row lists of the product."""
    c_r = [None] * (d * d)
    c_i = [None] * (d * d)
    for i in range(d):
        for j in range(d):
            acc_r = None
            for k in range(d):
                pr, pi = _cmul(a_r[i * d + k], a_i[i * d + k], b_r[k * d + j], b_i[k * d + j])
                if acc_r is None:
                    acc_r, acc_i = pr, pi
                else:
                    acc_r, acc_i = acc_r + pr, acc_i + pi
            c_r[i * d + j], c_i[i * d + j] = acc_r, acc_i
    return c_r, c_i


def _expm_kernel(ar_ref, ai_ref, or_ref, oi_ref, *, d: int, max_squarings: int,
                 pack: int, taylor_k: int = _TAYLOR_K):
    # batch packed over (pack sublanes x lanes): matrix element row i is the
    # (pack, TB) block at physical rows [i*pack, (i+1)*pack) - full (8, 128)
    # f32 VPU tile utilization (see ops/pallas_qp.py)
    row = lambda ref, i: ref[i * pack : (i + 1) * pack, :]
    rows_r = [row(ar_ref, i) for i in range(d * d)]
    rows_i = [row(ai_ref, i) for i in range(d * d)]

    if max_squarings > 0:
        # 1-norm per batch element: max_j sum_i |A[i,j]|
        col_sums = []
        for j in range(d):
            s = None
            for i in range(d):
                mag = jnp.sqrt(rows_r[i * d + j] ** 2 + rows_i[i * d + j] ** 2)
                s = mag if s is None else s + mag
            col_sums.append(s)
        norm1 = col_sums[0]
        for s in col_sums[1:]:
            norm1 = jnp.maximum(norm1, s)

        # squaring count: ||A/2^s|| <= 1
        s_cnt = jnp.ceil(jnp.log2(jnp.maximum(norm1, 1.0)))
        s_cnt = jnp.clip(s_cnt, 0.0, float(max_squarings))
        scale = jnp.exp2(-s_cnt)

        x_r = [r * scale for r in rows_r]
        x_i = [r * scale for r in rows_i]
    else:
        # max_squarings == 0: the caller certifies ||A|| <= 1 (host-side
        # norm bound, plants/quantum.taylor_norm_bound) - no norm, no
        # scaling, no squaring chain in the kernel at all
        x_r, x_i = rows_r, rows_i

    # Horner Taylor: P = I; for k = K..1: P = I + (X @ P) / k
    zeros = jnp.zeros_like(x_r[0])
    ones = jnp.ones_like(x_r[0])
    eye_r = [ones if (i % (d + 1) == 0) else zeros for i in range(d * d)]
    eye_i = [zeros] * (d * d)
    p_r, p_i = list(eye_r), list(eye_i)
    for k in range(taylor_k, 0, -1):
        xp_r, xp_i = _matmul_rows(x_r, x_i, p_r, p_i, d)
        inv_k = 1.0 / float(k)
        p_r = [eye_r[n] + xp_r[n] * inv_k for n in range(d * d)]
        p_i = [eye_i[n] + xp_i[n] * inv_k for n in range(d * d)]

    # masked repeated squaring (static bound, data-dependent count)
    for step in range(max_squarings):
        sq_r, sq_i = _matmul_rows(p_r, p_i, p_r, p_i, d)
        keep = step < s_cnt  # (1, TB) bool
        p_r = [jnp.where(keep, sq_r[n], p_r[n]) for n in range(d * d)]
        p_i = [jnp.where(keep, sq_i[n], p_i[n]) for n in range(d * d)]

    for n in range(d * d):
        or_ref[n * pack : (n + 1) * pack, :] = p_r[n]
        oi_ref[n * pack : (n + 1) * pack, :] = p_i[n]


@functools.partial(jax.jit, static_argnames=("max_squarings", "tile_b", "interpret",
                                             "sublanes", "taylor_k"))
def expm_pallas(A, max_squarings: int = 12, tile_b: int = 512, interpret: bool = False,
                sublanes: int = 8, taylor_k: int = _TAYLOR_K):
    """Batched expm via the fused Pallas kernel.

    :param A: (B, d, d) complex (or real) matrices; d <= 8 recommended
        (the kernel fully unrolls d^3 - compile time grows accordingly).
    :param max_squarings: static bound on the squaring count. 0 = the
        caller certifies ||A||_1 <= 1 host-side (taylor_norm_bound): the
        kernel drops the norm/scale/squaring chain entirely - the
        latency-bound serial chain shrinks from taylor_k + max_squarings
        to taylor_k matmuls.
    :param sublanes: batch-packing factor across sublanes (8 = the f32 tile
        height, full VPU utilization; 1 = lanes-only layout).
    :param taylor_k: Horner Taylor degree. 18 ~ 1e-15 truncation at
        ||X|| <= 1; 12 ~ 9e-12 at ||X|| <= 0.8 - both below f32 rounding.
    :return: (B, d, d) expm(A), same dtype as A.
    """
    A = jnp.asarray(A)
    B, d, _ = A.shape
    is_cx = jnp.issubdtype(A.dtype, jnp.complexfloating)
    rdtype = jnp.real(A).dtype
    S = sublanes

    W_min = _LANE * ((B + S * _LANE - 1) // (S * _LANE))
    tb = min(tile_b, W_min)
    W = ((W_min + tb - 1) // tb) * tb
    Bp = S * W

    # (B, d, d) -> (d*d*S, W): batch element b at logical row i, sublane
    # b // W, lane b % W
    flat = A.reshape(B, d * d).T
    ar = jnp.zeros((d * d, Bp), rdtype).at[:, :B].set(jnp.real(flat)).reshape(d * d * S, W)
    ai = jnp.zeros((d * d, Bp), rdtype).at[:, :B].set(jnp.imag(flat)).reshape(d * d * S, W)

    kernel = functools.partial(_expm_kernel, d=d, max_squarings=max_squarings,
                               pack=S, taylor_k=taylor_k)
    grid = (W // tb,)
    out_r, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((d * d * S, tb), lambda b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((d * d * S, tb), lambda b: (0, b), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((d * d * S, tb), lambda b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((d * d * S, tb), lambda b: (0, b), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((d * d * S, W), rdtype),
            jax.ShapeDtypeStruct((d * d * S, W), rdtype),
        ],
        interpret=interpret,
    )(ar, ai)

    out = out_r.reshape(d * d, Bp)[:, :B].T.reshape(B, d, d)
    if is_cx:
        out = jax.lax.complex(out, out_i.reshape(d * d, Bp)[:, :B].T.reshape(B, d, d)).astype(A.dtype)
    return out.astype(A.dtype)
