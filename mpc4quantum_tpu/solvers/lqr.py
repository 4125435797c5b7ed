"""Solver-free affine-tracking LQR horizon solve.

Backward Riccati-style value iteration over affine-augmented dynamics [x; 1]
with benchmark tracking, followed by a forward rollout whose controls are
hard-clipped to the saturation box. Math parity with reference lqr.py:14-79
(the reference keeps this as a dead-but-instructive alternative to the QP; in
the TPU engine it is a live fast path: two `lax.scan`s, no factorization-free
iteration, no dual variables - ideal when the saturation constraint is rarely
active or a cheap warm start for the ADMM QP).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.linalg import cx_solve


class LQRResult(NamedTuple):
    X: jnp.ndarray  # (dim_x, H+1)
    U: jnp.ndarray  # (dim_u, H)
    cost: jnp.ndarray
    gains: jnp.ndarray  # (H, dim_u, dim_x+1)


def _dag(A):
    return jnp.conj(jnp.swapaxes(A, -1, -2))


def lqr_quad_program(x0, X_bm, U_bm, Q_s, R_s, A_s, B_s, sat=None, Delta_s=None) -> LQRResult:
    """Affine-tracking LQR (reference lqr.py:14-79 semantics).

    :param x0: (dim_x,) complex initial state.
    :param X_bm: (dim_x, H+1) benchmarks; :param U_bm: (dim_u, H).
    :param Q_s: (H+1, dim_x, dim_x); :param R_s: (H, dim_u, dim_u).
    :param A_s/B_s: (H, dim_x, dim_x) / (H, dim_x, dim_u) dynamics.
    :param sat: optional saturation for the forward-rollout clip
        (reference lqr.py:76).
    :param Delta_s: optional (H, dim_x) affine dynamics residuals. Extension
        over the reference (whose LQR drops the linearization offset,
        lqr.py:44-51): Delta folds into the affine row of the augmented
        dynamics, making the value iteration consistent with the same LTV
        model the QP tracks.
    """
    dim_x = x0.shape[0]
    dim_u = U_bm.shape[0]
    cdtype = A_s.dtype
    eye = jnp.eye(dim_x, dtype=cdtype)

    def q_aug(Q, xbm):
        qx = Q @ xbm
        top = jnp.concatenate([Q, -qx[:, None]], axis=1)
        bot = jnp.concatenate([-jnp.conj(qx)[None, :], (jnp.conj(xbm) @ qx).real.astype(cdtype)[None, None]], axis=1)
        return jnp.concatenate([top, bot], axis=0)

    V_T = q_aug(Q_s[-1].astype(cdtype), X_bm[:, -1].astype(cdtype))

    def backward(V, inp):
        A, B, Q, R, xbm, ubm, delta = inp
        # augmented dynamics [[A, (A-I)xbm + B ubm + Delta], [0, 1]]
        aff = (A - eye) @ xbm + B @ ubm.astype(cdtype) + delta
        A_a = jnp.block([[A, aff[:, None]], [jnp.zeros((1, dim_x), cdtype), jnp.ones((1, 1), cdtype)]])
        B_a = jnp.concatenate([B, jnp.zeros((1, dim_u), cdtype)], axis=0)
        Q_a = q_aug(Q.astype(cdtype), xbm)
        BtV = _dag(B_a) @ V
        # Deviation from reference lqr.py:61 (pinv): the gain system
        # R + B^H V B is positive definite for R > 0, so a direct solve with
        # a small Tikhonov jitter replaces the SVD-based pseudo-inverse
        # (complex SVD is unavailable on some TPU backend paths; the jitter
        # covers the semidefinite corner pinv would regularize).
        M = R.astype(cdtype) + BtV @ B_a
        M = M + 1e-12 * jnp.trace(M).real.astype(cdtype) * jnp.eye(M.shape[0], dtype=cdtype)
        K = -cx_solve(M, BtV @ A_a)
        S = A_a + B_a @ K
        V_new = Q_a + _dag(K) @ R.astype(cdtype) @ K + _dag(S) @ V @ S
        return V_new, K

    H = A_s.shape[0]
    deltas = jnp.zeros((H, dim_x), cdtype) if Delta_s is None else Delta_s.astype(cdtype)
    inputs = (A_s, B_s, Q_s[:-1], R_s, X_bm[:, :-1].T.astype(cdtype), U_bm.T, deltas)
    _, gains_rev = jax.lax.scan(backward, V_T, jax.tree.map(lambda a: a[::-1], inputs))
    gains = gains_rev[::-1]  # (H, dim_u, dim_x+1)

    def forward(carry, inp):
        x, cost = carry
        K, A, B, Q_next, R, xbm, ubm, delta = inp
        dx_aug = jnp.concatenate([x - xbm, jnp.ones((1,), cdtype)])
        u = (K @ dx_aug).real + ubm
        if sat is not None:
            u = jnp.clip(u, -sat, sat)
        x_next = A @ x + B @ u.astype(cdtype) + delta
        cost = cost + jnp.real(jnp.conj(x_next) @ (Q_next.astype(cdtype) @ x_next)) + u @ (jnp.real(R).astype(u.dtype) @ u)
        return (x_next, cost), (x_next, u)

    x0c = x0.astype(cdtype)
    (xf, cost), (X_tail, U_all) = jax.lax.scan(
        forward,
        (x0c, jnp.zeros((), jnp.real(x0c).dtype)),
        (gains, A_s, B_s, Q_s[1:], R_s, X_bm[:, :-1].T.astype(cdtype),
         U_bm.T.astype(jnp.real(x0c).dtype), deltas),
    )
    X = jnp.concatenate([x0c[None], X_tail], axis=0).T
    return LQRResult(X=X, U=U_all.T, cost=cost, gains=gains)
