"""Exact condensed-Hessian inverse via an LQR/Riccati factorization.

The fixed-iteration ADMM (solvers/boxqp.solve_boxqp_fixed and the large-n
Pallas kernel ops/pallas_qp.boxqp_pallas_big) spends most of its serial
chain computing K^-1 with K = P + (sigma + rho) I, where P is the condensed
horizon Hessian P = Re(M^H Qbar M) + Rbar (solvers/condense._assemble_cost;
the state-eliminated form of the reference QP, reference optimize.py:12-60).
The historical inverse is a Newton-Schulz chain: 2 * ns_iters serial (n, n)
batched matmuls with n = H * dim_u - the measured dominant rollout cost of
the big-kernel presets (experiments/logs/r4_ns_share.log) and an
O(ns_iters * n^3) complexity class that round-4 budget/seed/carry sweeps
proved cannot be tuned away (VERDICT r4 item 2).

This module changes the complexity class. K is ALSO the condensed Hessian
of an equality-constrained LQR problem over the same LTV dynamics
(the reference's own sparse flattened QP form, reference optimize.py:110-162,
solved by Riccati recursion instead of a generic factorization):

    min_U  sum_{t=0}^{H} x_t^T Qr_t x_t + sum_{t=0}^{H-1} u_t^T Rr_t u_t
    s.t.   x_{t+1} = Ar_t x_t + Br_t u_t,   x_0 = 0,

in the real embedding (m = 2 dim_x; Rr_t absorbs the (sigma + rho) shift
and any Jacobi column scaling). The j-th column of K^-1 is the LQR solution
for the linear cost injection -2 e_j^T U, so ONE backward Riccati pass
(O(H m^3)) plus one backward/forward affine pass over ALL n basis columns
at once (batched (m, m) @ (m, n) matmuls, O(H m^2 n)) produces the exact
inverse - O(H m^2 (m + n)) work and roughly half the HBM bytes of the NS
chain at every big-kernel preset, with no iterative tolerance. A short
Newton-Schulz polish (ns_polish iterations, quadratic convergence) absorbs
f32 accumulation over long horizons.

Requirements (all satisfied by the condensed MPC QP): Q_t Hermitian PSD
(the real embedding [[Re, -Im], [Im, Re]] is then symmetric PSD), R_t with
symmetric real part, rho > 0 (makes every Huu SPD even where Q is singular,
e.g. leakage-penalized DRAG costs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _inv_small(M):
    """Unpivoted Gauss-Jordan inverse of a small (.., d, d) SPD matrix.

    Elementwise-only (python-unrolled over the static d, no scatter, no
    factorization primitive), so it batches on any TPU backend path - the
    same construction the small Pallas QP kernel uses in-kernel
    (ops/pallas_qp._qp_kernel). d is dim_u (1-4 on every preset); cost is
    O(d^3) elementwise FMAs. SPD + the rho shift make pivoting unnecessary.
    """
    d = M.shape[-1]
    if d == 1:
        return 1.0 / M
    K = [[M[..., i, j] for j in range(d)] for i in range(d)]
    one = jnp.ones_like(M[..., 0, 0])
    zero = jnp.zeros_like(one)
    inv = [[one if i == j else zero for j in range(d)] for i in range(d)]
    for col in range(d):
        piv = 1.0 / K[col][col]
        K[col] = [piv * e for e in K[col]]
        inv[col] = [piv * e for e in inv[col]]
        for r in range(d):
            if r == col:
                continue
            f = K[r][col]
            K[r] = [K[r][j] - f * K[col][j] for j in range(d)]
            inv[r] = [inv[r][j] - f * inv[col][j] for j in range(d)]
    return jnp.stack([jnp.stack(row, axis=-1) for row in inv], axis=-2)


def embed_ltv(A_s, B_s):
    """Real-embed per-step LTV dynamics (complex states, real controls).

    x complex with real u: x+ = A x + B u  <->  [Re x; Im x] real recursion
    with Ar = [[Re A, -Im A], [Im A, Re A]], Br = [Re B; Im B] (the reference
    embedding convention, reference mpc.py:92-93). Real inputs pass through.

    :param A_s: (H, dx, dx); :param B_s: (H, dx, du).
    :return: (Ar (H, m, m), Br (H, m, du)) real, m = 2*dx (or dx if real).
    """
    A_s = jnp.asarray(A_s)
    B_s = jnp.asarray(B_s)
    if not jnp.issubdtype(A_s.dtype, jnp.complexfloating):
        return A_s, jnp.real(B_s)
    Ar = jnp.concatenate(
        [jnp.concatenate([jnp.real(A_s), -jnp.imag(A_s)], axis=-1),
         jnp.concatenate([jnp.imag(A_s), jnp.real(A_s)], axis=-1)], axis=-2)
    Br = jnp.concatenate([jnp.real(B_s), jnp.imag(B_s)], axis=-2)
    return Ar, Br


def embed_costs(Q_s, R_s):
    """Real-embed the per-step cost matrices.

    For Hermitian Q the quadratic form Re(x^H Q x) equals the real-embedded
    form with Qr = [[Re Q, -Im Q], [Im Q, Re Q]] (symmetric PSD). R acts on
    real controls: only its symmetrized real part contributes - exactly the
    component that reaches the condensed P (solvers/condense._assemble_cost
    uses Re(R_s); the box-QP solvers then symmetrize P).

    :param Q_s: (H+1, dx, dx) Hermitian; :param R_s: (H, du, du).
    :return: (Qr (H+1, m, m), Rr (H, du, du)) real symmetric.
    """
    Q_s = jnp.asarray(Q_s)
    Rr = jnp.real(jnp.asarray(R_s))
    Rr = 0.5 * (Rr + jnp.swapaxes(Rr, -1, -2))
    if not jnp.issubdtype(Q_s.dtype, jnp.complexfloating):
        Qr = 0.5 * (Q_s + jnp.swapaxes(Q_s, -1, -2))
        return Qr, Rr
    Qr = jnp.concatenate(
        [jnp.concatenate([jnp.real(Q_s), -jnp.imag(Q_s)], axis=-1),
         jnp.concatenate([jnp.imag(Q_s), jnp.real(Q_s)], axis=-1)], axis=-2)
    Qr = 0.5 * (Qr + jnp.swapaxes(Qr, -1, -2))
    return Qr, Rr


def riccati_kinv(Ar, Br, Qr, Rr, unroll: bool = False):
    """Exact (n, n) inverse of the condensed LTV Hessian by LQR recursion.

    Computes inv(Rbar + Mu^T Qbar Mu) where Mu is the control-to-state map
    of the dynamics (x_0 = 0), Qbar = blockdiag(Qr_0..Qr_H) and
    Rbar = blockdiag(Rr_0..Rr_{H-1}) - i.e. K^-1 of the symmetrized
    condensed box-QP Hessian PROVIDED Rr already contains every diagonal
    shift ((sigma + rho) I; Jacobi scaling absorbed into Br/Rr - see
    `riccati_kinv_shifted`).

    :param Ar: (H, m, m) real transition matrices.
    :param Br: (H, m, du) real input maps.
    :param Qr: (H+1, m, m) real symmetric PSD state costs (terminal at H).
    :param Rr: (H, du, du) real SPD control costs (shift included).
    :param unroll: python-unroll both horizon passes (no lax.scan in the
        graph - the flat form for TPU backends with fragile batched loop
        lowerings, mirroring condense_horizon(unroll=True)); False = scans
        (identical iterates, ~H x faster traces - CPU/tests).
    :return: (n, n) with n = H * du, time-major like vec(U).
    """
    H, m, du = Br.shape
    n = H * du
    dtype = Ar.dtype
    eye_n = jnp.eye(n, dtype=dtype)
    W = eye_n.reshape(H, du, n)  # W[t] = the t-th du-row block of I_n

    def backward(carry, inp):
        P, v = carry
        A, B, Q, R, Wt = inp
        PB = P @ B                     # (m, du)
        Huu = R + B.T @ PB             # (du, du) SPD
        Hinv = _inv_small(Huu)
        Hux = PB.T @ A                 # (du, m)
        F = -(Hinv @ Hux)              # (du, m) feedback gain
        g = B.T @ v - Wt               # (du, n) affine injection
        f = -(Hinv @ g)                # (du, n) feedforward
        v_new = A.T @ v + F.T @ g      # (m, n)
        P_new = Q + A.T @ (P @ A) + Hux.T @ F
        P_new = 0.5 * (P_new + P_new.T)
        return (P_new, v_new), (F, f)

    def forward(x, Ff):
        F, f, A, B = Ff
        u = F @ x + f                  # (du, n) = the t-th row block of K^-1
        return A @ x + B @ u, u

    P0 = Qr[H]
    v0 = jnp.zeros((m, n), dtype)
    if unroll:
        carry = (P0, v0)
        Fs, fs = [None] * H, [None] * H
        for t in range(H - 1, -1, -1):
            carry, (Fs[t], fs[t]) = backward(
                carry, (Ar[t], Br[t], Qr[t], Rr[t], W[t]))
        x = jnp.zeros((m, n), dtype)
        rows = []
        for t in range(H):
            x, u = forward(x, (Fs[t], fs[t], Ar[t], Br[t]))
            rows.append(u)
        Kinv = jnp.concatenate(rows, axis=0)
    else:
        _, (F_s, f_s) = jax.lax.scan(
            backward, (P0, v0), (Ar, Br, Qr[:H], Rr, W), reverse=True)
        _, U = jax.lax.scan(forward, jnp.zeros((m, n), dtype),
                            (F_s, f_s, Ar, Br))
        Kinv = U.reshape(n, n)
    # K is symmetric, so K^-1 is: symmetrize away the one-sided f32 rounding
    return 0.5 * (Kinv + Kinv.T)


def riccati_kinv_shifted(Ar, Br, Qr, Rr, rho, sigma, d=None,
                         unroll: bool = False):
    """K^-1 of the (optionally Jacobi-scaled) shifted condensed Hessian.

    Absorbs the solver-side transforms into the LQR data and calls
    `riccati_kinv`:
      - Jacobi equilibration x = D x' (solvers/boxqp.jacobi_scale_boxqp) is
        a per-(t, channel) control rescaling u_t = d_t * u_t', i.e.
        Br_t -> Br_t diag(d_t), Rr_t -> diag(d_t) Rr_t diag(d_t);
      - the ADMM shift (sigma + rho) I_n is blockdiag((sigma + rho) I_du).

    :param rho: scalar resolved penalty (the value the ADMM round runs at).
    :param d: optional (n,) Jacobi weights, time-major; None = unscaled.
    :return: (n, n) exact inverse of  D P D + (sigma + rho) I  (or of
        P + (sigma + rho) I when d is None), P the symmetrized condensed
        Hessian of (Ar, Br, Qr, Rr).
    """
    H, m, du = Br.shape
    shift = (sigma + rho) * jnp.eye(du, dtype=Br.dtype)
    if d is not None:
        dt = d.reshape(H, du)
        Br = Br * dt[:, None, :]
        Rr = Rr * dt[:, :, None] * dt[:, None, :]
    Rr_tot = Rr + shift[None, :, :]
    return riccati_kinv(Ar, Br, Qr, Rr_tot, unroll=unroll)


def riccati_kinv_batch(Ar, Br, Qr, Rr, rho, sigma, d=None,
                       unroll: bool = False):
    """Lane-batched `riccati_kinv_shifted`.

    :param Ar: (B, H, m, m); :param Br: (B, H, m, du) - per-lane dynamics.
    :param Qr: (H+1, m, m); :param Rr: (H, du, du) - shared costs.
    :param rho: (B,) per-lane resolved penalties; :param d: optional (B, n).
    :return: (B, n, n).
    """
    fn = lambda a, b, r, dd: riccati_kinv_shifted(
        a, b, Qr, Rr, r, sigma, d=dd, unroll=unroll)
    if d is None:
        return jax.vmap(lambda a, b, r: fn(a, b, r, None))(Ar, Br, rho)
    return jax.vmap(fn)(Ar, Br, rho, d)
