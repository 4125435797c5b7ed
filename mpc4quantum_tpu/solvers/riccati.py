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


def _inv_gj(M):
    """Unpivoted Gauss-Jordan inverse of a general (.., m, m) matrix in
    MATRIX form: m serial column-elimination steps of whole-matrix
    elementwise ops (static one-hot masks, no scatter, no factorization
    primitive - batches on any TPU backend path, and the trace stays
    O(m) ops instead of `_inv_small`'s O(m^3) scalar decomposition).

    Used for the parallel combine's (I + C1 J2) factor, whose spectrum
    lies in [1, inf) (product of PSD matrices has non-negative real
    eigenvalues), so the unpivoted elimination is well-conditioned on the
    QP data.
    """
    from ..utils.linalg import gj_inverse

    return gj_inverse(M)


def riccati_kinv_pscan(Ar, Br, Qr, Rr):
    """`riccati_kinv` with BOTH horizon passes as associative scans.

    The sequential recursion is a depth-H chain of tiny matmuls - the
    measured chip cost of the factorization is its DEPTH, not its FLOPs
    (experiments/logs/r5_riccati.log: exact serial Riccati is 0.89-0.93x
    the NS chain at rollout level on every big-kernel preset). This form
    cuts the chain to O(log H) levels of (H-batched) small matmuls, the
    temporal-parallelization-of-LQT construction (Sarkka &
    Garcia-Fernandez's associative-scan smoothers, applied to the same
    conditional-value-function elements):

      element e_k  ~  V_k(x, z) = (z - A x - b)^T C^+ (z - A x - b)
                                   + x^T J x - 2 eta^T x
      init    A=A_k, b=B_k R_k^-1 W_k, C=B_k R_k^-1 B_k^T, J=Q_k, eta=0
      combine (suffix scan, e1 earlier):
        D  = (I + C1 J2)^-1
        A  = A2 D A1                 b = A2 D (b1 + C1 eta2) + b2
        C  = A2 D C1 A2^T + C2     eta = A1^T D^T (eta2 - J2 b1) + eta1
        J  = A1^T D^T J2 A1 + J1

    The suffix element at k+1 gives the value function (J, eta) ahead of
    step k, from which the feedback (F_k, f_k) follows pointwise; the
    forward rollout of x_{k+1} = (A_k + B_k F_k) x_k + B_k f_k is a second
    associative scan over affine maps. All combines are (H,)-batched
    (m, m)/(m, n) matmuls; the only inverses are the du-sized Huu and the
    m-sized D (unpivoted Gauss-Jordan, elementwise - no LU/Cholesky
    primitive, so it batches on the axon backend).

    Same contract as `riccati_kinv` (Rr includes every diagonal shift);
    bit-comparable to ~f32 rounding, exact at x64.
    """
    H, m, du = Br.shape
    n = H * du
    dtype = Ar.dtype
    eye_n = jnp.eye(n, dtype=dtype)
    W = eye_n.reshape(H, du, n)
    T = lambda M: jnp.swapaxes(M, -1, -2)

    Rinv = _inv_small(Rr)                    # (H, du, du)
    BRi = Br @ Rinv                          # (H, m, du)
    zeros_mn = jnp.zeros((1, m, n), dtype)
    A_e = jnp.concatenate([Ar, jnp.zeros((1, m, m), dtype)], axis=0)
    b_e = jnp.concatenate([BRi @ W, zeros_mn], axis=0)
    C_e = jnp.concatenate([BRi @ T(Br), jnp.zeros((1, m, m), dtype)], axis=0)
    eta_e = jnp.concatenate([jnp.zeros((H, m, n), dtype), zeros_mn], axis=0)
    J_e = Qr  # (H+1, m, m), terminal at H

    eye_m = jnp.eye(m, dtype=dtype)

    def combine(e1, e2):
        # e1 precedes e2 in time; element order (A, b, C, eta, J)
        A1, b1, C1, h1, J1 = e1
        A2, b2, C2, h2, J2 = e2
        D = _inv_gj(eye_m + C1 @ J2)
        Dt = T(D)  # inv(I + J2 C1): C1/J2 symmetric
        A2D = A2 @ D
        A1tDt = T(A1) @ Dt
        A = A2D @ A1
        b = A2D @ (b1 + C1 @ h2) + b2
        C = A2D @ (C1 @ T(A2)) + C2
        eta = A1tDt @ (h2 - J2 @ b1) + h1
        J = A1tDt @ (J2 @ A1) + J1
        return (A, b, 0.5 * (C + T(C)), eta, 0.5 * (J + T(J)))

    # suffix scan S_k = e_k (x) ... (x) e_H. reverse=True flips the array,
    # scans, and flips back - the operator therefore receives its operands
    # LATER-first (measured: affine-composition probe), so swap into
    # combine's (earlier, later) time order.
    elems = (A_e, b_e, C_e, eta_e, J_e)
    S = jax.lax.associative_scan(lambda a, b: combine(b, a), elems,
                                 reverse=True, axis=0)
    hs, Js = S[3][1:], S[4][1:]              # value fn ahead of step k

    BtJ = T(Br) @ Js                          # (H, du, m)
    Huu = Rr + BtJ @ Br
    Hinv = _inv_small(Huu)
    F = -(Hinv @ (BtJ @ Ar))                  # (H, du, m)
    f = Hinv @ (W + T(Br) @ hs)               # (H, du, n)

    # forward: x_{k+1} = M_k x_k + d_k, x_0 = 0 - prefix affine scan
    M = Ar + Br @ F
    dvec = Br @ f

    def acomp(c1, c2):
        M1, d1 = c1
        M2, d2 = c2
        return (M2 @ M1, M2 @ d1 + d2)

    Mp, dp = jax.lax.associative_scan(acomp, (M, dvec), axis=0)
    xs = jnp.concatenate([jnp.zeros((1, m, n), dtype), dp[:-1]], axis=0)
    U = F @ xs + f                            # (H, du, n)
    Kinv = U.reshape(n, n)
    return 0.5 * (Kinv + Kinv.T)


def riccati_kinv_shifted(Ar, Br, Qr, Rr, rho, sigma, d=None,
                         unroll: bool = False, pscan: bool = False):
    """K^-1 of the (optionally Jacobi-scaled) shifted condensed Hessian.

    Absorbs the solver-side transforms into the LQR data and calls
    `riccati_kinv`:
      - Jacobi equilibration x = D x' (solvers/boxqp.jacobi_scale_boxqp) is
        a per-(t, channel) control rescaling u_t = d_t * u_t', i.e.
        Br_t -> Br_t diag(d_t), Rr_t -> diag(d_t) Rr_t diag(d_t);
      - the ADMM shift (sigma + rho) I_n is blockdiag((sigma + rho) I_du).

    :param rho: scalar resolved penalty (the value the ADMM round runs at).
    :param d: optional (n,) Jacobi weights, time-major; None = unscaled.
    :param pscan: use the O(log H)-depth associative-scan form
        (`riccati_kinv_pscan`) instead of the depth-H sequential recursion.
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
    if pscan:
        return riccati_kinv_pscan(Ar, Br, Qr, Rr_tot)
    return riccati_kinv(Ar, Br, Qr, Rr_tot, unroll=unroll)


def riccati_kinv_batch(Ar, Br, Qr, Rr, rho, sigma, d=None,
                       unroll: bool = False, pscan: bool = False):
    """Lane-batched `riccati_kinv_shifted`.

    :param Ar: (B, H, m, m); :param Br: (B, H, m, du) - per-lane dynamics.
    :param Qr: (H+1, m, m); :param Rr: (H, du, du) - shared costs.
    :param rho: (B,) per-lane resolved penalties; :param d: optional (B, n).
    :return: (B, n, n).
    """
    fn = lambda a, b, r, dd: riccati_kinv_shifted(
        a, b, Qr, Rr, r, sigma, d=dd, unroll=unroll, pscan=pscan)
    if d is None:
        return jax.vmap(lambda a, b, r: fn(a, b, r, None))(Ar, Br, rho)
    return jax.vmap(fn)(Ar, Br, rho, d)
