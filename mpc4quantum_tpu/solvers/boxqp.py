"""Box-constrained QP solver: OSQP-style ADMM, fully on-device.

Solves   min 1/2 x^T P x + q^T x   s.t.  lb <= x <= ub
with P symmetric PSD. This is the entire constraint class the condensed MPC
horizon problem needs (state dynamics are eliminated by condensing; control
saturation and the first-step slew limit are both boxes on U - see
condense.py), so the OSQP generality of a sparse constraint matrix
(reference optimize.py:59 solves via OSQP-in-C through CVXPY) collapses to
the special case A = I:

    x~_{k+1} = (P + (sigma+rho) I)^{-1} (sigma x_k - q + rho z_k - y_k)
    z_{k+1}  = clip(alpha x~ + (1-alpha) z_k + y_k/rho, lb, ub)
    y_{k+1}  = y_k + rho (alpha x~ + (1-alpha) z_k - z_{k+1})

Termination uses OSQP's relative residual criteria; rho is adapted by the
OSQP residual-balancing rule across a small static number of refactorization
rounds (each round = one Cholesky + a bounded `lax.while_loop` of (n,n)
triangular solves, n = H*dim_u <= ~150). Everything batches cleanly under
vmap across scenarios; vs CVXPY re-canonicalizing the whole problem every
IQP iteration (reference mpc.py:189 / optimize.py:18-58) the per-solve cost
is a handful of small dense factorizations.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class BoxQPParams:
    rho0: float = 0.1
    sigma: float = 1e-6
    alpha: float = 1.6
    # termination targets: 1e-6 suffices for 0.999-fidelity control (measured
    # on the NOT-state fleet: identical fidelity to 1e-8 targets at 7x the
    # rollout throughput); tighten for ill-conditioned costs if needed
    eps_abs: float = 1e-6
    eps_rel: float = 1e-6
    max_iter: int = struct.field(pytree_node=False, default=150)
    n_rounds: int = struct.field(pytree_node=False, default=2)
    check_every: int = struct.field(pytree_node=False, default=5)
    # acceptance thresholds for reporting success: the solver *targets*
    # eps_abs/eps_rel but a solve is only declared failed beyond these.
    # 1e-3/1e-3 are OSQP's own defaults - the tolerance the reference
    # effectively ran with via CVXPY (reference optimize.py:59); measured
    # closed-loop fidelities at this acceptance: crosstalk 0.998, CNOT 0.97
    accept_abs: float = 1e-3
    accept_rel: float = 1e-3
    # solve_boxqp_fixed loop form: True = flat python-unrolled iteration
    # chain (the form proven to lower on the axon TPU backend, whose batched
    # lax.scan is unimplemented - CLAUDE.md); False = lax.scan body (same
    # iterates; traces/compiles ~max_iter x faster - use on CPU/standard
    # backends, e.g. budget sweeps at cnot's 3x300)
    unroll: bool = struct.field(pytree_node=False, default=True)
    # Newton-Schulz iteration count for the fixed-iteration solver's
    # K-inverse (solve_boxqp_fixed and the big Pallas kernel's between-round
    # XLA inverse). Each iteration is 2 serial batched matmuls, so this is
    # a first-order term of the latency-bound solve chain. Measured
    # requirement on captured preset QPs (experiments/sweep_ns_iters.py,
    # f32): ||I - K X|| reaches ~1e-6 by 20 iterations on EVERY preset
    # (16 is marginal: worst-case 3.7e-4 flagship / 2e-1 cnot), and the
    # ADMM solution at 20 matches the 30-iteration solve to <= 2.7e-4
    # (median; cnot worst 1.3e-3, inside the 4e-3 acceptance). 30 was
    # 1.5x overbudget everywhere; kept as the conservative default -
    # production presets run 20 via benchfleet.PRESET_STEADY_BUDGET.
    ns_iters: int = struct.field(pytree_node=False, default=30)
    # Newton-Schulz REFRESH budget when a carried inverse warm-starts the
    # K-inverse (solve_boxqp_fixed kinv0 / the big Pallas kernel's kinv
    # carry, enabled by MPCConfig.qp_warm_kinv). A warm start that passes
    # the ns_inverse contraction guard sits at residual r0 < 0.5 and
    # converges quadratically: 8 iterations reach < 1e-6 from the guard
    # boundary with margin. Cold solves (no carried inverse) always run the
    # full ns_iters.
    ns_refresh: int = struct.field(pytree_node=False, default=10)
    # contraction-guard threshold for the carried-inverse warm start: keep
    # the carry while ||I - K X0||_inf < ns_guard, else fall back to the
    # cold init (which at the refresh budget will NOT converge - the solve
    # is then flagged by acceptance). NS converges quadratically from ANY
    # r0 < 1, so a loose guard costs only ~log2 extra iterations: from 0.9
    # the residual reaches 1e-6 in 7 iterations. 0.9 + refresh 10 absorbs
    # the early-trajectory linearization drift that a 0.5 guard rejects.
    ns_guard: float = struct.field(pytree_node=False, default=0.9)
    # K-inverse construction for the fixed-iteration solver: "ns" = the
    # historical cold Newton-Schulz chain (2 * ns_iters serial (n, n)
    # matmuls); "riccati" = the EXACT inverse from one LQR/Riccati
    # factorization of the un-condensed LTV problem (solvers/riccati.py) -
    # O(H m^2 (m + n)) batched small matmuls instead of O(ns_iters n^3),
    # the complexity-class change for large-n condensed QPs (VERDICT r4
    # item 2; the NS chain is the measured dominant rollout cost of the
    # big-kernel presets, experiments/logs/r4_ns_share.log);
    # "riccati_pscan" = the same factorization with both horizon passes as
    # O(log H)-depth associative scans (riccati_kinv_pscan - the sequential
    # form's depth, not its FLOPs, was the measured chip cost,
    # experiments/logs/r5_riccati.log). Requires the caller to supply
    # `lqr_data` (quad_program builds it from the same A_s/B_s/Q_s/R_s that
    # built P); falls back to "ns" when absent. Rounds >= 2 refresh from
    # the round-1 exact inverse via the provably-contracting rho-shift
    # rescale (ns_refresh iterations).
    kinv: str = struct.field(pytree_node=False, default="ns")
    # Newton-Schulz polish iterations applied to the Riccati exact inverse
    # (quadratic cleanup of f32 accumulation over long horizons; exact
    # arithmetic needs 0). 1 iteration squares the residual - measured
    # ~1e-5 -> <1e-9 on captured preset QPs in f32.
    ns_polish: int = struct.field(pytree_node=False, default=1)
    # Jacobi (diagonal) equilibration: solve the QP in x' = x / d with
    # d = diag(P)^-1/2, the cheap core of OSQP's Ruiz scaling (which the
    # reference always ran through CVXPY). The condensed P's diagonal spans
    # orders of magnitude on the larger presets (drag ~170x, cnot more) and
    # ADMM's single rho penalizes every coordinate equally - equilibration
    # cuts iterations-to-tolerance ~1.7x on captured preset QPs
    # (experiments/sweep_ruiz.py). Returned x/y are unscaled; carried
    # (y0, rho0) warm starts are in UNSCALED dual / solver-rho space.
    scale: bool = struct.field(pytree_node=False, default=False)


class BoxQPResult(NamedTuple):
    x: jnp.ndarray  # primal solution (projected: feasible)
    y: jnp.ndarray  # dual of the box constraint
    iters: jnp.ndarray  # total iterations used
    prim_res: jnp.ndarray
    dual_res: jnp.ndarray
    converged: jnp.ndarray  # bool
    rho: jnp.ndarray = None  # final ADMM penalty (for dual warm-starting)
    # final-round K-inverse (solve_boxqp_fixed only; in the solve's own
    # Jacobi-scaled coordinates when params.scale) - the warm start for the
    # next solve's Newton-Schulz refresh (kinv0). None on paths that do not
    # compute it (solve_boxqp's Cholesky path).
    kinv: jnp.ndarray = None


def jacobi_scale_boxqp(P, q, lb, ub, x0=None, y0=None):
    """Jacobi-equilibrate a box QP: substitute x = d * x', d = diag(P)^-1/2.

    Returns (P', q', lb', ub', x0', y0', d) with P' = D P D (unit diagonal),
    q' = d*q, bounds/warm-start mapped into the scaled coordinates
    (lb' = lb/d, x0' = x0/d, dual y' = d*y). Broadcasts over any leading
    batch dims; the SAME elementwise ops run on the XLA and Pallas-wrapper
    paths so scaled problems (and therefore iterates) are bit-identical.
    Unscale a solution with x = d * x', y = y' / d.
    """
    dg = jnp.diagonal(P, axis1=-2, axis2=-1)
    d = 1.0 / jnp.sqrt(jnp.maximum(dg, 1e-12))
    Ps = P * d[..., :, None] * d[..., None, :]
    qs = q * d
    lbs = lb / d
    ubs = ub / d
    x0s = None if x0 is None else x0 / d
    y0s = None if y0 is None else y0 * d
    return Ps, qs, lbs, ubs, x0s, y0s, d


def _residual_stats(P, q, x, z, y, d=None):
    """Inf-norm residual stats (prim, dual, xmax, dmax) of ADMM iterates,
    reported in the ORIGINAL problem's coordinates.

    With `d` from `jacobi_scale_boxqp` (iterates live in the scaled space
    x' = x/d): primal-space quantities multiply by d, dual-space ones divide
    by d - acceptance thresholds then mean the same thing scaled or not (the
    scaled dual residual is inflated by ~max(d)/min(d), which made correct
    solutions read as failures). d=None = unscaled path, weights collapse
    away (bit-identical to the historical unweighted stats).
    """
    inf_norm = lambda v: jnp.max(jnp.abs(v), axis=-1)
    Px = jnp.einsum("...ij,...j->...i", P, x)
    if d is None:
        w = wd = lambda v: v
    else:
        w = lambda v: d * v
        wd = lambda v: v / d
    prim = inf_norm(w(x - z))
    dual = inf_norm(wd(Px + q + y))
    xmax = jnp.maximum(inf_norm(w(x)), inf_norm(w(z)))
    dmax = jnp.maximum(inf_norm(wd(Px)),
                       jnp.maximum(inf_norm(wd(q)), inf_norm(wd(y))))
    return prim, dual, xmax, dmax


def _warm_rho(rho0, default, diag_scale):
    """Resolve the warm-start penalty: rho0 > 0 uses the carried value
    (clipped to the adaptation range), rho0 None/<=0 falls back to the cold
    default. MPC solves a sequence of nearly identical QPs, so carrying the
    rebalanced rho (and the dual y) from the previous solve skips the
    rebalancing rounds a cold start needs - the chain-shortening lever for
    the latency-bound TPU kernels."""
    if rho0 is None:
        return default
    rho0 = jnp.asarray(rho0, default.dtype)
    warm = jnp.clip(rho0, 1e-8 * diag_scale, 1e8 * diag_scale)
    return jnp.where(rho0 > 0, warm, default)


def solve_boxqp(P, q, lb, ub, x0=None, params: BoxQPParams | None = None,
                y0=None, rho0=None) -> BoxQPResult:
    """ADMM solve of the box QP. All args are device arrays; `params` fields
    are data except the static iteration bounds.

    :param P: (n, n) symmetric PSD (real).
    :param q: (n,) linear term.
    :param lb, ub: (n,) bounds (may be +-inf).
    :param x0: optional warm start.
    :param y0: optional (n,) dual warm start (zeros = the cold default).
    :param rho0: optional scalar penalty warm start; values <= 0 (or None)
        fall back to params.rho0 * mean(diag P).
    """
    if params is None:
        params = BoxQPParams()
    n = q.shape[0]
    dtype = q.dtype
    P = 0.5 * (P + P.T)
    d_eq = None
    if params.scale:
        P, q, lb, ub, x0, y0, d_eq = jacobi_scale_boxqp(P, q, lb, ub, x0, y0)
    sigma = jnp.asarray(params.sigma, dtype)
    eye = jnp.eye(n, dtype=dtype)

    # initial rho scaled to the problem's curvature
    diag_scale = jnp.maximum(jnp.mean(jnp.diag(P)), 1e-12)
    rho_init = _warm_rho(rho0, params.rho0 * diag_scale, diag_scale)

    x_init = jnp.clip(jnp.zeros(n, dtype=dtype) if x0 is None else x0, lb, ub)
    y_init = jnp.zeros(n, dtype=dtype) if y0 is None else jnp.asarray(y0, dtype)

    def residuals(x, z, y):
        # residual stats in the ORIGINAL coordinates (d_eq-weighted when the
        # QP was Jacobi-equilibrated); OSQP relative scalings (A = I: Ax = x)
        prim, dual, xmax, dmax = _residual_stats(P, q, x, z, y, d_eq)
        eps_prim = params.eps_abs + params.eps_rel * xmax
        eps_dual = params.eps_abs + params.eps_rel * dmax
        return prim, dual, eps_prim, eps_dual, xmax, dmax

    def run_round(carry, _):
        x, z, y, rho, it_total, converged = carry

        K = P + (sigma + rho) * eye
        L = jnp.linalg.cholesky(K)
        solve = lambda rhs: jax.scipy.linalg.cho_solve((L, True), rhs)

        def cond(s):
            x, z, y, it, done = s
            return jnp.logical_and(~done, it < params.max_iter)

        def body(s):
            x, z, y, it, _ = s
            x_t = solve(sigma * x - q + rho * z - y)
            z_arg = params.alpha * x_t + (1 - params.alpha) * z
            z_new = jnp.clip(z_arg + y / rho, lb, ub)
            y_new = y + rho * (z_arg - z_new)
            it = it + 1
            prim, dual, ep, ed, _, _ = residuals(x_t, z_new, y_new)
            done = jnp.logical_and(
                it % params.check_every == 0,
                jnp.logical_and(prim <= ep, dual <= ed),
            )
            return x_t, z_new, y_new, it, done

        x, z, y, it_round, done_round = jax.lax.while_loop(
            cond, body, (x, z, y, jnp.asarray(0), converged)
        )
        prim, dual, ep, ed, xmax, dmax = residuals(x, z, y)
        converged = jnp.logical_and(prim <= ep, dual <= ed)

        # OSQP rho adaptation: balance relative primal/dual residuals
        prim_scaled = prim / jnp.maximum(xmax, 1e-12)
        dual_scaled = dual / jnp.maximum(dmax, 1e-12)
        ratio = jnp.sqrt(prim_scaled / jnp.maximum(dual_scaled, 1e-16))
        rho_new = jnp.clip(rho * ratio, 1e-8 * diag_scale, 1e8 * diag_scale)
        rho = jnp.where(converged, rho, rho_new)
        return (x, z, y, rho, it_total + it_round, converged), None

    carry0 = (x_init, x_init, y_init, jnp.asarray(rho_init, dtype), jnp.asarray(0), jnp.asarray(False))
    (x, z, y, rho, iters, converged), _ = jax.lax.scan(run_round, carry0, None, length=params.n_rounds)

    prim, dual, ep, ed, xmax, dmax = residuals(x, z, y)
    acc_p = params.accept_abs + params.accept_rel * xmax
    acc_d = params.accept_abs + params.accept_rel * dmax
    # acceptance alone defines declared success: accept_abs/accept_rel may be
    # set tighter than the solve targets and still take effect (the solver
    # just won't iterate past its eps targets to reach them)
    converged = jnp.logical_and(prim <= jnp.maximum(ep, acc_p),
                                dual <= jnp.maximum(ed, acc_d))
    if d_eq is not None:
        z, y = d_eq * z, y / d_eq
    # Return the projected iterate: always box-feasible.
    return BoxQPResult(x=z, y=y, iters=iters, prim_res=prim, dual_res=dual,
                       converged=converged, rho=rho)


# ---------------------------------------------------------------------------
# Matmul-only fixed-iteration variant (the TPU-batched hot path)
# ---------------------------------------------------------------------------


def ns_inverse(K, iters: int = 30, X0=None, guard: float = 0.5):
    """Inverse of an SPD matrix by Newton-Schulz iteration - matmuls only.

    X_{j+1} = X_j (2I - K X_j), X_0 = K / (||K||_1 ||K||_inf). The init
    guarantees ||I - K X_0|| < 1 for SPD K, so convergence is quadratic;
    `iters` ~ log2(cond(K)) + ~6 reaches machine precision. Batches over
    leading dims as pure MXU matmul chains - no triangular solves, which is
    both the fast TPU form for huge tiny-matrix batches and the only form
    some TPU backend paths can lower when batched.

    :param X0: optional warm start - the inverse of a NEARBY matrix (e.g.
        the previous MPC solve's K, which differs only by the linearization
        drift). Each batch element keeps X0 only when it certifies
        contraction (||I - K X0||_inf < guard, one extra batched matmul);
        otherwise it falls back to the cold init. A warm start that passes
        the guard converges quadratically from r0 < guard, so ~5-8
        iterations reach 1e-6 where the cold init needs ~20 - the point of
        carrying inverses across an MPC solve chain. NOTE: a guard FALLBACK
        at a refresh-sized `iters` produces a non-converged inverse; callers
        must treat the downstream solve's acceptance flag as the safety net
        (mpc/hostloop.py does - failed lanes freeze and are reported).
    """
    K = jnp.asarray(K)
    d = K.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(d, dtype=K.dtype), K.shape)
    n1 = jnp.max(jnp.sum(jnp.abs(K), axis=-2), axis=-1)
    ninf = jnp.max(jnp.sum(jnp.abs(K), axis=-1), axis=-1)
    X = jnp.swapaxes(K, -1, -2) / (n1 * ninf)[..., None, None]
    if X0 is not None:
        X0 = jnp.asarray(X0, K.dtype)
        # induced inf-norm of the residual: max row abs-sum of I - K X0
        r0 = jnp.max(jnp.sum(jnp.abs(eye - K @ X0), axis=-1), axis=-1)
        X = jnp.where((r0 < guard)[..., None, None], X0, X)
    for _ in range(iters):
        X = X @ (2.0 * eye - K @ X)
    return X


def solve_boxqp_fixed(P, q, lb, ub, x0=None, params: BoxQPParams | None = None,
                      unroll: bool | None = None, ns_iters: int | None = None,
                      y0=None, rho0=None, kinv0=None,
                      lqr_data=None) -> BoxQPResult:
    """ADMM box-QP with a FIXED iteration schedule and a Newton-Schulz
    inverse in place of the Cholesky factorization.

    Identical math to `solve_boxqp` (same OSQP-style updates, rho adaptation
    at round boundaries, acceptance criteria) but with every data-dependent
    loop removed: `n_rounds` rounds of exactly `max_iter` iterations each,
    unrolled (or scanned with static length when unroll=False). The entire
    solve is a flat chain of batched matmuls/elementwise ops - vmap over
    thousands of scenario lanes maps onto the MXU with no divergent control
    flow and no factorization lowerings.

    Use `params.max_iter` to budget iterations (fixed cost per solve).

    :param kinv0: optional (n, n) K-inverse carried from the PREVIOUS solve
        of an MPC step chain (in THIS solve's scaled coordinates semantics:
        pass the previous result's `.kinv` unchanged - consecutive solves'
        Jacobi scalings drift together and the contraction guard absorbs the
        mismatch). When given, every round's Newton-Schulz runs only
        `params.ns_refresh` iterations from a warm start: round 1 from
        kinv0, later rounds from the previous round's inverse rescaled by
        the provably-contracting rho-shift factor (sigma+rho_old)/
        (sigma+rho_new) when rho adapted (K differs by a pure multiple of I
        within a solve, so eigenvalues of K_new X0 then lie in (0, 1]).
        None = cold full-ns_iters inverses (the historical program,
        bit-identical).
    :param lqr_data: optional (Ar (H, m, m), Br (H, m, du), Qr (H+1, m, m),
        Rr (H, du, du)) real-embedded LTV problem whose condensed Hessian is
        this P (solvers/riccati.embed_ltv / embed_costs). With
        params.kinv == "riccati" the round-1 K-inverse is computed EXACTLY
        by the Riccati factorization (+ params.ns_polish NS cleanup
        iterations) instead of the cold Newton-Schulz chain; later rounds
        refresh via the rho-shift rescale. Takes precedence over kinv0.
    """
    if params is None:
        params = BoxQPParams()
    if unroll is None:
        unroll = params.unroll
    if ns_iters is None:
        ns_iters = params.ns_iters
    n = q.shape[0]
    dtype = q.dtype
    P = 0.5 * (P + P.T)
    d_eq = None
    if params.scale:
        P, q, lb, ub, x0, y0, d_eq = jacobi_scale_boxqp(P, q, lb, ub, x0, y0)
    sigma = jnp.asarray(params.sigma, dtype)
    eye = jnp.eye(n, dtype=dtype)

    diag_scale = jnp.maximum(jnp.mean(jnp.diag(P)), 1e-12)
    rho_init = _warm_rho(rho0, params.rho0 * diag_scale, diag_scale)
    x = jnp.clip(jnp.zeros(n, dtype=dtype) if x0 is None else x0, lb, ub)
    z = x
    y = jnp.zeros(n, dtype=dtype) if y0 is None else jnp.asarray(y0, dtype)
    rho = jnp.asarray(rho_init, dtype)

    def residuals(x, z, y):
        # stats in the ORIGINAL coordinates (d_eq-weighted when equilibrated)
        prim, dual, xmax, dmax = _residual_stats(P, q, x, z, y, d_eq)
        eps_prim = params.eps_abs + params.eps_rel * xmax
        eps_dual = params.eps_abs + params.eps_rel * dmax
        return prim, dual, eps_prim, eps_dual, xmax, dmax

    use_riccati = (lqr_data is not None
                   and params.kinv in ("riccati", "riccati_pscan"))
    use_gj = params.kinv == "gj"
    if use_riccati or use_gj:
        kinv0 = None  # exact inverses: the cross-solve carry is moot
    kinv_prev = None if kinv0 is None else jnp.asarray(kinv0, dtype)
    rho_prev = None
    ric_prev = ric_rho = None
    for _round in range(params.n_rounds):
        K = P + (sigma + rho) * eye
        if use_gj:
            # exact inverse by matrix-form unpivoted Gauss-Jordan: O(n)
            # whole-tensor ops per round instead of the 2*ns_iters-matmul
            # NS chain (the measured fixed cost of the small-kernel
            # presets, experiments/logs/r5_roofline.log)
            from ..utils.linalg import gj_inverse

            Kinv = gj_inverse(K)
        elif use_riccati and _round == 0:
            from .riccati import riccati_kinv_shifted

            Ar, Br, Qr, Rr = (jnp.asarray(a, dtype) for a in lqr_data)
            Kinv = riccati_kinv_shifted(Ar, Br, Qr, Rr, rho, sigma,
                                        d=d_eq, unroll=unroll,
                                        pscan=params.kinv == "riccati_pscan")
            for _ in range(params.ns_polish):
                Kinv = Kinv @ (2.0 * eye - K @ Kinv)
            ric_prev, ric_rho = Kinv, rho
        elif use_riccati:
            # rounds >= 2: K differs from round 1's by (rho - rho_1) I -
            # refresh from the rescaled exact inverse (same provably-
            # contracting form as the intra-solve kinv0 path below)
            c = jnp.minimum(1.0, (sigma + ric_rho) / (sigma + rho))
            Kinv = ns_inverse(K, iters=params.ns_refresh,
                              X0=c * ric_prev, guard=jnp.inf)
            ric_prev, ric_rho = Kinv, rho
        elif kinv_prev is None:
            Kinv = ns_inverse(K, iters=ns_iters)
        elif rho_prev is None:
            # cross-solve warm start: K drifted by the linearization delta -
            # contraction-guarded, cold fallback (flagged via acceptance)
            Kinv = ns_inverse(K, iters=params.ns_refresh, X0=kinv_prev,
                              guard=params.ns_guard)
        else:
            # intra-solve rounds: same P, K differs by (rho - rho_prev) I.
            # Rescaling by (sigma+rho_prev)/(sigma+rho) puts the eigenvalues
            # of K X0 in (0, 1] WHEN kinv_prev converged (rho frozen on
            # acceptance makes this a no-op on healthy lanes) - and a huge
            # rho jump legitimately sits at r0 = drho/(sigma+rho_new)
            # arbitrarily close to 1, so NO finite guard separates it from
            # the partial-previous-inverse failure mode here. Trust the
            # rescale (a partial refresh is ADMM-tolerable and acceptance
            # flags the rest); the cross-solve entry is where the guard
            # earns its keep.
            c = jnp.minimum(1.0, (sigma + rho_prev) / (sigma + rho))
            Kinv = ns_inverse(K, iters=params.ns_refresh,
                              X0=c * kinv_prev, guard=jnp.inf)
        if kinv0 is not None:
            kinv_prev, rho_prev = Kinv, rho

        def body(carry, _):
            x, z, y = carry
            x_t = Kinv @ (sigma * x - q + rho * z - y)
            z_arg = params.alpha * x_t + (1 - params.alpha) * z
            z_new = jnp.clip(z_arg + y / rho, lb, ub)
            y_new = y + rho * (z_arg - z_new)
            return (x_t, z_new, y_new), None

        if unroll:
            carry = (x, z, y)
            for _ in range(params.max_iter):
                carry, _ = body(carry, None)
            x, z, y = carry
        else:
            (x, z, y), _ = jax.lax.scan(body, (x, z, y), None, length=params.max_iter)

        # rho adaptation (OSQP residual balancing), FROZEN once the iterates
        # pass the acceptance rule: rebalancing on already-converged
        # residuals is a noise-driven multiplicative random walk that drives
        # rho out of the stable band - measured failure mode of dual/rho
        # warm-starting across an MPC step sequence. A healthy solve carries
        # its working rho forward unchanged; a struggling one adapts - after
        # the final round too, so a failed solve hands the next one an
        # adapted value.
        prim, dual, ep, ed, xmax, dmax = residuals(x, z, y)
        acc_p = params.accept_abs + params.accept_rel * xmax
        acc_d = params.accept_abs + params.accept_rel * dmax
        accepted = jnp.logical_and(prim <= jnp.maximum(ep, acc_p),
                                   dual <= jnp.maximum(ed, acc_d))
        prim_scaled = prim / jnp.maximum(xmax, 1e-12)
        dual_scaled = dual / jnp.maximum(dmax, 1e-12)
        ratio = jnp.sqrt(prim_scaled / jnp.maximum(dual_scaled, 1e-16))
        rho = jnp.where(accepted, rho,
                        jnp.clip(rho * ratio, 1e-8 * diag_scale, 1e8 * diag_scale))

    prim, dual, ep, ed, xmax, dmax = residuals(x, z, y)
    acc_p = params.accept_abs + params.accept_rel * xmax
    acc_d = params.accept_abs + params.accept_rel * dmax
    converged = jnp.logical_and(prim <= jnp.maximum(ep, acc_p),
                                dual <= jnp.maximum(ed, acc_d))
    if d_eq is not None:
        z, y = d_eq * z, y / d_eq
    iters = jnp.asarray(params.n_rounds * params.max_iter)
    # Kinv returned in the solve's own scaled coordinates - the next solve's
    # kinv0 (its scaling drifts with diag(P); the guard absorbs the delta)
    return BoxQPResult(x=z, y=y, iters=iters, prim_res=prim, dual_res=dual,
                       converged=converged, rho=rho, kinv=Kinv)
