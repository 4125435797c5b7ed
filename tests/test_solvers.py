"""QP solver oracles: scipy L-BFGS-B as the independent box-QP reference,
exact-rollout and KKT checks for the condensed horizon QP, and LQR/QP
cross-validation in the unconstrained regime."""

import numpy as np
import scipy.optimize
import jax
import jax.numpy as jnp

from mpc4quantum_tpu.ops.liouville import liouville_generator, discretize_homogeneous
from mpc4quantum_tpu.ops.bilinear import BilinearModel, model_along_traj
from mpc4quantum_tpu.solvers.boxqp import BoxQPParams, solve_boxqp
from mpc4quantum_tpu.solvers.condense import condense_horizon, quad_program, objective_value
from mpc4quantum_tpu.solvers.lqr import lqr_quad_program

SX = np.array([[0, 1], [1, 0]], dtype=complex)
SZ = np.array([[1, 0], [0, -1]], dtype=complex)


def random_boxqp(n, seed, active_frac=0.5):
    rng = np.random.default_rng(seed)
    G = rng.normal(size=(n, n))
    P = G @ G.T + 0.1 * np.eye(n)
    q = rng.normal(size=n) * 3
    lb = -np.abs(rng.normal(size=n)) * active_frac
    ub = np.abs(rng.normal(size=n)) * active_frac
    return P, q, lb, ub


def scipy_boxqp(P, q, lb, ub):
    fun = lambda x: 0.5 * x @ P @ x + q @ x
    jac = lambda x: P @ x + q
    res = scipy.optimize.minimize(
        fun, np.clip(np.zeros_like(q), lb, ub), jac=jac, method="L-BFGS-B",
        bounds=list(zip(lb, ub)), options={"ftol": 1e-15, "gtol": 1e-12, "maxiter": 5000},
    )
    return res.x, res.fun


def test_boxqp_matches_scipy():
    for seed in range(5):
        P, q, lb, ub = random_boxqp(12, seed)
        res = solve_boxqp(jnp.asarray(P), jnp.asarray(q), jnp.asarray(lb), jnp.asarray(ub))
        x_ref, f_ref = scipy_boxqp(P, q, lb, ub)
        x = np.asarray(res.x)
        f = 0.5 * x @ P @ x + q @ x
        assert bool(res.converged), f"ADMM failed to converge (seed={seed})"
        assert f <= f_ref + 1e-6 * (1 + abs(f_ref))
        np.testing.assert_allclose(x, x_ref, atol=1e-4)


def test_boxqp_unconstrained_matches_linear_solve():
    P, q, _, _ = random_boxqp(10, 42)
    inf = np.full(10, np.inf)
    # default (fast) targets give control-grade accuracy
    res = solve_boxqp(jnp.asarray(P), jnp.asarray(q), jnp.asarray(-inf), jnp.asarray(inf))
    np.testing.assert_allclose(np.asarray(res.x), np.linalg.solve(P, -q), atol=1e-3)
    # tight targets recover high accuracy on demand
    tight = BoxQPParams(eps_abs=1e-9, eps_rel=1e-9, max_iter=400, n_rounds=4)
    res = solve_boxqp(jnp.asarray(P), jnp.asarray(q), jnp.asarray(-inf), jnp.asarray(inf), params=tight)
    np.testing.assert_allclose(np.asarray(res.x), np.linalg.solve(P, -q), atol=1e-5)


def test_boxqp_jacobi_scaled_matches_scipy():
    """BoxQPParams(scale=True) Jacobi-equilibrates the QP (the core of
    OSQP's Ruiz scaling, which the reference always ran - optimize.py:59)
    and must return the SAME unscaled solution/dual, with acceptance judged
    on raw-space residuals (scaled-space residuals are inflated by the diag
    spread and declared correct solutions failed - measured on crosstalk's
    diag-spread-5e5 QPs, experiments/sweep_ruiz.py)."""
    rng = np.random.default_rng(3)
    for seed in range(3):
        P, q, lb, ub = random_boxqp(12, seed)
        d = np.exp(rng.normal(scale=2.5, size=12))  # diag spread ~ 1e4
        P = P * np.outer(d, d)
        q = q * d
        res = solve_boxqp(jnp.asarray(P), jnp.asarray(q), jnp.asarray(lb),
                          jnp.asarray(ub),
                          params=BoxQPParams(scale=True, max_iter=400,
                                             n_rounds=4))
        x_ref, f_ref = scipy_boxqp(P, q, lb, ub)
        x = np.asarray(res.x)
        f = 0.5 * x @ P @ x + q @ x
        assert bool(res.converged), f"scaled ADMM not accepted (seed={seed})"
        assert f <= f_ref + 1e-6 * (1 + abs(f_ref))
        np.testing.assert_allclose(x, x_ref, atol=2e-4)
        # KKT stationarity of the returned (x, y) pair in RAW coordinates:
        # the dual must come back unscaled
        y = np.asarray(res.y)
        g = P @ x + q + y
        assert np.max(np.abs(g)) < 1e-2 * max(1.0, np.max(np.abs(q)))


def test_boxqp_feasibility():
    P, q, lb, ub = random_boxqp(8, 7, active_frac=0.05)  # tight box: many active
    res = solve_boxqp(jnp.asarray(P), jnp.asarray(q), jnp.asarray(lb), jnp.asarray(ub))
    x = np.asarray(res.x)
    assert np.all(x >= lb - 1e-9) and np.all(x <= ub + 1e-9)


def make_horizon_problem(H=8, order=1, dt=0.5, seed=0):
    rng = np.random.default_rng(seed)
    A0 = np.asarray(liouville_generator(0.05 * SZ))
    A1 = np.asarray(liouville_generator(0.5 * SX))
    A_dst = np.asarray(discretize_homogeneous([A0, A1], dt, order))
    model = BilinearModel.from_stacked(jnp.asarray(A_dst[:, :4]), jnp.asarray(A_dst[:, 4:]), 1, order)

    x0 = np.zeros(4, dtype=complex)
    x0[0] = 1.0
    X_guess = jnp.asarray(np.tile(x0[:, None], (1, H)))
    U_guess = jnp.asarray(np.zeros((1, H)))
    A_s, B_s, D_s = model_along_traj(model, X_guess, U_guess)

    target = np.zeros(4, dtype=complex)
    target[3] = 1.0
    X_bm = jnp.asarray(np.tile(target[:, None], (1, H + 1)))
    U_bm = jnp.zeros((1, H))
    Q = np.diag([1.0, 0, 0, 1.0]).astype(complex)
    Qf = Q * 1.0
    R = np.eye(1) * 1e-2
    Q_s = jnp.asarray(np.stack([Q] * H + [Qf]))
    R_s = jnp.asarray(np.stack([R] * H))
    return model, x0, X_bm, U_bm, Q_s, R_s, A_s, B_s, D_s


def test_condense_matches_explicit_rollout():
    _, x0, _, _, _, _, A_s, B_s, D_s = make_horizon_problem()
    H = A_s.shape[0]
    w, M = condense_horizon(A_s, B_s, D_s, jnp.asarray(x0))
    rng = np.random.default_rng(1)
    U = rng.normal(size=(1, H))
    x = x0.copy()
    for t in range(H):
        x_pred = np.asarray(D_s[t] + A_s[t] @ x + B_s[t] @ U[:, t].astype(complex))
        x_cond = np.asarray(w[t + 1] + np.einsum("xhd,hd->x", np.asarray(M[t + 1]), U.T))
        np.testing.assert_allclose(x_cond, x_pred, atol=1e-10)
        x = x_pred


def test_quad_program_matches_scipy_oracle():
    _, x0, X_bm, U_bm, Q_s, R_s, A_s, B_s, D_s = make_horizon_problem()
    H = A_s.shape[0]
    sat = 2 * np.pi * 0.1
    du = 0.5 * sat
    u_prev = jnp.zeros(1)
    res = quad_program(jnp.asarray(x0), X_bm, U_bm, Q_s, R_s, A_s, B_s, D_s,
                       u_prev=u_prev, sat=sat, du=du)
    assert bool(res.converged)

    # oracle: same condensed cost minimized by L-BFGS-B over the same box
    w, M = condense_horizon(A_s, B_s, D_s, jnp.asarray(x0))
    wn, Mn = np.asarray(w), np.asarray(M).reshape(H + 1, 4, H)
    Qn = np.asarray(Q_s)
    e = wn - np.asarray(X_bm).T

    def cost(Uvec):
        x = wn + np.einsum("txn,n->tx", Mn, Uvec)
        ex = x - np.asarray(X_bm).T
        jx = np.real(np.einsum("tx,txy,ty->", ex.conj(), Qn, ex))
        ju = np.sum(np.asarray(R_s)[:, 0, 0].real * Uvec**2)
        return jx + ju

    lb = np.full(H, -sat)
    ub = np.full(H, sat)
    lb[0], ub[0] = max(-sat, -du), min(sat, du)
    ores = scipy.optimize.minimize(cost, np.zeros(H), method="L-BFGS-B",
                                   bounds=list(zip(lb, ub)), options={"ftol": 1e-15, "maxiter": 5000})
    np.testing.assert_allclose(np.asarray(res.U)[0], ores.x, atol=2e-4)
    assert float(res.obj) <= ores.fun + 1e-5 * (1 + abs(ores.fun))


def test_quad_program_respects_slew_and_saturation():
    _, x0, X_bm, U_bm, Q_s, R_s, A_s, B_s, D_s = make_horizon_problem()
    sat = 0.05
    du = 0.01
    u_prev = jnp.asarray(np.array([0.02]))
    res = quad_program(jnp.asarray(x0), X_bm, U_bm, Q_s, R_s, A_s, B_s, D_s,
                       u_prev=u_prev, sat=sat, du=du)
    U = np.asarray(res.U)
    assert np.all(np.abs(U) <= sat + 1e-9)
    assert abs(U[0, 0] - 0.02) <= du + 1e-9
    # slew applies to the FIRST step only (reference optimize.py:29-30)
    assert U.shape[1] > 1


def test_quad_program_dynamics_exact():
    _, x0, X_bm, U_bm, Q_s, R_s, A_s, B_s, D_s = make_horizon_problem()
    res = quad_program(jnp.asarray(x0), X_bm, U_bm, Q_s, R_s, A_s, B_s, D_s,
                       sat=1.0)
    X, U = np.asarray(res.X), np.asarray(res.U)
    np.testing.assert_allclose(X[:, 0], x0, atol=1e-12)
    for t in range(U.shape[1]):
        pred = np.asarray(D_s[t]) + np.asarray(A_s[t]) @ X[:, t] + np.asarray(B_s[t]) @ U[:, t].astype(complex)
        np.testing.assert_allclose(X[:, t + 1], pred, atol=1e-8)


def test_lqr_matches_qp_when_unconstrained():
    _, x0, X_bm, U_bm, Q_s, R_s, A_s, B_s, D_s = make_horizon_problem()
    # LQR handles Delta=0 problems (its augmentation assumes pure linearized
    # dynamics); our horizon problem has Delta ~ 0 at order 1 from x0 guess.
    np.testing.assert_allclose(np.asarray(D_s), 0, atol=1e-9)
    qp = quad_program(jnp.asarray(x0), X_bm, U_bm, Q_s, R_s, A_s, B_s, D_s, sat=1e6)
    lqr = lqr_quad_program(jnp.asarray(x0), X_bm, U_bm, Q_s, R_s, A_s, B_s, sat=1e6)
    np.testing.assert_allclose(np.asarray(lqr.U), np.asarray(qp.U), atol=1e-3)


def test_objective_value_consistency():
    _, x0, X_bm, U_bm, Q_s, R_s, A_s, B_s, D_s = make_horizon_problem()
    res = quad_program(jnp.asarray(x0), X_bm, U_bm, Q_s, R_s, A_s, B_s, D_s, sat=1.0)
    obj2 = objective_value(res.X, res.U, X_bm, U_bm, Q_s, R_s)
    np.testing.assert_allclose(float(res.obj), float(obj2), rtol=1e-12)


# ---------------------------------------------------------------------------
# Matmul-only fixed-iteration path (the TPU-batched hot path)
# ---------------------------------------------------------------------------


def test_ns_inverse_matches_linalg_inv():
    from mpc4quantum_tpu.solvers.boxqp import ns_inverse

    rng = np.random.default_rng(0)
    for n, iters in [(4, 30), (10, 30), (30, 35)]:
        A = rng.normal(size=(n, n))
        K = A @ A.T + 0.1 * np.eye(n)  # SPD
        X = np.asarray(ns_inverse(jnp.asarray(K), iters=iters))
        np.testing.assert_allclose(X, np.linalg.inv(K), atol=1e-8)
    # batched over leading dims
    Ks = np.stack([rng.normal(size=(6, 6)) for _ in range(5)])
    Ks = np.einsum("bij,bkj->bik", Ks, Ks) + 0.1 * np.eye(6)
    Xs = np.asarray(ns_inverse(jnp.asarray(Ks), iters=30))
    for b in range(5):
        np.testing.assert_allclose(Xs[b], np.linalg.inv(Ks[b]), atol=1e-8)


def test_boxqp_fixed_matches_adaptive():
    """solve_boxqp_fixed (Newton-Schulz, fixed iterations, no loops) reaches
    the same optimum as the adaptive Cholesky ADMM."""
    from mpc4quantum_tpu.solvers.boxqp import solve_boxqp_fixed

    rng = np.random.default_rng(5)
    n = 12
    A = rng.normal(size=(n, n))
    P = A @ A.T + 0.5 * np.eye(n)
    q = rng.normal(size=n)
    lb, ub = -0.4 * np.ones(n), 0.4 * np.ones(n)
    res_a = solve_boxqp(jnp.asarray(P), jnp.asarray(q), jnp.asarray(lb), jnp.asarray(ub))
    res_f = solve_boxqp_fixed(jnp.asarray(P), jnp.asarray(q), jnp.asarray(lb), jnp.asarray(ub))
    assert bool(res_f.converged)
    np.testing.assert_allclose(np.asarray(res_f.x), np.asarray(res_a.x), atol=1e-5)
    # scanned (non-unrolled) form is identical
    res_s = solve_boxqp_fixed(jnp.asarray(P), jnp.asarray(q), jnp.asarray(lb), jnp.asarray(ub),
                              unroll=False)
    np.testing.assert_allclose(np.asarray(res_s.x), np.asarray(res_f.x), atol=1e-12)


def test_quad_program_ns_backend_matches_chol():
    _, x0, X_bm, U_bm, Q_s, R_s, A_s, B_s, D_s = make_horizon_problem()
    sat = 2 * np.pi * 0.1
    du = 0.5 * sat
    u_prev = jnp.zeros(1)
    res_c = quad_program(jnp.asarray(x0), X_bm, U_bm, Q_s, R_s, A_s, B_s, D_s,
                         u_prev=u_prev, sat=sat, du=du)
    res_n = quad_program(jnp.asarray(x0), X_bm, U_bm, Q_s, R_s, A_s, B_s, D_s,
                         u_prev=u_prev, sat=sat, du=du, backend="ns")
    assert bool(res_n.converged)
    np.testing.assert_allclose(np.asarray(res_n.U), np.asarray(res_c.U), atol=2e-5)


def test_expm_taylor_matches_pade():
    from mpc4quantum_tpu.ops.expm import expm_pade, expm_taylor
    import scipy.linalg

    rng = np.random.default_rng(7)
    # range of norms incl. ones requiring several squarings
    for scale in [0.1, 1.0, 5.0, 20.0]:
        Hm = rng.normal(size=(4, 4)) + 1j * rng.normal(size=(4, 4))
        Hm = (Hm + Hm.conj().T) / 2
        A = -1j * scale * Hm
        E_t = np.asarray(expm_taylor(jnp.asarray(A)))
        E_ref = scipy.linalg.expm(A)
        np.testing.assert_allclose(E_t, E_ref, atol=1e-10)
    # batched
    As = -1j * np.stack([rng.normal(size=(4, 4)) for _ in range(6)]).astype(complex)
    E_t = np.asarray(expm_taylor(jnp.asarray(As)))
    E_p = np.asarray(expm_pade(jnp.asarray(As)))
    np.testing.assert_allclose(E_t, E_p, atol=1e-10)
