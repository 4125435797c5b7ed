"""Riccati exact K-inverse (solvers/riccati.py): factorization exactness,
ADMM-path parity with the Newton-Schulz inverse, kernel-wrapper parity, and
closed-loop equivalence on a big-kernel preset.

The NS chain this replaces is the measured dominant rollout cost of the
large-n condensed QPs (experiments/logs/r4_ns_share.log); correctness bar:
the Riccati inverse is EXACT (machine precision at x64), so every downstream
iterate must match the converged-NS path to solver tolerance.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpc4quantum_tpu.ops.bilinear import BilinearModel, model_along_traj
from mpc4quantum_tpu.solvers.boxqp import BoxQPParams, ns_inverse, solve_boxqp_fixed
from mpc4quantum_tpu.solvers.condense import qp_data, quad_program
from mpc4quantum_tpu.solvers.riccati import (
    embed_costs, embed_ltv, riccati_kinv, riccati_kinv_pscan,
    riccati_kinv_shifted, riccati_kinv_batch)


def _random_ltv(rng, H, dx, du, singular_q=True):
    A_s = 0.3 * (rng.standard_normal((H, dx, dx))
                 + 1j * rng.standard_normal((H, dx, dx))) + np.eye(dx)
    B_s = 0.5 * (rng.standard_normal((H, dx, du))
                 + 1j * rng.standard_normal((H, dx, du)))
    D_s = 0.1 * (rng.standard_normal((H, dx)) + 1j * rng.standard_normal((H, dx)))
    x0 = rng.standard_normal(dx) + 1j * rng.standard_normal(dx)
    Qs = []
    for t in range(H + 1):
        W = rng.standard_normal((dx, dx)) + 1j * rng.standard_normal((dx, dx))
        Q = W @ W.conj().T
        if singular_q and t % 2 == 0:
            Q[0, :] = 0
            Q[:, 0] = 0  # singular rows, like leakage-penalized DRAG costs
        Qs.append(Q)
    Rs = []
    for t in range(H):
        W = rng.standard_normal((du, du))
        Rs.append(W @ W.T + 0.1 * np.eye(du))
    X_bm = rng.standard_normal((dx, H + 1)) + 1j * rng.standard_normal((dx, H + 1))
    U_bm = rng.standard_normal((du, H))
    return (jnp.asarray(A_s), jnp.asarray(B_s), jnp.asarray(D_s),
            jnp.asarray(x0), jnp.asarray(np.stack(Qs)), jnp.asarray(np.stack(Rs)),
            jnp.asarray(X_bm), jnp.asarray(U_bm))


def _condensed_P(A_s, B_s, D_s, x0, Q_s, R_s, X_bm, U_bm):
    P, q, lb, ub, w, M = qp_data(x0, X_bm, U_bm, Q_s, R_s, A_s, B_s, D_s, sat=1.0)
    return 0.5 * (np.asarray(P) + np.asarray(P).T), np.asarray(q)


@pytest.mark.parametrize("H,dx,du", [(5, 3, 2), (10, 4, 1), (4, 3, 4)])
def test_riccati_exact_inverse(H, dx, du):
    """riccati_kinv == inv(P + (sigma+rho) I) to machine precision (x64),
    in both loop forms and with Jacobi scaling absorbed."""
    rng = np.random.default_rng(0)
    A_s, B_s, D_s, x0, Q_s, R_s, X_bm, U_bm = _random_ltv(rng, H, dx, du)
    P, _ = _condensed_P(A_s, B_s, D_s, x0, Q_s, R_s, X_bm, U_bm)
    n = H * du
    sigma, rho = 1e-6, 0.37
    K = P + (sigma + rho) * np.eye(n)

    Ar, Br = embed_ltv(A_s, B_s)
    Qr, Rr = embed_costs(Q_s, R_s)
    for unroll in (False, True):
        Kinv = np.asarray(riccati_kinv_shifted(Ar, Br, Qr, Rr, rho, sigma,
                                               unroll=unroll))
        assert np.max(np.abs(np.eye(n) - K @ Kinv)) < 1e-9

    d = 1.0 / np.sqrt(np.maximum(np.diag(P), 1e-12))
    Ks = np.diag(d) @ P @ np.diag(d) + (sigma + rho) * np.eye(n)
    Kinv_s = np.asarray(riccati_kinv_shifted(Ar, Br, Qr, Rr, rho, sigma,
                                             d=jnp.asarray(d)))
    assert np.max(np.abs(np.eye(n) - Ks @ Kinv_s)) < 1e-9


@pytest.mark.parametrize("H,dx,du", [(1, 2, 2), (2, 2, 1), (5, 3, 2),
                                     (50, 2, 1), (16, 9, 2)])
def test_riccati_pscan_matches_sequential(H, dx, du):
    """The O(log H)-depth associative-scan factorization equals the
    sequential recursion to machine precision (x64), including non-power-
    of-two horizons, singular Q steps, and the Jacobi-scaled wrapper."""
    rng = np.random.default_rng(4)
    A_s, B_s, D_s, x0, Q_s, R_s, X_bm, U_bm = _random_ltv(rng, H, dx, du)
    Ar, Br = embed_ltv(A_s, B_s)
    Qr, Rr = embed_costs(Q_s, R_s)
    Rt = Rr + 0.41 * jnp.eye(du, dtype=Ar.dtype)[None]
    k_seq = np.asarray(riccati_kinv(Ar, Br, Qr, Rt))
    k_par = np.asarray(riccati_kinv_pscan(Ar, Br, Qr, Rt))
    np.testing.assert_allclose(k_par, k_seq, atol=1e-11)
    if H >= 2:
        n = H * du
        d = jnp.asarray(rng.uniform(0.5, 2.0, n))
        k_s = np.asarray(riccati_kinv_shifted(Ar, Br, Qr, Rr, 0.7, 1e-6,
                                              d=d))
        k_p = np.asarray(riccati_kinv_shifted(Ar, Br, Qr, Rr, 0.7, 1e-6,
                                              d=d, pscan=True))
        np.testing.assert_allclose(k_p, k_s, atol=1e-11)


def test_boxqp_fixed_riccati_pscan_matches_ns():
    """solve_boxqp_fixed under kinv='riccati_pscan' reproduces the
    converged-NS path on the real n=50 preset QP (f32 plumbing end to
    end, multi-round rho-rebalance included)."""
    P, q, lb, ub, lqr_data = _preset_qp()
    base = BoxQPParams(max_iter=40, n_rounds=2, unroll=False, ns_iters=30)
    r_ns = solve_boxqp_fixed(P, q, lb, ub, params=base)
    r_p = solve_boxqp_fixed(
        P, q, lb, ub, params=base.replace(kinv="riccati_pscan", ns_polish=1),
        lqr_data=lqr_data)
    assert bool(r_ns.converged) and bool(r_p.converged)
    np.testing.assert_allclose(np.asarray(r_p.x), np.asarray(r_ns.x),
                               atol=1e-7)


def test_gj_inverse_exact():
    """utils.linalg.gj_inverse == dense inverse on batched SPD-shifted
    matrices (the condensed-K regime), x64 machine precision."""
    from mpc4quantum_tpu.utils.linalg import gj_inverse

    rng = np.random.default_rng(5)
    for n in (1, 3, 10, 50):
        W = rng.standard_normal((4, n, n))
        K = W @ np.swapaxes(W, -1, -2) + 0.3 * np.eye(n)
        Ki = np.asarray(gj_inverse(jnp.asarray(K)))
        np.testing.assert_allclose(Ki, np.linalg.inv(K), atol=1e-9)


def test_boxqp_fixed_gj_matches_ns():
    """solve_boxqp_fixed under kinv='gj' (exact matrix-form Gauss-Jordan
    inverse) reproduces the converged-NS path on the n=50 preset QP."""
    P, q, lb, ub, _ = _preset_qp()
    base = BoxQPParams(max_iter=40, n_rounds=2, unroll=False, ns_iters=30)
    r_ns = solve_boxqp_fixed(P, q, lb, ub, params=base)
    r_gj = solve_boxqp_fixed(P, q, lb, ub, params=base.replace(kinv="gj"))
    assert bool(r_ns.converged) and bool(r_gj.converged)
    np.testing.assert_allclose(np.asarray(r_gj.x), np.asarray(r_ns.x),
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(r_gj.y), np.asarray(r_ns.y),
                               atol=1e-6)


def test_pallas_big_gj_interpret():
    """boxqp_pallas_big(kinv_method='gj') == the NS form (interpret mode):
    the hoisted exact inverse is plumbed end to end, scaled and unscaled."""
    from mpc4quantum_tpu.ops.pallas_qp import boxqp_pallas_big

    rng = np.random.default_rng(6)
    H, dx, du, B = 4, 2, 2, 3
    n = H * du
    lanes = [_random_ltv(rng, H, dx, du, singular_q=False) for _ in range(B)]
    Ps, qs = [], []
    for l in lanes:
        P, q = _condensed_P(*l)
        Ps.append(P)
        qs.append(q)
    P = jnp.asarray(np.stack(Ps), jnp.float32)
    q = jnp.asarray(np.stack(qs), jnp.float32)
    lb = jnp.full((B, n), -1.0, jnp.float32)
    ub = jnp.full((B, n), 1.0, jnp.float32)
    for scale in (False, True):
        kw = dict(iters=25, rounds=2, interpret=True, scale=scale)
        x_ns = boxqp_pallas_big(P, q, lb, ub, ns_iters=40, **kw)
        x_gj = boxqp_pallas_big(P, q, lb, ub, kinv_method="gj", **kw)
        np.testing.assert_allclose(np.asarray(x_gj), np.asarray(x_ns),
                                   atol=2e-5)


def test_riccati_batch_matches_per_lane():
    rng = np.random.default_rng(1)
    H, dx, du, B = 6, 3, 2, 5
    lanes = [_random_ltv(rng, H, dx, du) for _ in range(B)]
    Ar_b, Br_b = zip(*[embed_ltv(l[0], l[1]) for l in lanes])
    Qr, Rr = embed_costs(lanes[0][4], lanes[0][5])  # shared costs
    rho = jnp.asarray(rng.uniform(0.05, 2.0, B))
    out = riccati_kinv_batch(jnp.stack(Ar_b), jnp.stack(Br_b), Qr, Rr,
                             rho, 1e-6)
    for b in range(B):
        one = riccati_kinv_shifted(Ar_b[b], Br_b[b], Qr, Rr, rho[b], 1e-6)
        np.testing.assert_allclose(np.asarray(out[b]), np.asarray(one),
                                   atol=1e-12)


def _preset_qp(scale=False):
    """First-solve QP data of the not_state_freq preset (n = 50, the
    big-kernel workload the Riccati path targets)."""
    from mpc4quantum_tpu import presets

    sc = presets.not_state_freq()
    H = sc.config.horizon
    dim_x = 4
    A = sc.model.A
    bm = BilinearModel.from_stacked(A[:, :dim_x], A[:, dim_x:], 1, sc.config.order)
    lift_x = jnp.asarray(sc.x0)
    Xg = jnp.tile(lift_x[:, None], (1, H + 1))
    Ug = jnp.zeros((1, H))
    A_s, B_s, D_s = model_along_traj(bm, Xg[:, :H], Ug)
    Q_s = jnp.concatenate([jnp.tile(sc.Q[None], (H, 1, 1)), sc.Qf[None]], axis=0)
    R_s = jnp.tile(sc.R[None], (H, 1, 1))
    P, q, lb, ub, w, M = qp_data(lift_x, sc.X_targ[:, :H + 1], sc.U_targ[:, :H],
                                 Q_s, R_s, A_s, B_s, D_s,
                                 u_prev=sc.U_targ[:, 0], sat=sc.sat, du=sc.du)
    Ar, Br = embed_ltv(A_s, B_s)
    Qr, Rr = embed_costs(Q_s, R_s)
    return P, q, lb, ub, (Ar, Br, Qr, Rr)


@pytest.mark.parametrize("scale", [False, True])
def test_boxqp_fixed_riccati_matches_ns(scale):
    """solve_boxqp_fixed iterates under the Riccati inverse match the
    converged-NS path to solver tolerance on the real n=50 preset QP,
    scaled and unscaled, including the multi-round rho-rebalance path."""
    P, q, lb, ub, lqr_data = _preset_qp()
    base = BoxQPParams(max_iter=40, n_rounds=2, unroll=False, scale=scale,
                       ns_iters=30)
    r_ns = solve_boxqp_fixed(P, q, lb, ub, params=base)
    r_ric = solve_boxqp_fixed(P, q, lb, ub,
                              params=base.replace(kinv="riccati", ns_polish=1),
                              lqr_data=lqr_data)
    assert bool(r_ns.converged) and bool(r_ric.converged)
    np.testing.assert_allclose(np.asarray(r_ric.x), np.asarray(r_ns.x),
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(r_ric.y), np.asarray(r_ns.y),
                               atol=1e-6)


def test_pallas_big_riccati_interpret():
    """boxqp_pallas_big(lqr_data=...) == the NS form (interpret mode, CPU):
    the kernel wrapper's scaled/rho-resolved Riccati inverse is plumbed
    correctly end to end."""
    from mpc4quantum_tpu.ops.pallas_qp import boxqp_pallas_big, boxqp_accept

    rng = np.random.default_rng(2)
    H, dx, du, B = 4, 2, 2, 3
    n = H * du
    lanes = [_random_ltv(rng, H, dx, du, singular_q=False) for _ in range(B)]
    # the kernel wrapper's lqr_data shares costs across lanes (production:
    # Q_s/R_s come from the preset, only the linearization is per-lane) -
    # rebuild every lane's condensed P from lane 0's costs to match
    lanes = [l[:4] + (lanes[0][4], lanes[0][5]) + l[6:] for l in lanes]
    Ps, qs = [], []
    for l in lanes:
        P, q = _condensed_P(*l)
        Ps.append(P)
        qs.append(q)
    P = jnp.asarray(np.stack(Ps), jnp.float32)
    q = jnp.asarray(np.stack(qs), jnp.float32)
    lb = jnp.full((B, n), -1.0, jnp.float32)
    ub = jnp.full((B, n), 1.0, jnp.float32)
    Ar_b, Br_b = zip(*[embed_ltv(l[0], l[1]) for l in lanes])
    Qr, Rr = embed_costs(lanes[0][4], lanes[0][5])
    lqr = (jnp.stack(Ar_b), jnp.stack(Br_b), Qr, Rr)

    kw = dict(iters=25, rounds=2, interpret=True, return_aux=True)
    x_ns, aux_ns = boxqp_pallas_big(P, q, lb, ub, ns_iters=40, **kw)
    x_r, aux_r = boxqp_pallas_big(P, q, lb, ub, lqr_data=lqr, ns_polish=1,
                                  lqr_unroll=False, **kw)
    np.testing.assert_allclose(np.asarray(x_r), np.asarray(x_ns), atol=2e-5)
    ok = boxqp_accept(aux_r, 1e-6, 1e-6, 1e-3, 1e-3)
    assert bool(jnp.all(ok))
    # scaled wrapper path
    x_ns_s = boxqp_pallas_big(P, q, lb, ub, ns_iters=40, scale=True,
                              iters=25, rounds=2, interpret=True)
    x_r_s = boxqp_pallas_big(P, q, lb, ub, lqr_data=lqr, ns_polish=1,
                             lqr_unroll=False, scale=True,
                             iters=25, rounds=2, interpret=True)
    np.testing.assert_allclose(np.asarray(x_r_s), np.asarray(x_ns_s), atol=2e-5)


def test_quad_program_riccati_closed_loop():
    """Full quad_program parity on the preset QP + a shortened closed-loop
    not_state_freq run: backend='ns' with kinv='riccati' reproduces the NS
    path's trajectory and fidelity."""
    from mpc4quantum_tpu import presets
    from mpc4quantum_tpu.mpc.driver import mpc

    sc = presets.not_state_freq()
    cfg = dataclasses.replace(
        sc.config, n_steps=20, qp_backend="ns",
        qp_params=BoxQPParams(max_iter=40, n_rounds=2, unroll=False))
    cfg_ric = dataclasses.replace(
        cfg, qp_params=cfg.qp_params.replace(kinv="riccati", ns_polish=1))
    args = sc.mpc_args()
    args["config"] = cfg
    res_ns = mpc(**args)
    args["config"] = cfg_ric
    res_ric = mpc(**args)
    assert int(res_ns.exit_code) == 0 and int(res_ric.exit_code) == 0
    np.testing.assert_allclose(np.asarray(res_ric.us), np.asarray(res_ns.us),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(res_ric.xs), np.asarray(res_ns.xs),
                               atol=1e-6)
