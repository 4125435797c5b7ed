"""Lane-batched Pallas box-QP kernel vs the XLA ADMM solver and scipy
(interpret mode on CPU; small n to bound the unrolled kernel size)."""

import os

import numpy as np
import pytest
import jax.numpy as jnp
import scipy.optimize

from mpc4quantum_tpu.ops.pallas_qp import boxqp_pallas

# interpret-mode execution of the fully-unrolled ADMM kernel takes minutes;
# the pallas test runs with RUN_SLOW=1 (or on real TPU hardware)
slow = pytest.mark.skipif(not os.environ.get("RUN_SLOW"),
                          reason="interpret-mode kernel test is slow; set RUN_SLOW=1")


def make_batch(B, n, seed):
    rng = np.random.default_rng(seed)
    G = rng.normal(size=(B, n, n)).astype(np.float32)
    P = np.einsum("bij,bkj->bik", G, G) + 0.5 * np.eye(n, dtype=np.float32)
    q = rng.normal(size=(B, n)).astype(np.float32) * 2
    lb = -np.abs(rng.normal(size=(B, n))).astype(np.float32)
    ub = np.abs(rng.normal(size=(B, n))).astype(np.float32)
    return P, q, lb, ub


def scipy_ref(P, q, lb, ub):
    out = np.zeros_like(q)
    for b in range(P.shape[0]):
        fun = lambda x: 0.5 * x @ P[b] @ x + q[b] @ x
        jac = lambda x: P[b] @ x + q[b]
        res = scipy.optimize.minimize(fun, np.clip(np.zeros_like(q[b]), lb[b], ub[b]),
                                      jac=jac, method="L-BFGS-B",
                                      bounds=list(zip(lb[b], ub[b])),
                                      options={"ftol": 1e-14, "maxiter": 3000})
        out[b] = res.x
    return out


@slow
def test_pallas_qp_matches_mirror_batch():
    """Interpret-mode kernel == the plain-numpy algorithm mirror at a small
    iteration budget (the mirror itself is checked against scipy optima at a
    full budget in test_kernel_algorithm_numpy_mirror_matches_scipy - chained,
    this gives kernel -> mirror -> scipy without compiling a 200-iteration
    unrolled kernel in interpret mode, which takes tens of minutes)."""
    P, q, lb, ub = make_batch(4, 5, seed=0)
    # interpret-mode compile time explodes superlinearly with the unrolled
    # iteration count (measured: 4x2 ~ 6s, 10x2 > 10min) - keep budgets tiny;
    # parity with the exact mirror is budget-independent
    x = np.asarray(boxqp_pallas(jnp.asarray(P), jnp.asarray(q), jnp.asarray(lb),
                                jnp.asarray(ub), iters=4, rounds=2,
                                tile_b=128, interpret=True))
    # feasibility
    assert np.all(x >= lb - 1e-5) and np.all(x <= ub + 1e-5)
    for b in range(4):
        ref = _admm_mirror(P[b], q[b], lb[b], ub[b], iters=4, rounds=2)
        np.testing.assert_allclose(x[b], ref, atol=2e-5)


def _admm_mirror(P, q, lb, ub, x0=None, iters=100, rounds=2, rho_scale=0.1,
                 sigma=1e-6, alpha=1.6, y0=None, rho0=None,
                 eps_abs=1e-6, eps_rel=1e-6, acc_abs=1e-3, acc_rel=1e-3):
    """Plain-numpy mirror of exactly the kernel's algorithm (unpivoted
    Gauss-Jordan inverse + (y, rho)-warm-startable fixed-iteration relaxed
    ADMM with rho rebalanced per round, frozen once the iterates pass the
    acceptance rule)."""
    n = P.shape[0]
    P = 0.5 * (P + P.T)
    diag_scale = max(np.trace(P) / n, 1e-12)
    rho = rho_scale * diag_scale
    if rho0 is not None and rho0 > 0:
        rho = np.clip(rho0, 1e-8 * diag_scale, 1e8 * diag_scale)
    x = np.clip(np.zeros(n) if x0 is None else x0, lb, ub)
    z = x.copy()
    y = np.zeros(n) if y0 is None else np.asarray(y0, float).copy()
    for rnd in range(rounds):
        Kinv = np.linalg.inv(P + (sigma + rho) * np.eye(n))
        for _ in range(iters):
            x = Kinv @ (sigma * x - q + rho * z - y)
            z_arg = alpha * x + (1 - alpha) * z
            z = np.clip(z_arg + y / rho, lb, ub)
            y = y + rho * (z_arg - z)
        prim = np.max(np.abs(x - z))
        dual = np.max(np.abs(P @ x + q + y))
        xmax = max(np.max(np.abs(x)), np.max(np.abs(z)))
        dmax = max(np.max(np.abs(P @ x)), np.max(np.abs(q)), np.max(np.abs(y)))
        accepted = (prim <= max(eps_abs + eps_rel * xmax, acc_abs + acc_rel * xmax)
                    and dual <= max(eps_abs + eps_rel * dmax, acc_abs + acc_rel * dmax))
        if not accepted:
            prim_s = prim / max(xmax, 1e-12)
            dual_s = dual / max(dmax, 1e-12)
            ratio = np.sqrt(prim_s / max(dual_s, 1e-16))
            rho = np.clip(rho * ratio, 1e-8 * diag_scale, 1e8 * diag_scale)
    return z


def test_kernel_algorithm_numpy_mirror_matches_scipy():
    # validates the kernel's *algorithm* (the pallas wiring is exercised by
    # the slow interpret test / real hardware)
    P, q, lb, ub = make_batch(4, 6, seed=3)
    for b in range(4):
        x = _admm_mirror(P[b].astype(np.float64), q[b].astype(np.float64),
                         lb[b].astype(np.float64), ub[b].astype(np.float64))
        ref = scipy_ref(P[b:b+1].astype(np.float64), q[b:b+1].astype(np.float64),
                        lb[b:b+1].astype(np.float64), ub[b:b+1].astype(np.float64))[0]
        np.testing.assert_allclose(x, ref, atol=2e-3)


@slow
def test_kernel_matches_solve_boxqp_fixed():
    """The kernel is an exact algorithmic mirror of solvers/boxqp.py
    solve_boxqp_fixed: same iterates, same residuals, same acceptance."""
    import jax
    from mpc4quantum_tpu.ops.pallas_qp import boxqp_accept
    from mpc4quantum_tpu.solvers.boxqp import solve_boxqp_fixed, BoxQPParams

    P, q, lb, ub = make_batch(4, 6, seed=1)
    rng = np.random.default_rng(7)
    x0 = rng.normal(size=q.shape).astype(np.float32) * 0.1

    params = BoxQPParams(max_iter=4, n_rounds=2)
    xk, aux = boxqp_pallas(P, q, lb, ub, x0=x0, iters=4, rounds=2,
                           return_aux=True, interpret=True, tile_b=128)
    conv = np.asarray(boxqp_accept(aux, params.eps_abs, params.eps_rel,
                                   params.accept_abs, params.accept_rel))

    f32 = lambda a: jnp.asarray(a, jnp.float32)
    ref = jax.vmap(lambda P, q, lb, ub, x0: solve_boxqp_fixed(
        P, q, lb, ub, x0=x0, params=params))(
        f32(P), f32(q), f32(lb), f32(ub), f32(x0))
    np.testing.assert_allclose(np.asarray(xk), np.asarray(ref.x), atol=2e-5)
    np.testing.assert_allclose(np.asarray(aux.prim), np.asarray(ref.prim_res), atol=2e-5)
    np.testing.assert_allclose(np.asarray(aux.dual), np.asarray(ref.dual_res), atol=2e-4)
    np.testing.assert_array_equal(conv, np.asarray(ref.converged))


@slow
def test_hostloop_pallas_qp_impl_plumbing():
    """qp_impl='pallas': the fleet's QPs solved by one kernel call per SQP
    iteration, end-to-end through the host-loop driver (interpret mode on
    CPU). The kernel mirrors solve_boxqp_fixed exactly, so the whole rollout
    must match qp_impl='xla' + qp_backend='ns' at the same iteration budget -
    controls AND exit codes. (On-chip validation at the full budget lives in
    experiments/probe_tpu_pallasloop.py.)"""
    import jax
    import mpc4quantum_tpu as m4q
    from mpc4quantum_tpu.mpc.hostloop import HostLoopMPC
    from mpc4quantum_tpu.plants.quantum import quantum_step_taylor
    from mpc4quantum_tpu.parallel.fleet import make_scenario_batch
    from mpc4quantum_tpu.solvers.boxqp import BoxQPParams
    import sys, pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
    from test_mpc_e2e import make_not_state_problem

    rho0, model, plant, X_targ, U_targ, Q, R, Qf, config, sat, du = make_not_state_problem()
    plants, keys = make_scenario_batch(jax.random.PRNGKey(0), plant, 2, detune_scale=0.01)
    import dataclasses
    # tiny ADMM budget and horizon: interpret-mode compile of the unrolled
    # kernel explodes superlinearly with (iters x n); acceptance loosened so
    # the short solves still count as converged on both paths. The targets
    # built for H=10 are oversized for H=6, which the driver's dynamic
    # windows absorb.
    cfg = dataclasses.replace(config, horizon=6, n_steps=2, qp_backend="ns",
                              qp_params=BoxQPParams(max_iter=4, n_rounds=2,
                                                    accept_abs=0.5, accept_rel=0.5))
    runner = HostLoopMPC(cfg, sat, du=du, plant_step_fn=quantum_step_taylor,
                         warm_sqp_iters=2, qp_impl="pallas", pallas_interpret=True)
    out = runner.run(rho0, model, plants, X_targ, U_targ, Q, R, Qf, keys)
    assert out["final_x"].shape == (2, 4)
    assert np.all(np.isfinite(out["us"]))
    runner_x = HostLoopMPC(cfg, sat, du=du, plant_step_fn=quantum_step_taylor,
                           warm_sqp_iters=2, qp_impl="xla")
    out_x = runner_x.run(rho0, model, plants, X_targ, U_targ, Q, R, Qf, keys)
    np.testing.assert_array_equal(out["exit_code"], out_x["exit_code"])
    np.testing.assert_allclose(out["us"], out_x["us"], atol=1e-3)
    # a nonzero pulse must actually have been commanded (non-vacuous)
    assert np.max(np.abs(out_x["us"])) > 0.01


# ---------------------------------------------------------------------------
# Large-n looped kernel (boxqp_pallas_big): covers every preset's QP size
# ---------------------------------------------------------------------------
# Unlike the unrolled kernel, the looped kernel's interpret-mode compile is
# budget-independent (fori_loops, not unrolled chains), so these run in the
# regular suite at realistic budgets.


@pytest.mark.parametrize("B,n,iters,rounds", [
    (5, 12, 15, 3),    # small-n cross-check against the unrolled kernel's regime
    (3, 40, 30, 2),    # crosstalk-sized (H=20, dim_u=2)
    (2, 150, 20, 2),   # cnot-sized (H=50, dim_u=3) - the reference's largest QP
])
def test_big_kernel_matches_solve_boxqp_fixed(B, n, iters, rounds):
    """boxqp_pallas_big is an exact algorithmic mirror of
    solvers/boxqp.solve_boxqp_fixed (the qp_backend='ns' XLA path): same
    Newton-Schulz inverse, same iterates, same residuals and acceptance -
    at every preset QP size including cnot's n = 150."""
    import jax
    from mpc4quantum_tpu.ops.pallas_qp import boxqp_pallas_big, boxqp_accept
    from mpc4quantum_tpu.solvers.boxqp import solve_boxqp_fixed, BoxQPParams

    rng = np.random.default_rng(n)
    G = rng.normal(size=(B, n, n)).astype(np.float32)
    P = np.einsum("bij,bkj->bik", G, G) / n + 0.5 * np.eye(n, dtype=np.float32)
    q = rng.normal(size=(B, n)).astype(np.float32)
    lb = -np.abs(rng.normal(size=(B, n))).astype(np.float32)
    ub = np.abs(rng.normal(size=(B, n))).astype(np.float32)
    x0 = rng.normal(size=(B, n)).astype(np.float32) * 0.1

    xk, aux = boxqp_pallas_big(P, q, lb, ub, x0=x0, iters=iters, rounds=rounds,
                               interpret=True, return_aux=True)
    params = BoxQPParams(max_iter=iters, n_rounds=rounds)
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    ref = jax.vmap(lambda P, q, lb, ub, x0: solve_boxqp_fixed(
        P, q, lb, ub, x0=x0, params=params))(
        f32(P), f32(q), f32(lb), f32(ub), f32(x0))
    np.testing.assert_allclose(np.asarray(xk), np.asarray(ref.x), atol=2e-5)
    np.testing.assert_allclose(np.asarray(aux.prim), np.asarray(ref.prim_res), atol=2e-5)
    np.testing.assert_allclose(np.asarray(aux.dual), np.asarray(ref.dual_res), atol=2e-4)
    conv = np.asarray(boxqp_accept(aux, params.eps_abs, params.eps_rel,
                                   params.accept_abs, params.accept_rel))
    np.testing.assert_array_equal(conv, np.asarray(ref.converged))
    # feasibility of the returned (projected) iterate
    assert np.all(np.asarray(xk) >= lb - 1e-6) and np.all(np.asarray(xk) <= ub + 1e-6)


def test_big_kernel_scaled_matches_solve_boxqp_fixed():
    """scale=True Jacobi-equilibrates the QP outside the kernel (the same
    helper the XLA path uses) and reports residual stats in the ORIGINAL
    coordinates: solutions, duals, residuals and the acceptance verdict all
    match solve_boxqp_fixed(scale=True) - so the production tuned budgets
    (benchfleet.PRESET_STEADY_BUDGET scale entries) mean the same thing on
    either implementation."""
    import jax
    from mpc4quantum_tpu.ops.pallas_qp import boxqp_pallas_big, boxqp_accept
    from mpc4quantum_tpu.solvers.boxqp import solve_boxqp_fixed, BoxQPParams

    rng = np.random.default_rng(21)
    B, n = 4, 32  # drag_state-sized
    G = rng.normal(size=(B, n, n)).astype(np.float32)
    P = np.einsum("bij,bkj->bik", G, G) / n + 0.5 * np.eye(n, dtype=np.float32)
    d = np.exp(rng.normal(scale=1.5, size=(B, n))).astype(np.float32)
    P = P * d[:, :, None] * d[:, None, :]  # diag spread ~ 1e3
    q = rng.normal(size=(B, n)).astype(np.float32) * d
    lb = -np.abs(rng.normal(size=(B, n))).astype(np.float32)
    ub = np.abs(rng.normal(size=(B, n))).astype(np.float32)
    y0 = rng.normal(size=(B, n)).astype(np.float32) * 0.1

    params = BoxQPParams(max_iter=15, n_rounds=2, scale=True)
    xk, aux = boxqp_pallas_big(P, q, lb, ub, y0=y0, iters=15, rounds=2,
                               interpret=True, return_aux=True, scale=True)
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    ref = jax.vmap(lambda P, q, lb, ub, y0: solve_boxqp_fixed(
        P, q, lb, ub, y0=y0, params=params))(
        f32(P), f32(q), f32(lb), f32(ub), f32(y0))
    np.testing.assert_allclose(np.asarray(xk), np.asarray(ref.x), atol=2e-5)
    np.testing.assert_allclose(np.asarray(aux.y), np.asarray(ref.y),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(aux.prim), np.asarray(ref.prim_res),
                               atol=2e-5)
    # raw-coordinate dual residuals are d-inflated (up to ~1e3 here), so the
    # f32 einsum-vs-matvec accumulation difference shows up scaled too
    np.testing.assert_allclose(np.asarray(aux.dual), np.asarray(ref.dual_res),
                               rtol=5e-3, atol=2e-4)
    conv = np.asarray(boxqp_accept(aux, params.eps_abs, params.eps_rel,
                                   params.accept_abs, params.accept_rel))
    np.testing.assert_array_equal(conv, np.asarray(ref.converged))
    # unscaled solve of the same (well-posed) problems at a deep budget is
    # the oracle: equilibration changes the path, not the optimum
    deep = jax.vmap(lambda P, q, lb, ub: solve_boxqp_fixed(
        P, q, lb, ub, params=BoxQPParams(max_iter=400, n_rounds=3,
                                         unroll=False)))(
        f32(P), f32(q), f32(lb), f32(ub))
    assert np.median(np.abs(np.asarray(xk) - np.asarray(deep.x))) < 5e-3


def test_big_kernel_chunked_lane_tiles():
    """n > 90 with more than one lane tile takes the single-block-per-tile
    dispatch path (no double-buffered (n,n,LANE) block); results must be
    independent of the dispatch shape."""
    import jax
    from mpc4quantum_tpu.ops.pallas_qp import boxqp_pallas_big
    from mpc4quantum_tpu.solvers.boxqp import solve_boxqp_fixed, BoxQPParams

    rng = np.random.default_rng(9)
    B, n = 130, 100
    G = rng.normal(size=(B, n, n)).astype(np.float32)
    P = np.einsum("bij,bkj->bik", G, G) / n + 0.5 * np.eye(n, dtype=np.float32)
    q = rng.normal(size=(B, n)).astype(np.float32)
    lb = -np.abs(rng.normal(size=(B, n))).astype(np.float32)
    ub = np.abs(rng.normal(size=(B, n))).astype(np.float32)
    xk = boxqp_pallas_big(P, q, lb, ub, iters=10, rounds=2, interpret=True)
    params = BoxQPParams(max_iter=10, n_rounds=2)
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    ref = jax.vmap(lambda P, q, lb, ub: solve_boxqp_fixed(P, q, lb, ub, params=params))(
        f32(P), f32(q), f32(lb), f32(ub))
    np.testing.assert_allclose(np.asarray(xk), np.asarray(ref.x), atol=2e-5)


def test_big_kernel_converges_to_scipy_optimum():
    """At a full budget the looped kernel reaches the true box-QP optimum
    (chained oracle: kernel == NS-ADMM mirror == scipy)."""
    from mpc4quantum_tpu.ops.pallas_qp import boxqp_pallas_big

    P, q, lb, ub = make_batch(4, 24, seed=11)
    x = np.asarray(boxqp_pallas_big(jnp.asarray(P), jnp.asarray(q),
                                    jnp.asarray(lb), jnp.asarray(ub),
                                    iters=150, rounds=3, interpret=True))
    ref = scipy_ref(P.astype(np.float64), q.astype(np.float64),
                    lb.astype(np.float64), ub.astype(np.float64))
    np.testing.assert_allclose(x, ref, atol=2e-3)


@slow
def test_hostloop_big_kernel_e2e_crosstalk_sized():
    """qp_impl='pallas' on a preset whose QP exceeds the unrolled kernel's
    n <= 16 (crosstalk: n = H*dim_u = 40): HostLoopMPC auto-selects the
    looped kernel and the rollout must match qp_impl='xla' + qp_backend='ns'
    lane-for-lane at the same budget."""
    import dataclasses
    import jax
    from mpc4quantum_tpu import presets
    from mpc4quantum_tpu.mpc.hostloop import HostLoopMPC
    from mpc4quantum_tpu.parallel.fleet import make_scenario_batch
    from mpc4quantum_tpu.plants.quantum import quantum_step_taylor
    from mpc4quantum_tpu.solvers.boxqp import BoxQPParams

    sc = presets.crosstalk(coupling=0.01)
    plants, keys = make_scenario_batch(jax.random.PRNGKey(0), sc.plant, 2,
                                       detune_scale=0.01)
    cfg = dataclasses.replace(sc.config, n_steps=3, qp_backend="ns",
                              qp_params=BoxQPParams(max_iter=60, n_rounds=2))
    mk = lambda impl: HostLoopMPC(cfg, sc.sat, du=sc.du,
                                  plant_step_fn=quantum_step_taylor,
                                  lift_fn=sc.lift_fn, proj_fn=sc.proj_fn,
                                  warm_sqp_iters=3, qp_impl=impl,
                                  pallas_interpret=(impl == "pallas"))
    out_p = mk("pallas").run(sc.x0, sc.model, plants, sc.X_targ, sc.U_targ,
                             sc.Q, sc.R, sc.Qf, keys)
    out_x = mk("xla").run(sc.x0, sc.model, plants, sc.X_targ, sc.U_targ,
                          sc.Q, sc.R, sc.Qf, keys)
    np.testing.assert_array_equal(out_p["exit_code"], out_x["exit_code"])
    np.testing.assert_allclose(out_p["us"], out_x["us"], atol=1e-4)
    np.testing.assert_allclose(out_p["final_x"], out_x["final_x"], atol=1e-4)
    assert np.max(np.abs(out_x["us"])) > 1e-3  # non-vacuous


def test_big_kernel_warm_duals_matches_solve_boxqp_fixed():
    """(y0, rho0) dual warm starts flow through the looped kernel exactly as
    through solve_boxqp_fixed: same iterates AND same carried-out (y, rho) -
    the invariants the MPC drivers' dual warm-starting relies on."""
    import jax
    from mpc4quantum_tpu.ops.pallas_qp import boxqp_pallas_big
    from mpc4quantum_tpu.solvers.boxqp import solve_boxqp_fixed, BoxQPParams

    B, n = 4, 24
    P, q, lb, ub = make_batch(B, n, seed=21)
    params = BoxQPParams(max_iter=15, n_rounds=1)
    f32 = lambda a: jnp.asarray(a, jnp.float32)

    # first solve (cold) produces the warm values
    x1, aux1 = boxqp_pallas_big(P, q, lb, ub, iters=15, rounds=1,
                                interpret=True, return_aux=True)
    # neighboring problem, warm-started
    q2 = (q + 0.02 * np.random.default_rng(5).normal(size=q.shape)).astype(np.float32)
    x2, aux2 = boxqp_pallas_big(P, q2, lb, ub, x0=x1, y0=aux1.y, rho0=aux1.rho,
                                iters=15, rounds=1, interpret=True, return_aux=True)

    ref1 = jax.vmap(lambda P, q, lb, ub: solve_boxqp_fixed(P, q, lb, ub,
                                                           params=params))(
        f32(P), f32(q), f32(lb), f32(ub))
    np.testing.assert_allclose(np.asarray(aux1.y), np.asarray(ref1.y), atol=2e-4)
    np.testing.assert_allclose(np.asarray(aux1.rho), np.asarray(ref1.rho), rtol=1e-3)
    ref2 = jax.vmap(lambda P, q, lb, ub, x0, y0, r0: solve_boxqp_fixed(
        P, q, lb, ub, x0=x0, y0=y0, rho0=r0, params=params))(
        f32(P), f32(q2), f32(lb), f32(ub), ref1.x, ref1.y, ref1.rho)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(ref2.x), atol=2e-4)
    np.testing.assert_allclose(np.asarray(aux2.rho), np.asarray(ref2.rho), rtol=1e-3)


@slow
def test_small_kernel_warm_duals_matches_solve_boxqp_fixed():
    """Same dual warm-start parity for the fully-unrolled small-n kernel
    (interpret mode; tiny budget to bound the unrolled program)."""
    import jax
    from mpc4quantum_tpu.solvers.boxqp import solve_boxqp_fixed, BoxQPParams

    B, n = 4, 5
    P, q, lb, ub = make_batch(B, n, seed=22)
    params = BoxQPParams(max_iter=4, n_rounds=2)
    f32 = lambda a: jnp.asarray(a, jnp.float32)

    x1, aux1 = boxqp_pallas(P, q, lb, ub, iters=4, rounds=2, tile_b=128,
                            interpret=True, return_aux=True)
    q2 = (q + 0.02 * np.random.default_rng(6).normal(size=q.shape)).astype(np.float32)
    x2, aux2 = boxqp_pallas(P, q2, lb, ub, x0=x1, y0=aux1.y, rho0=aux1.rho,
                            iters=4, rounds=2, tile_b=128,
                            interpret=True, return_aux=True)

    ref1 = jax.vmap(lambda P, q, lb, ub: solve_boxqp_fixed(P, q, lb, ub,
                                                           params=params))(
        f32(P), f32(q), f32(lb), f32(ub))
    np.testing.assert_allclose(np.asarray(aux1.y), np.asarray(ref1.y), atol=2e-4)
    np.testing.assert_allclose(np.asarray(aux1.rho), np.asarray(ref1.rho), rtol=1e-3)
    ref2 = jax.vmap(lambda P, q, lb, ub, x0, y0, r0: solve_boxqp_fixed(
        P, q, lb, ub, x0=x0, y0=y0, rho0=r0, params=params))(
        f32(P), f32(q2), f32(lb), f32(ub), ref1.x, ref1.y, ref1.rho)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(ref2.x), atol=2e-4)
    np.testing.assert_allclose(np.asarray(aux2.rho), np.asarray(ref2.rho), rtol=1e-3)


def test_big_kernel_unrolled_iters_matches_looped():
    """unroll_iters=True (static FMA chain, no fori_loop - the shortest
    serial form for flagship-sized QPs and the guaranteed-to-lower form on
    loop-limited TPU backends) computes the same solve as the looped form
    and the XLA mirror."""
    import jax
    from mpc4quantum_tpu.ops.pallas_qp import boxqp_pallas_big
    from mpc4quantum_tpu.solvers.boxqp import solve_boxqp_fixed, BoxQPParams

    B, n = 4, 10
    P, q, lb, ub = make_batch(B, n, seed=31)
    kw = dict(iters=10, rounds=2, interpret=True, return_aux=True)
    x_loop, aux_loop = boxqp_pallas_big(P, q, lb, ub, **kw)
    x_unr, aux_unr = boxqp_pallas_big(P, q, lb, ub, unroll_iters=True, **kw)
    np.testing.assert_allclose(np.asarray(x_unr), np.asarray(x_loop), atol=1e-6)
    np.testing.assert_allclose(np.asarray(aux_unr.rho), np.asarray(aux_loop.rho),
                               rtol=1e-3)
    params = BoxQPParams(max_iter=10, n_rounds=2)
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    ref = jax.vmap(lambda P, q, lb, ub: solve_boxqp_fixed(P, q, lb, ub,
                                                          params=params))(
        f32(P), f32(q), f32(lb), f32(ub))
    np.testing.assert_allclose(np.asarray(x_unr), np.asarray(ref.x), atol=2e-5)
