"""K-inverse carry across the steady MPC solve chain (MPCConfig.qp_warm_kinv).

The big-kernel presets spend the dominant share of their rollout in the
between-round Newton-Schulz inverse chain (on-chip ladders,
experiments/logs/r4_ns_share.log: freq 618 -> 1047 r/s and drag 363 -> 711
r/s over the ns_iters range). The carry replaces the cold ~20-iteration
inverse with a contraction-guarded ~10-iteration refresh from the previous
solve's inverse; these tests pin

  1. the ns_inverse warm start + guard semantics,
  2. the solve_boxqp_fixed kinv0 chain (solutions track cold solves),
  3. boxqp_pallas_big(kinv0) == solve_boxqp_fixed(kinv0) parity (the kernel
     is an algorithmic mirror - CPU interpret mode stands in for the chip),
  4. the host-loop end-to-end equivalence: qp_warm_kinv=True is
     closed-loop-equal to the cold form at NS tolerance, chunked and
     single-step programs both covered.

Reference anchor: the reference re-factorizes every OSQP solve from scratch
(optimize.py:59 via CVXPY); the carry is a TPU-native latency optimization
with no reference analogue.
"""

import sys
import pathlib
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from mpc4quantum_tpu.solvers.boxqp import (BoxQPParams, ns_inverse,
                                           solve_boxqp_fixed)
from mpc4quantum_tpu.ops.pallas_qp import boxqp_pallas_big, boxqp_accept

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))


def _spd_batch(B, n, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    M = rng.normal(size=(B, n, n))
    P = (M @ np.swapaxes(M, 1, 2) / n + 0.1 * np.eye(n)).astype(dtype)
    q = rng.normal(size=(B, n)).astype(dtype)
    lb = -np.ones((B, n), dtype)
    ub = np.ones((B, n), dtype)
    return M.astype(dtype), P, q, lb, ub


def test_ns_inverse_warm_start_and_guard():
    """A warm start from a nearby inverse reaches machine precision in a
    handful of iterations; a non-contracting X0 falls back to the cold init
    (selected per batch element)."""
    M, P, _, _, _ = _spd_batch(3, 20, seed=2, dtype=np.float64)
    K = P + 0.2 * np.eye(20)
    Xc = ns_inverse(jnp.asarray(K), iters=40)
    Kp = K + 0.004 * (M + np.swapaxes(M, 1, 2)) / 20
    Xw = ns_inverse(jnp.asarray(Kp), iters=8, X0=Xc)
    res = np.max(np.abs(np.eye(20) - Kp @ np.asarray(Xw)))
    assert res < 1e-10, res

    # garbage X0 on element 0 only: that element must take the cold init
    # (identical to the no-X0 path), the others keep their warm start
    X0 = np.asarray(Xc).copy()
    X0[0] = 100.0 * np.eye(20)
    Xg = ns_inverse(jnp.asarray(Kp), iters=8, X0=jnp.asarray(X0))
    X_cold = ns_inverse(jnp.asarray(Kp), iters=8)
    np.testing.assert_allclose(np.asarray(Xg)[0], np.asarray(X_cold)[0],
                               rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(Xg)[1:], np.asarray(Xw)[1:],
                               rtol=0, atol=1e-12)


def test_solve_boxqp_fixed_kinv_chain():
    """A chain of drifting QPs solved with the carried inverse matches the
    cold-NS solves; a garbage carry is flagged not-converged, never
    silently wrong."""
    M, P, q, lb, ub = _spd_batch(6, 24, seed=3)
    params = BoxQPParams(max_iter=20, n_rounds=2, ns_iters=20,
                         unroll=False, scale=True)
    vsolve = jax.vmap(lambda *a, **k: solve_boxqp_fixed(*a, params=params, **k))
    r = vsolve(P, q, lb, ub)
    assert r.kinv.shape == (6, 24, 24)
    rng = np.random.default_rng(4)
    drift = 0.01 * (M + np.swapaxes(M, 1, 2)) / 24
    for step in range(3):
        P = (P + drift).astype(np.float32)
        q = (q + 0.01 * rng.normal(size=q.shape)).astype(np.float32)
        cold = vsolve(P, q, lb, ub, y0=r.y, rho0=r.rho)
        warm = vsolve(P, q, lb, ub, y0=r.y, rho0=r.rho, kinv0=r.kinv)
        assert bool(jnp.all(warm.converged)), step
        np.testing.assert_allclose(np.asarray(warm.x), np.asarray(cold.x),
                                   atol=2e-5)
        r = warm

    # garbage carry: the guard falls back to the cold init at the refresh
    # budget. The safety contract is converged => correct (a lane may
    # legitimately recover - the fallback gets ns_refresh iterations in
    # EVERY round - or be flagged; it must never be silently wrong).
    cold = vsolve(P, q, lb, ub, y0=r.y, rho0=r.rho)
    bad = vsolve(P, q, lb, ub, y0=r.y, rho0=r.rho,
                 kinv0=100.0 * jnp.broadcast_to(jnp.eye(24), r.kinv.shape))
    ok = np.asarray(bad.converged)
    err = np.max(np.abs(np.asarray(bad.x) - np.asarray(cold.x)), axis=1)
    assert np.all(err[ok] < 1e-3), (ok, err)


def test_big_kernel_kinv_parity():
    """boxqp_pallas_big(kinv0=...) mirrors solve_boxqp_fixed(kinv0=...) -
    cold first solve, then a warm-carried second solve on a drifted
    problem (interpret mode; the chip path runs the identical program)."""
    M, P, q, lb, ub = _spd_batch(8, 12, seed=1)
    params = BoxQPParams(max_iter=10, n_rounds=2, ns_iters=20,
                         unroll=False, scale=True)
    vsolve = jax.vmap(lambda *a, **k: solve_boxqp_fixed(*a, params=params, **k))
    kw = dict(iters=10, rounds=2, ns_iters=20, scale=True,
              interpret=True, return_aux=True)

    r1 = vsolve(P, q, lb, ub)
    x1, a1 = boxqp_pallas_big(P, q, lb, ub, **kw)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(r1.x), atol=2e-5)
    np.testing.assert_allclose(np.asarray(a1.kinv), np.asarray(r1.kinv),
                               atol=2e-4)

    P2 = (P + 0.01 * (M + np.swapaxes(M, 1, 2)) / 12).astype(np.float32)
    r2 = vsolve(P2, q, lb, ub, y0=r1.y, rho0=r1.rho, kinv0=r1.kinv)
    x2, a2 = boxqp_pallas_big(P2, q, lb, ub, y0=np.asarray(r1.y),
                              rho0=np.asarray(r1.rho),
                              kinv0=np.asarray(a1.kinv), ns_refresh=10, **kw)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(r2.x), atol=2e-5)
    conv = boxqp_accept(a2, params.eps_abs, params.eps_rel,
                        params.accept_abs, params.accept_rel)
    np.testing.assert_array_equal(np.asarray(conv), np.asarray(r2.converged))
    assert bool(jnp.all(r2.converged))


def test_hostloop_warm_kinv_e2e_equivalence():
    """Full host-loop fleet, big kernel forced on the flagship problem:
    qp_warm_kinv=True matches the cold form lane-for-lane at NS tolerance
    - exit codes equal, final states within 1e-3, fidelity preserved.
    n_steps=19 makes the steady phase run 5 fused chunks PLUS 2 single-step
    programs, covering the cold-entry, warm-cruise and tail dispatches."""
    from mpc4quantum_tpu.mpc.hostloop import HostLoopMPC
    from mpc4quantum_tpu.plants.quantum import quantum_step_taylor
    from mpc4quantum_tpu.parallel.fleet import make_scenario_batch
    from test_mpc_e2e import make_not_state_problem

    rho0, model, plant, X_targ, U_targ, Q, R, Qf, config, sat, du = \
        make_not_state_problem()
    plants, keys = make_scenario_batch(jax.random.PRNGKey(0), plant, 2,
                                       detune_scale=0.01)
    cfg = dataclasses.replace(config, n_steps=19, qp_backend="ns",
                              qp_warm_duals=True,
                              qp_params=BoxQPParams(max_iter=15, n_rounds=3))
    outs = {}
    for wk in (False, True):
        c = dataclasses.replace(cfg, qp_warm_kinv=wk)
        runner = HostLoopMPC(c, sat, du=du, plant_step_fn=quantum_step_taylor,
                             warm_sqp_iters=(8, 1), qp_impl="pallas",
                             pallas_interpret=True, qp_kernel="big",
                             steady_fuse=3, granularity="mixed")
        assert runner._kinv_carry == wk
        outs[wk] = runner.run(rho0, model, plants, X_targ, U_targ, Q, R, Qf,
                              keys, record=False)
    np.testing.assert_array_equal(outs[True]["exit_code"],
                                  outs[False]["exit_code"])
    assert np.all(outs[False]["exit_code"] == 0)
    np.testing.assert_allclose(outs[True]["final_x"], outs[False]["final_x"],
                               atol=1e-3)
    p1 = np.real(outs[True]["final_x"][:, 3])
    assert np.all(p1 > 0.99), p1


def test_kinv_carry_gate_resolution():
    """The carry only engages on the Pallas large-n kernel path: small
    kernel (n_qp <= 16 under auto) and the XLA path leave it inert."""
    from mpc4quantum_tpu.mpc.hostloop import HostLoopMPC
    from test_mpc_e2e import make_not_state_problem

    *_, config, sat, du = make_not_state_problem()
    cfg = dataclasses.replace(config, qp_warm_kinv=True, qp_backend="ns")
    mk = lambda **kw: HostLoopMPC(cfg, sat, du=du, **kw)
    assert not mk(qp_impl="xla")._kinv_carry
    assert not mk(qp_impl="pallas")._kinv_carry          # auto -> small (n=10)
    assert mk(qp_impl="pallas", qp_kernel="big")._kinv_carry
    off = dataclasses.replace(cfg, qp_warm_kinv=False)
    assert not HostLoopMPC(off, sat, du=du, qp_impl="pallas",
                           qp_kernel="big")._kinv_carry
