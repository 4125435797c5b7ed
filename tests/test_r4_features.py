"""Round-4 feature coverage: per-warm-step SQP budgets, LQR-seeded init,
per-lane rescue, ns_iters plumbing."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

import mpc4quantum_tpu as m4q
from mpc4quantum_tpu import presets
from mpc4quantum_tpu.benchfleet import run_hostloop_fleet
from mpc4quantum_tpu.mpc.hostloop import HostLoopMPC
from mpc4quantum_tpu.solvers.boxqp import BoxQPParams, solve_boxqp_fixed


def _flagship_cpu():
    sc = presets.not_state()
    return dataclasses.replace(sc, config=dataclasses.replace(
        sc.config, qp_params=sc.config.qp_params.replace(unroll=False)))


def test_warm_iters_tuple_matches_flat_when_converged():
    """(12, 2) per-step warm budgets == flat 12 lane-for-lane on the
    flagship: step 1 converges in <= 2 line-searched iterations, so the
    masked extra iterations of the flat budget are frozen no-ops."""
    sc = _flagship_cpu()
    a, outa = run_hostloop_fleet(sc, 8, cpu=True, warm_sqp_iters=12,
                                 granularity="sqp", steady_fuse=1,
                                 warm_duals=False)
    b, outb = run_hostloop_fleet(sc, 8, cpu=True, warm_sqp_iters=(12, 2),
                                 granularity="sqp", steady_fuse=1,
                                 warm_duals=False)
    np.testing.assert_allclose(outa["final_x"], outb["final_x"], atol=1e-12)
    assert a["fidelity_min"] == b["fidelity_min"]


def test_warm_iters_validation():
    sc = _flagship_cpu()
    try:
        HostLoopMPC(sc.config, sc.sat, warm_sqp_iters=(8, 0))
        assert False, "expected ValueError"
    except ValueError as e:
        assert "warm_sqp_iters" in str(e)


def test_lqr_seed_closed_loop():
    """LQR-seeded init (documented as measured-worse at fleet scale; kept
    as an option) still converges the single flagship rollout."""
    sc = presets.not_state()
    cfg = dataclasses.replace(sc.config, lqr_seed=True)
    args = sc.mpc_args()
    args["config"] = cfg
    res = m4q.mpc(**args, key=jax.random.PRNGKey(0))
    targ = np.asarray(sc.target_state)
    fid = float(np.real(np.asarray(res.xs)[:, -1] @ targ.conj()))
    assert int(res.exit_code) == 0
    assert fid > 0.99, fid


def test_lqr_seed_hostloop_matches_scan():
    """hostloop lqr_seed == scan-driver lqr_seed lane-for-lane (the seed is
    computed host-side there, in-graph here - same LQR solve)."""
    sc = _flagship_cpu()
    cfg = dataclasses.replace(sc.config, lqr_seed=True, qp_backend="ns",
                              n_steps=6)
    sc2 = dataclasses.replace(sc, config=cfg)
    m, out = run_hostloop_fleet(sc2, 4, cpu=True, warm_sqp_iters=12,
                                granularity="sqp", steady_fuse=1,
                                warm_duals=False)
    # scan driver on the same lanes
    from mpc4quantum_tpu.parallel.fleet import make_scenario_batch, batched_mpc

    with jax.default_device(jax.devices("cpu")[0]):
        plants, keys = make_scenario_batch(jax.random.PRNGKey(1), sc2.plant, 4,
                                           detune_scale=0.01)
    res = batched_mpc(jnp.asarray(sc2.x0), sc2.model, plants, sc2.X_targ,
                      sc2.U_targ, sc2.Q, sc2.R, sc2.Qf, cfg, sc2.sat,
                      du=sc2.du, keys=jnp.asarray(keys))
    np.testing.assert_allclose(out["final_x"],
                               np.asarray(res.xs)[:, :, -1], atol=1e-7)


def test_rescue_merges_better_lanes():
    """The rescue pass re-runs marginal lanes and keeps the better result;
    with an absurd threshold and the same scenario, results are unchanged
    and the bookkeeping fields appear."""
    sc = _flagship_cpu()
    m0, out0 = run_hostloop_fleet(sc, 16, cpu=True, granularity="sqp",
                                  steady_fuse=1)
    m1, out1 = run_hostloop_fleet(sc, 16, cpu=True, granularity="sqp",
                                  steady_fuse=1,
                                  rescue={"threshold": 0.9995, "scenario": sc})
    assert m1["rescued_lanes"] > 0
    assert m1["rescue_batch"] >= m1["rescued_lanes"]
    # same-scenario rescue is deterministic: nothing improves, nothing lost
    assert m1["rescue_improved"] == 0
    np.testing.assert_allclose(out0["final_x"], out1["final_x"], atol=1e-12)
    assert m1["fidelity_min"] == m0["fidelity_min"]


def test_ns_iters_param_changes_inverse_budget():
    """BoxQPParams.ns_iters reaches solve_boxqp_fixed: a starved inverse
    (2 iterations) must differ from the converged default on a conditioned
    problem; 20 matches 30 to solver tolerance."""
    rng = np.random.default_rng(0)
    n = 12
    M = rng.normal(size=(n, n))
    P = jnp.asarray(M @ M.T + 0.5 * np.eye(n), jnp.float64)
    q = jnp.asarray(rng.normal(size=n))
    lb, ub = -jnp.ones(n), jnp.ones(n)
    r30 = solve_boxqp_fixed(P, q, lb, ub,
                            params=BoxQPParams(unroll=False, ns_iters=30))
    r20 = solve_boxqp_fixed(P, q, lb, ub,
                            params=BoxQPParams(unroll=False, ns_iters=20))
    r2 = solve_boxqp_fixed(P, q, lb, ub,
                           params=BoxQPParams(unroll=False, ns_iters=2))
    np.testing.assert_allclose(np.asarray(r20.x), np.asarray(r30.x), atol=1e-6)
    assert np.max(np.abs(np.asarray(r2.x) - np.asarray(r30.x))) > 1e-4


def test_preset_warm_budget_override_survives():
    """PRESET_WARM_BUDGET applies only when the caller left the preset's
    own warm budget untouched - an explicit qp_params choice survives."""
    from mpc4quantum_tpu.benchfleet import PRESET_WARM_BUDGET

    sc = presets.PRESETS["drag_state"]()
    default_budget, tuned = PRESET_WARM_BUDGET["drag_state"]
    assert (sc.config.qp_params.n_rounds,
            sc.config.qp_params.max_iter) == default_budget
    # tuned path: run a tiny fleet and confirm the warm cfg picked the cut
    cfg = dataclasses.replace(
        sc.config, n_steps=3,
        qp_params=sc.config.qp_params.replace(unroll=False))
    sc2 = dataclasses.replace(sc, config=cfg)
    m, _ = run_hostloop_fleet(sc2, 2, cpu=True, granularity="sqp",
                              steady_fuse=1)
    assert m["warm_budget"] == f"{tuned[0]}x{tuned[1]}"
    # explicit caller budget survives
    cfg3 = dataclasses.replace(
        sc.config, n_steps=3,
        qp_params=sc.config.qp_params.replace(unroll=False, max_iter=60,
                                              n_rounds=2))
    sc3 = dataclasses.replace(sc, config=cfg3)
    m3, _ = run_hostloop_fleet(sc3, 2, cpu=True, granularity="sqp",
                               steady_fuse=1)
    assert m3["warm_budget"] == "2x60"
