"""End-to-end closed-loop MPC scenarios with real assertions (the reference's
scenario tests are plot-only, reference test_mpc4quantum.py:280-804; here the
final fidelity and constraint satisfaction are asserted)."""

import numpy as np
import jax
import jax.numpy as jnp

import mpc4quantum_tpu as m4q
from mpc4quantum_tpu.models.dmdc import dmdc_from_operator, online_from_bootstrap, online_fit_iteration

SX = np.array([[0, 1], [1, 0]], dtype=complex)
SZ = np.array([[1, 0], [0, -1]], dtype=complex)


def matrix_units(d):
    out = []
    for i in range(d):
        for j in range(d):
            e = np.zeros((d, d), complex)
            e[i, j] = 1
            out.append(e)
    return out


def perturbed_rho0(theta=1e-4):
    Rx = np.array([[np.cos(theta / 2), -1j * np.sin(theta / 2)],
                   [-1j * np.sin(theta / 2), np.cos(theta / 2)]])
    return (Rx @ np.diag([1.0, 0.0]).astype(complex) @ Rx.conj().T).flatten()


def make_not_state_problem(order=2, detune=0.99):
    """The reference test_NOT_state config (test_mpc4quantum.py:607-703):
    dt=1, H=10, n=20, sat=2pi*0.1, du=0.5*sat, plant detuned 1%."""
    dt, H, n_steps = 1.0, 10, 20
    sat = 2 * np.pi * 0.1
    du = 0.5 * sat

    units = matrix_units(2)
    A0 = m4q.vectorize_me(np.zeros((2, 2)), units)
    A1 = m4q.vectorize_me(0.5 * SX, units)
    A_dst = m4q.discretize_homogeneous([A0, A1], dt, order)
    model = dmdc_from_operator(jnp.asarray(A_dst), 4, 4, A_dst.shape[1] - 4)

    wq = 2 * np.pi * 4
    plant = m4q.QuantumPlant.create(0.5 * (wq * detune - wq) * SZ, [0.5 * SX])

    rho0 = perturbed_rho0()
    targ = np.zeros(4, complex)
    targ[3] = 1.0
    X_targ = jnp.asarray(np.tile(targ[:, None], (1, n_steps + H + 1)))
    U_targ = jnp.zeros((1, n_steps + H))
    Q = jnp.asarray(np.diag([1.0, 0, 0, 1]).astype(complex))
    Qf = Q
    R = jnp.eye(1) * (1e-2 / sat**2)
    config = m4q.MPCConfig(horizon=H, n_steps=n_steps, dt=dt, dim_u=1, order=order)
    return rho0, model, plant, X_targ, U_targ, Q, R, Qf, config, sat, du


def test_not_state_prep_reaches_high_fidelity():
    rho0, model, plant, X_targ, U_targ, Q, R, Qf, config, sat, du = make_not_state_problem()
    res = m4q.mpc(jnp.asarray(rho0), model, plant, X_targ, U_targ, Q, R, Qf,
                  config, sat=sat, du=du, key=jax.random.PRNGKey(1))
    assert int(res.exit_code) == 0
    assert int(res.n_valid) == config.n_steps
    # state-prep fidelity on the detuned plant: P(|1>) = Re(x[3])
    p1 = float(jnp.real(res.xs[3, -1]))
    assert p1 > 0.99, f"final P(|1>) = {p1}"
    # constraints hold along the whole run
    us = np.asarray(res.us)
    assert np.all(np.abs(us) <= sat + 1e-8)
    # first-step slew from the benchmark control (u_prev quirk: steps 0,1)
    assert abs(us[0, 0]) <= du + 1e-8


def test_not_state_order1_also_works():
    rho0, model, plant, X_targ, U_targ, Q, R, Qf, config, sat, du = make_not_state_problem(order=1)
    res = m4q.mpc(jnp.asarray(rho0), model, plant, X_targ, U_targ, Q, R, Qf,
                  config, sat=sat, du=du, key=jax.random.PRNGKey(1))
    p1 = float(jnp.real(res.xs[3, -1]))
    assert p1 > 0.95, f"final P(|1>) = {p1}"


def test_mpc_is_jittable_end_to_end():
    rho0, model, plant, X_targ, U_targ, Q, R, Qf, config, sat, du = make_not_state_problem()

    @jax.jit
    def run(x0, plant, key):
        return m4q.mpc(x0, model, plant, X_targ, U_targ, Q, R, Qf,
                       config, sat=sat, du=du, key=key)

    res = run(jnp.asarray(rho0), plant, jax.random.PRNGKey(1))
    assert float(jnp.real(res.xs[3, -1])) > 0.99
    # second call hits the cache, and vmaps over plants
    res2 = run(jnp.asarray(rho0), plant, jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(res.us), np.asarray(res2.us), atol=1e-10)


def test_measure_freq_model_closed_loop():
    """measure_freq=5: between measurements the loop closes through the model
    (reference test_NOT_state_freq config, dt=0.2, H=50, n=100)."""
    dt, H, n_steps = 0.2, 50, 100
    sat = 2 * np.pi * 0.1
    du = 0.1 * sat
    order = 1

    units = matrix_units(2)
    A0 = m4q.vectorize_me(np.zeros((2, 2)), units)
    A1 = m4q.vectorize_me(0.5 * SX, units)
    A_dst = m4q.discretize_homogeneous([A0, A1], dt, order)
    model = dmdc_from_operator(jnp.asarray(A_dst), 4, 4, A_dst.shape[1] - 4)

    wq = 2 * np.pi * 4
    plant = m4q.QuantumPlant.create(0.5 * (wq * 0.99 - wq) * SZ, [0.5 * SX])
    rho0 = perturbed_rho0()
    targ = np.zeros(4, complex)
    targ[3] = 1.0
    X_targ = jnp.asarray(np.tile(targ[:, None], (1, n_steps + H + 1)))
    U_targ = jnp.zeros((1, n_steps + H))
    Q = jnp.asarray(np.diag([1.0, 0, 0, 1]).astype(complex))
    R = jnp.eye(1) * 1e-2
    config = m4q.MPCConfig(horizon=H, n_steps=n_steps, dt=dt, dim_u=1, order=order,
                           measure_freq=5)
    res = m4q.mpc(jnp.asarray(rho0), model, plant, X_targ, U_targ, Q, R, Q,
                  config, sat=sat, du=du, key=jax.random.PRNGKey(1))
    p1 = float(jnp.real(res.xs[3, -1]))
    assert p1 > 0.95, f"final P(|1>) = {p1}"


def test_exit_condition_early_stop():
    rho0, model, plant, X_targ, U_targ, Q, R, Qf, config, sat, du = make_not_state_problem()
    targ = np.zeros(4, complex)
    targ[3] = 1.0
    targ_j = jnp.asarray(targ)

    def exit_cond(x_next, x, u):
        # stop when P(|1>) of the previous state > 0.9 (reference-style
        # cost-threshold exit, test_mpc4quantum.py:93-94)
        return jnp.real(x[3]) > 0.9

    res = m4q.mpc(jnp.asarray(rho0), model, plant, X_targ, U_targ, Q, R, Qf,
                  config, sat=sat, du=du, key=jax.random.PRNGKey(1),
                  exit_condition=exit_cond)
    assert int(res.exit_code) == 1
    assert int(res.n_valid) < config.n_steps
    # frozen outputs after the exit step
    us = np.asarray(res.us)
    assert np.all(us[:, int(res.n_valid):] == 0)


def test_streaming_model_update_runs():
    """Online RLS refit inside the loop (config 5 of BASELINE.json)."""
    rho0, model, plant, X_targ, U_targ, Q, R, Qf, config, sat, du = make_not_state_problem()
    m0 = online_from_bootstrap(model.A, 4, 4, model.A.shape[1] - 4, alpha=1e2)
    config = m4q.MPCConfig(**{**config.__dict__, "streaming": True})
    res = m4q.mpc(jnp.asarray(rho0), m0, plant, X_targ, U_targ, Q, R, Qf,
                  config, sat=sat, du=du, key=jax.random.PRNGKey(1),
                  model_update_fn=online_fit_iteration)
    assert int(res.exit_code) == 0
    # the model operator must have moved (refit happened)
    assert float(jnp.max(jnp.abs(res.model_A - m0.A))) > 1e-10
    # and the control still preps the state
    p1 = float(jnp.real(res.xs[3, -1]))
    assert p1 > 0.95, f"final P(|1>) = {p1}"


def test_lqr_solver_mode():
    """solver='lqr': the solver-free fast path (reference lqr.py semantics
    made live) still preps the state, just below the QP's fidelity (clipped
    LQR cannot honor the slew box and saturates suboptimally)."""
    import dataclasses

    rho0, model, plant, X_targ, U_targ, Q, R, Qf, config, sat, du = make_not_state_problem()
    cfg = dataclasses.replace(config, solver="lqr")
    res = m4q.mpc(jnp.asarray(rho0), model, plant, X_targ, U_targ, Q, R, Qf,
                  cfg, sat=sat, du=du, key=jax.random.PRNGKey(1))
    assert int(res.exit_code) == 0
    p1 = float(jnp.real(res.xs[3, -1]))
    assert p1 > 0.95, p1
    assert np.all(np.abs(np.asarray(res.us)) <= sat + 1e-8)


def test_streaming_discrep_model_update_in_driver():
    """Streaming DiscrepDMDc (svd/pinv *inside* the scan) end-to-end through
    mpc() - the reference's `streaming=True` with the discrepancy form
    (reference mpc.py:281-285 -> model.py:186-207). The svd-based rank gate
    and pinv correction must compile under the scan and the closed loop must
    still prep the state."""
    from mpc4quantum_tpu.models.dmdc import discrep_bootstrap, discrep_fit_iteration

    rho0, model, plant, X_targ, U_targ, Q, R, Qf, config, sat, du = make_not_state_problem()
    d0 = discrep_bootstrap(model.A, 4, 4, model.A.shape[1] - 4, capacity=12)
    config = m4q.MPCConfig(**{**config.__dict__, "streaming": True})
    res = m4q.mpc(jnp.asarray(rho0), d0, plant, X_targ, U_targ, Q, R, Qf,
                  config, sat=sat, du=du, key=jax.random.PRNGKey(1),
                  model_update_fn=discrep_fit_iteration)
    assert int(res.exit_code) == 0
    # snapshots were actually appended to the fixed-capacity buffer
    assert int(res.model_state.count) == min(config.n_steps, d0.capacity)
    # and the closed loop still preps the state
    p1 = float(jnp.real(res.xs[3, -1]))
    assert p1 > 0.95, f"final P(|1>) = {p1}"


def test_streaming_with_in_scan_history():
    """HistoryState wrapped around the streaming model records iA snapshots
    *inside* the driver scan (reference model.py:132-135,201-204 - in-loop
    history the round-1 host-side recorder could not observe)."""
    from mpc4quantum_tpu.models.dmdc import (
        with_history, history_update, history_snapshots, online_from_bootstrap,
        online_fit_iteration,
    )

    rho0, model, plant, X_targ, U_targ, Q, R, Qf, config, sat, du = make_not_state_problem()
    m0 = online_from_bootstrap(model.A, 4, 4, model.A.shape[1] - 4, alpha=1e2)
    h0 = with_history(m0, n_slots=6, every=5)
    config = m4q.MPCConfig(**{**config.__dict__, "streaming": True})
    res = m4q.mpc(jnp.asarray(rho0), h0, plant, X_targ, U_targ, Q, R, Qf,
                  config, sat=sat, du=du, key=jax.random.PRNGKey(1),
                  model_update_fn=history_update(online_fit_iteration))
    assert int(res.exit_code) == 0
    hist = res.model_state
    # 20 steps at every=5 -> 4 cadenced snapshots + A0
    assert int(hist.it) == config.n_steps
    assert int(hist.n_recorded) == 1 + config.n_steps // 5
    snaps = history_snapshots(hist)
    np.testing.assert_allclose(snaps[0], np.asarray(m0.A), atol=1e-12)  # A0
    # snapshots differ from A0 (the refit moved the operator) and from each
    # other (distinct iterations)
    assert float(np.max(np.abs(snaps[1] - snaps[0]))) > 1e-12
    assert float(np.max(np.abs(snaps[-1] - snaps[1]))) > 1e-14
    # final fidelity still holds with the wrapper in the carry
    p1 = float(jnp.real(res.xs[3, -1]))
    assert p1 > 0.95, f"final P(|1>) = {p1}"


def test_e_ops_observation_closed_loop():
    """NOT-state prep observed through a Pauli-basis e_ops measurement with
    noise (reference experiment.py:196-211 observation mode): the model is
    re-seeded from expectation values through the dual frame, not the full
    state, and the closed loop still preps |1>."""
    from mpc4quantum_tpu.plants.quantum import quantum_observe

    rho0, model, plant, X_targ, U_targ, Q, R, Qf, config, sat, du = make_not_state_problem()
    si = np.eye(2, dtype=complex)
    sy = np.array([[0, -1j], [1j, 0]], dtype=complex)
    paulis = [si, SX, sy, SZ]
    wq = 2 * np.pi * 4
    plant_eo = m4q.QuantumPlant.create(0.5 * (wq * 0.99 - wq) * SZ, [0.5 * SX],
                                       sigma=1e-4, e_ops=paulis)
    res = m4q.mpc(jnp.asarray(rho0), model, plant_eo, X_targ, U_targ, Q, R, Qf,
                  config, sat=sat, du=du, key=jax.random.PRNGKey(1),
                  observe_fn=quantum_observe)
    assert int(res.exit_code) == 0
    p1 = float(jnp.real(res.xs[3, -1]))
    assert p1 > 0.95, f"final P(|1>) = {p1}"

    # negative assertion (the reference's lossy-on-entangled pattern): an
    # INCOMPLETE observation (populations only) re-seeds the model with
    # zeroed coherences every step; from a diagonal state the population has
    # no first-order control gradient, so the loop must do measurably worse -
    # informational completeness is load-bearing, and the observation model
    # honestly exposes that
    plant_pop = m4q.QuantumPlant.create(0.5 * (wq * 0.99 - wq) * SZ, [0.5 * SX],
                                        e_ops=[si, SZ])
    res2 = m4q.mpc(jnp.asarray(rho0), model, plant_pop, X_targ, U_targ, Q, R, Qf,
                   config, sat=sat, du=du, key=jax.random.PRNGKey(1),
                   observe_fn=quantum_observe)
    p1b = float(jnp.real(res2.xs[3, -1]))
    assert p1b < p1 - 0.2, f"populations-only observation should degrade: {p1b} vs {p1}"


def test_tpu_safe_path_matches_default():
    """The matmul-only TPU-batched configuration (qp_backend='ns',
    sqp_unroll, Taylor expm plant step - no Cholesky/LU/while_loop anywhere
    in the graph) must reproduce the default path's closed loop."""
    import dataclasses
    from mpc4quantum_tpu.plants.quantum import quantum_step_taylor
    from mpc4quantum_tpu.solvers.boxqp import BoxQPParams

    rho0, model, plant, X_targ, U_targ, Q, R, Qf, config, sat, du = make_not_state_problem()
    res_d = m4q.mpc(jnp.asarray(rho0), model, plant, X_targ, U_targ, Q, R, Qf,
                    config, sat=sat, du=du, key=jax.random.PRNGKey(1))
    # the measured iteration budget (see STATUS): fixed 2x60 ADMM + 8 SQP
    # reproduces the adaptive path's pulses to ~3e-3*sat
    cfg_s = dataclasses.replace(config, qp_backend="ns", sqp_unroll=8,
                                qp_params=BoxQPParams(max_iter=60, n_rounds=2))
    res_s = m4q.mpc(jnp.asarray(rho0), model, plant, X_targ, U_targ, Q, R, Qf,
                    cfg_s, sat=sat, du=du, key=jax.random.PRNGKey(1),
                    plant_step_fn=quantum_step_taylor)
    assert int(res_s.exit_code) == 0
    p1_d = float(jnp.real(res_d.xs[3, -1]))
    p1_s = float(jnp.real(res_s.xs[3, -1]))
    assert p1_s > 0.99, p1_s
    # same pulses to solver tolerance
    np.testing.assert_allclose(np.asarray(res_s.us), np.asarray(res_d.us),
                               atol=5e-3 * sat)
    assert abs(p1_s - p1_d) < 1e-3


def test_hostloop_steady_fuse_matches_per_step():
    """steady_fuse=k (k steady steps fused into one program) must leave the
    rollout unchanged - same final states and exit codes as per-step
    dispatch, including the non-divisible tail."""
    import dataclasses
    from mpc4quantum_tpu.mpc.hostloop import HostLoopMPC
    from mpc4quantum_tpu.parallel.fleet import make_scenario_batch
    from mpc4quantum_tpu.plants.quantum import quantum_step_taylor
    from mpc4quantum_tpu.solvers.boxqp import BoxQPParams

    rho0, model, plant, X_targ, U_targ, Q, R, Qf, config, sat, du = make_not_state_problem()
    plants, keys = make_scenario_batch(jax.random.PRNGKey(0), plant, 2, detune_scale=0.01)
    cfg = dataclasses.replace(config, n_steps=7, qp_backend="ns",
                              qp_params=BoxQPParams(max_iter=30, n_rounds=2))
    mk = lambda k, g: HostLoopMPC(cfg, sat, du=du, plant_step_fn=quantum_step_taylor,
                                  warm_sqp_iters=3, granularity=g, steady_fuse=k)
    base = mk(1, "mixed").run(rho0, model, plants, X_targ, U_targ, Q, R, Qf, keys,
                              record=False)
    fuse = mk(3, "mixed").run(rho0, model, plants, X_targ, U_targ, Q, R, Qf, keys,
                              record=False)
    # the bench default: warm steps fused too
    step = mk(3, "step").run(rho0, model, plants, X_targ, U_targ, Q, R, Qf, keys,
                             record=False)
    for out in (fuse, step):
        np.testing.assert_allclose(out["final_x"], base["final_x"], atol=1e-12)
        np.testing.assert_array_equal(out["exit_code"], base["exit_code"])


def test_hostloop_matches_scan_with_nonidentity_lift():
    """Host-loop driver on a plant whose lift is NOT identity (crosstalk
    preset: partial-trace lift, model space dim 8 vs experiment space dim
    16). Regression: the initial SQP guess must be built from lift(x0), not
    x0 (round-2 bug - the flagship's identity lift masked it)."""
    import dataclasses
    from mpc4quantum_tpu import presets
    from mpc4quantum_tpu.mpc.hostloop import HostLoopMPC
    from mpc4quantum_tpu.parallel.fleet import make_scenario_batch, batched_mpc
    from mpc4quantum_tpu.plants.quantum import quantum_step_taylor
    from mpc4quantum_tpu.solvers.boxqp import BoxQPParams

    sc = presets.crosstalk(coupling=0.01)
    plants, keys = make_scenario_batch(jax.random.PRNGKey(0), sc.plant, 2,
                                       detune_scale=0.01)
    # 2x60 ADMM: the 8-dim stacked model's condensed QP needs the full
    # budget to pass acceptance (2x30 exits with QP-failure code 2)
    cfg = dataclasses.replace(sc.config, n_steps=4, qp_backend="ns",
                              qp_params=BoxQPParams(max_iter=60, n_rounds=2))
    cfg_scan = dataclasses.replace(cfg, sqp_unroll=4)
    res_scan = batched_mpc(jnp.asarray(sc.x0), sc.model, plants,
                           sc.X_targ, sc.U_targ, sc.Q, sc.R, sc.Qf,
                           cfg_scan, sc.sat, du=sc.du, keys=keys,
                           plant_step_fn=quantum_step_taylor,
                           lift_fn=sc.lift_fn, proj_fn=sc.proj_fn)
    runner = HostLoopMPC(cfg, sc.sat, du=sc.du,
                         plant_step_fn=quantum_step_taylor,
                         lift_fn=sc.lift_fn, proj_fn=sc.proj_fn,
                         warm_sqp_iters=4)
    out = runner.run(sc.x0, sc.model, plants, sc.X_targ, sc.U_targ,
                     sc.Q, sc.R, sc.Qf, keys)
    np.testing.assert_allclose(out["us"], np.asarray(res_scan.us), atol=1e-8)
    np.testing.assert_allclose(out["final_x"], np.asarray(res_scan.xs[:, :, -1]),
                               atol=1e-8)
    assert np.all(out["exit_code"] == 0)
    assert np.max(np.abs(out["us"])) > 1e-3  # non-vacuous


def test_hostloop_driver_matches_scan_driver():
    """The host-driven chunked driver (mpc/hostloop.py) is built from the
    same make_mpc_step pieces as the scan driver; on a batch of scenarios it
    must reproduce the scan driver's pulses and final states lane-for-lane
    (noiseless plants -> deterministic)."""
    import dataclasses
    from mpc4quantum_tpu.mpc.hostloop import HostLoopMPC
    from mpc4quantum_tpu.parallel.fleet import make_scenario_batch, batched_mpc
    from mpc4quantum_tpu.plants.quantum import quantum_step_taylor
    from mpc4quantum_tpu.solvers.boxqp import BoxQPParams

    rho0, model, plant, X_targ, U_targ, Q, R, Qf, config, sat, du = make_not_state_problem()
    plants, keys = make_scenario_batch(jax.random.PRNGKey(0), plant, 4, detune_scale=0.01)

    # loop-form equivalence holds at ANY budget - run a shortened workload
    # (full-budget closed-loop quality is asserted elsewhere in this file)
    cfg = dataclasses.replace(config, n_steps=8, qp_backend="ns", sqp_unroll=0,
                              qp_params=BoxQPParams(max_iter=30, n_rounds=2))
    # scan driver reference run (same NS backend and taylor plant so the
    # only difference is the loop form)
    cfg_scan = dataclasses.replace(cfg, sqp_unroll=6)
    res_scan = batched_mpc(jnp.asarray(rho0), model, plants, X_targ, U_targ, Q, R, Qf,
                           cfg_scan, sat, du=du, keys=keys,
                           plant_step_fn=quantum_step_taylor)

    runner = HostLoopMPC(cfg, sat, du=du, plant_step_fn=quantum_step_taylor,
                         warm_sqp_iters=6)
    out = runner.run(rho0, model, plants, X_targ, U_targ, Q, R, Qf, keys)

    np.testing.assert_allclose(out["us"], np.asarray(res_scan.us), atol=1e-8)
    np.testing.assert_allclose(out["final_x"], np.asarray(res_scan.xs[:, :, -1]), atol=1e-8)
    np.testing.assert_array_equal(out["exit_code"], np.asarray(res_scan.exit_code))
    # full state-trajectory recording (the reference's [xs, us] contract,
    # reference mpc.py:294-304): per-step states match the scan driver's
    # lane-for-lane, including the prepended x0
    assert out["xs"].shape == np.asarray(res_scan.xs).shape
    np.testing.assert_allclose(out["xs"], np.asarray(res_scan.xs), atol=1e-8)
    # a real pulse was commanded and tracking is under way (non-vacuous)
    assert np.max(np.abs(out["us"])) > 0.01
    assert np.all(out["final_x"][:, 3].real > 0.5)


def test_hostloop_rejects_unknown_granularity():
    """A granularity typo must raise at construction, not silently run (and
    record) the per-SQP path."""
    import pytest
    from mpc4quantum_tpu.mpc.hostloop import HostLoopMPC

    rho0, model, plant, X_targ, U_targ, Q, R, Qf, config, sat, du = make_not_state_problem()
    with pytest.raises(ValueError, match="granularity"):
        HostLoopMPC(config, sat, du=du, granularity="steps")


def test_real_embedded_mode_matches_complex():
    """The real-embedded transform (mpc/embedded.py) must reproduce the
    complex pipeline's closed loop exactly (noiseless): same pulses, same
    final state - the embedding is an algebra isomorphism, not an
    approximation. Runs through the unmodified driver via its hooks."""
    import dataclasses
    from mpc4quantum_tpu.mpc.embedded import embed_problem, unembed_vec
    from mpc4quantum_tpu.plants.quantum import quantum_step_taylor
    from mpc4quantum_tpu.solvers.boxqp import BoxQPParams

    rho0, model, plant, X_targ, U_targ, Q, R, Qf, config, sat, du = make_not_state_problem()
    # the embedding is exact at ANY budget - shortened workload (full-budget
    # quality asserted elsewhere)
    cfg = dataclasses.replace(config, n_steps=8, qp_backend="ns", sqp_unroll=4,
                              qp_params=BoxQPParams(max_iter=30, n_rounds=2))

    res_c = m4q.mpc(jnp.asarray(rho0), model, plant, X_targ, U_targ, Q, R, Qf,
                    cfg, sat=sat, du=du, key=jax.random.PRNGKey(1),
                    plant_step_fn=quantum_step_taylor)

    prob, observe_emb = embed_problem(rho0, np.asarray(model.A), np.asarray(X_targ),
                                      np.asarray(Q), np.asarray(Qf), dim_x=4)
    model_e = dmdc_from_operator(jnp.asarray(prob.model_A), 8, 8,
                                 prob.model_A.shape[1] - 8)
    res_e = m4q.mpc(jnp.asarray(prob.x0), model_e, plant,
                    jnp.asarray(prob.X_targ), U_targ,
                    jnp.asarray(prob.Q), R, jnp.asarray(prob.Qf),
                    cfg, sat=sat, du=du, key=jax.random.PRNGKey(1),
                    plant_step_fn=prob.plant_step_fn, lift_fn=prob.lift_fn,
                    proj_fn=prob.proj_fn, observe_fn=observe_emb)
    assert int(res_e.exit_code) == 0
    np.testing.assert_allclose(np.asarray(res_e.us), np.asarray(res_c.us),
                               atol=1e-6)
    xf_e = np.asarray(unembed_vec(res_e.xs[:, -1]))
    np.testing.assert_allclose(xf_e, np.asarray(res_c.xs[:, -1]), atol=1e-8)
    # a real pulse was commanded and tracking is under way (non-vacuous)
    assert np.max(np.abs(np.asarray(res_e.us))) > 0.01
    assert float(xf_e[3].real) > 0.5


def test_hostloop_pallas_qp_rejects_lqr_solver():
    """qp_impl='pallas' cannot honor solver='lqr' - must raise, not silently
    run the box-QP kernel."""
    import dataclasses
    import pytest
    from mpc4quantum_tpu.mpc.hostloop import HostLoopMPC

    rho0, model, plant, X_targ, U_targ, Q, R, Qf, config, sat, du = make_not_state_problem()
    cfg = dataclasses.replace(config, solver="lqr")
    with pytest.raises(ValueError, match="pallas"):
        HostLoopMPC(cfg, sat, du=du, qp_impl="pallas")


def _slow_mark():
    import os
    import pytest

    return pytest.mark.skipif(not os.environ.get("RUN_SLOW"),
                              reason="~4 min gate-synthesis hostloop run; set RUN_SLOW=1")


@_slow_mark()
def test_hostloop_gate_synthesis_exit_condition():
    """Gate synthesis through the host-loop driver: per-lane exit_condition
    (process cost < 1e-2, reference test_mpc4quantum.py:93-94) must fire
    (code 1) and freeze the lane - the early-exit machinery on the
    production driver form. (On-chip confirmation: all 128 lanes exit in
    experiments/probe_tpu_presets.py 'gate'.)"""
    import dataclasses
    from mpc4quantum_tpu import presets
    from mpc4quantum_tpu.mpc.hostloop import HostLoopMPC
    from mpc4quantum_tpu.plants.synthesis import synthesis_step_taylor
    from mpc4quantum_tpu.parallel.fleet import make_scenario_batch

    sc = presets.not_gate(n_steps=90)
    plants, keys = make_scenario_batch(jax.random.PRNGKey(0), sc.plant, 2,
                                       detune_scale=0.001)
    cfg = dataclasses.replace(sc.config, qp_backend="ns")
    r = HostLoopMPC(cfg, sc.sat, du=sc.du, plant_step_fn=synthesis_step_taylor,
                    lift_fn=sc.lift_fn, proj_fn=sc.proj_fn,
                    exit_condition=sc.exit_condition,
                    warm_sqp_iters=6, granularity="mixed")
    out = r.run(sc.x0, sc.model, plants, sc.X_targ, sc.U_targ,
                sc.Q, sc.R, sc.Qf, keys)
    assert np.all(out["exit_code"] == 1), out["exit_code"]
    assert np.all(out["n_valid"] < cfg.n_steps)
    # process overlap Re<P_targ, P> reaches ~4 (= tr(I_4), perfect gate)
    fid = np.real(out["final_x"] @ np.conj(sc.target_state))
    assert np.all(fid > 3.96), fid
