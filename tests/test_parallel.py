"""Fleet layer: scenario batches under vmap and an 8-device shard_map mesh.

Asserts the sharding contract the reference cannot test (it has no
parallelism): sharded results must equal the single-device vmap results
lane-for-lane."""

import numpy as np
import jax
import jax.numpy as jnp

import mpc4quantum_tpu as m4q
from mpc4quantum_tpu.parallel.fleet import (
    batched_mpc,
    sharded_mpc,
    make_scenario_batch,
    scenario_mesh,
    fleet_summary,
    sharded_fleet_summary,
)
from mpc4quantum_tpu.models.dmdc import dmdc_from_operator

SX = np.array([[0, 1], [1, 0]], dtype=complex)
SZ = np.array([[1, 0], [0, -1]], dtype=complex)


def small_problem(order=1, H=8, n_steps=10):
    units = []
    for i in range(2):
        for j in range(2):
            e = np.zeros((2, 2), complex)
            e[i, j] = 1
            units.append(e)
    dt = 1.0
    A0 = m4q.vectorize_me(np.zeros((2, 2)), units)
    A1 = m4q.vectorize_me(0.5 * SX, units)
    A_dst = m4q.discretize_homogeneous([A0, A1], dt, order)
    model = dmdc_from_operator(jnp.asarray(A_dst), 4, 4, A_dst.shape[1] - 4)

    wq = 2 * np.pi * 4
    base_plant = m4q.QuantumPlant.create(0.5 * (wq * 0.99 - wq) * SZ, [0.5 * SX])

    th = 1e-4
    Rx = np.array([[np.cos(th / 2), -1j * np.sin(th / 2)], [-1j * np.sin(th / 2), np.cos(th / 2)]])
    rho0 = (Rx @ np.diag([1.0, 0.0]).astype(complex) @ Rx.conj().T).flatten()
    targ = np.zeros(4, complex)
    targ[3] = 1.0
    X_targ = jnp.asarray(np.tile(targ[:, None], (1, n_steps + H + 1)))
    U_targ = jnp.zeros((1, n_steps + H))
    Q = jnp.asarray(np.diag([1.0, 0, 0, 1]).astype(complex))
    R = jnp.eye(1) * 0.1
    sat = 2 * np.pi * 0.1
    config = m4q.MPCConfig(horizon=H, n_steps=n_steps, dt=dt, dim_u=1, order=order, max_iter=20)
    return rho0, model, base_plant, X_targ, U_targ, Q, R, Q, config, sat, targ


def test_scenario_batch_construction():
    rho0, model, base_plant, X_targ, U_targ, Q, R, Qf, config, sat, targ = small_problem()
    plants, keys = make_scenario_batch(jax.random.PRNGKey(0), base_plant, 8, detune_scale=0.01)
    assert jax.tree.leaves(plants)[0].shape[0] == 8
    # per-lane H0 actually differs
    H0s = np.asarray(plants.H0)
    assert not np.allclose(H0s[0], H0s[1])


def test_batched_mpc_runs_heterogeneous_scenarios():
    rho0, model, base_plant, X_targ, U_targ, Q, R, Qf, config, sat, targ = small_problem()
    plants, keys = make_scenario_batch(jax.random.PRNGKey(0), base_plant, 4, detune_scale=0.02)
    res = batched_mpc(jnp.asarray(rho0), model, plants, X_targ, U_targ, Q, R, Qf,
                      config, sat, keys=keys)
    assert res.xs.shape == (4, 4, config.n_steps + 1)
    assert res.us.shape == (4, 1, config.n_steps)
    # different detunings -> different pulses
    us = np.asarray(res.us)
    assert not np.allclose(us[0], us[1])
    summ = fleet_summary(res, jnp.asarray(targ))
    assert float(summ["completed_frac"]) == 1.0
    assert float(summ["fidelity_mean"]) > 0.9


def test_sharded_matches_batched():
    rho0, model, base_plant, X_targ, U_targ, Q, R, Qf, config, sat, targ = small_problem()
    n = 8
    plants, keys = make_scenario_batch(jax.random.PRNGKey(1), base_plant, n, detune_scale=0.02)
    mesh = scenario_mesh()
    assert mesh.devices.size == 8, "conftest must provide 8 virtual devices"
    res_b = batched_mpc(jnp.asarray(rho0), model, plants, X_targ, U_targ, Q, R, Qf,
                        config, sat, keys=keys)
    res_s = sharded_mpc(mesh, jnp.asarray(rho0), model, plants, X_targ, U_targ, Q, R, Qf,
                        config, sat, keys=keys)
    # numerical equality, not mere closeness (VERDICT r4 item 4a): each lane
    # is an independent rollout, so sharding may not change the math at all -
    # x64 tolerance 1e-12 on the full trajectory
    np.testing.assert_allclose(np.asarray(res_s.us), np.asarray(res_b.us), atol=1e-12)
    np.testing.assert_allclose(np.asarray(res_s.xs), np.asarray(res_b.xs), atol=1e-12)
    np.testing.assert_array_equal(np.asarray(res_s.exit_code), np.asarray(res_b.exit_code))
    np.testing.assert_array_equal(np.asarray(res_s.n_valid), np.asarray(res_b.n_valid))
    np.testing.assert_allclose(np.asarray(res_s.objs), np.asarray(res_b.objs), atol=1e-12)


def test_sharded_summary_uses_collectives_and_matches_gathered():
    """fleet_summary inside shard_map must (a) actually emit pmean/pmin
    collectives over the mesh axis and (b) equal the gathered reduction."""
    rho0, model, base_plant, X_targ, U_targ, Q, R, Qf, config, sat, targ = small_problem()
    n = 8
    plants, keys = make_scenario_batch(jax.random.PRNGKey(2), base_plant, n, detune_scale=0.02)
    mesh = scenario_mesh()
    res = batched_mpc(jnp.asarray(rho0), model, plants, X_targ, U_targ, Q, R, Qf,
                      config, sat, keys=keys)

    # (a) the lowered program contains cross-device collectives
    jaxpr_str = str(jax.make_jaxpr(
        lambda xs, code, iters: sharded_fleet_summary(
            mesh,
            res._replace(xs=xs, exit_code=code, sqp_iters=iters, model_state=None),
            jnp.asarray(targ),
        )
    )(res.xs, res.exit_code, res.sqp_iters))
    assert ("pmin" in jaxpr_str) or ("min_p" in jaxpr_str), jaxpr_str[-2000:]
    assert ("pmean" in jaxpr_str) or ("psum" in jaxpr_str), jaxpr_str[-2000:]

    # (b) collective reduction == gathered reduction
    summ_g = fleet_summary(res, jnp.asarray(targ))
    summ_c = sharded_fleet_summary(mesh, res, jnp.asarray(targ))
    for k in summ_g:
        np.testing.assert_allclose(
            np.asarray(summ_c[k]), np.asarray(summ_g[k]), rtol=1e-6, atol=1e-6,
            err_msg=k,
        )


def test_sharded_rejects_indivisible_batch():
    rho0, model, base_plant, X_targ, U_targ, Q, R, Qf, config, sat, targ = small_problem()
    plants, keys = make_scenario_batch(jax.random.PRNGKey(1), base_plant, 6)
    mesh = scenario_mesh()
    try:
        sharded_mpc(mesh, jnp.asarray(rho0), model, plants, X_targ, U_targ, Q, R, Qf,
                    config, sat, keys=keys)
        assert False, "expected ValueError"
    except ValueError as e:
        assert "divisible" in str(e)
