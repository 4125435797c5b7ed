"""Pallas fused batched-expm kernel vs scipy (interpret mode on CPU).

Kept small: interpret mode executes the fully-unrolled kernel op-by-op.
Real-TPU execution is exercised by bench/profiling runs, not unit tests.
"""

import numpy as np
import jax.numpy as jnp
import scipy.linalg

from mpc4quantum_tpu.ops.pallas_expm import expm_pallas


def test_pallas_expm_matches_scipy_d2():
    rng = np.random.default_rng(0)
    A = (rng.normal(size=(3, 2, 2)) + 1j * rng.normal(size=(3, 2, 2)))
    A = A * np.array([0.1, 1.0, 8.0]).reshape(3, 1, 1)
    out = np.asarray(expm_pallas(jnp.asarray(A, jnp.complex64), max_squarings=6,
                                 tile_b=128, interpret=True))
    for i in range(3):
        ref = scipy.linalg.expm(A[i])
        np.testing.assert_allclose(out[i], ref, atol=2e-5 * max(1, np.abs(ref).max()))


def test_pallas_expm_real_input():
    rng = np.random.default_rng(1)
    A = rng.normal(size=(2, 2, 2)) * 0.5
    out = np.asarray(expm_pallas(jnp.asarray(A, jnp.float32), max_squarings=4,
                                 tile_b=128, interpret=True))
    for i in range(2):
        np.testing.assert_allclose(out[i], scipy.linalg.expm(A[i]), atol=1e-5)


slow = __import__("pytest").mark.skipif(
    not __import__("os").environ.get("RUN_SLOW"),
    reason="interpret-mode e2e is slow; set RUN_SLOW=1")


@slow
def test_hostloop_pallas_plant_impl_plumbing():
    """plant_impl='pallas': the fleet's one-step plant propagators computed
    by one expm kernel call per advance, end-to-end through the host-loop
    driver (interpret mode on CPU). The kernel step is the same exact ZOH
    propagation as quantum_step, so the rollout must match plant_impl='xla'
    - controls, states, and exit codes."""
    import sys
    import pathlib
    import dataclasses

    import jax
    import mpc4quantum_tpu as m4q
    from mpc4quantum_tpu.mpc.hostloop import HostLoopMPC
    from mpc4quantum_tpu.plants.quantum import quantum_step_taylor
    from mpc4quantum_tpu.parallel.fleet import make_scenario_batch

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
    from test_mpc_e2e import make_not_state_problem

    rho0, model, plant, X_targ, U_targ, Q, R, Qf, config, sat, du = make_not_state_problem()
    plants, keys = make_scenario_batch(jax.random.PRNGKey(0), plant, 2, detune_scale=0.01)
    # small shapes: interpret-mode compile of unrolled kernels explodes
    # superlinearly (see test_pallas_qp.py); max_squarings=2 suffices at
    # ||dt H|| < 1 and keeps the unrolled squaring chain short
    cfg = dataclasses.replace(config, horizon=6, n_steps=2, qp_backend="ns")

    mk = lambda plant_impl, interp: HostLoopMPC(
        cfg, sat, du=du, plant_step_fn=quantum_step_taylor, warm_sqp_iters=2,
        plant_impl=plant_impl, pallas_interpret=interp, pallas_max_squarings=2)
    out_p = mk("pallas", True).run(rho0, model, plants, X_targ, U_targ, Q, R, Qf, keys)
    out_x = mk("xla", False).run(rho0, model, plants, X_targ, U_targ, Q, R, Qf, keys)
    np.testing.assert_array_equal(out_p["exit_code"], out_x["exit_code"])
    np.testing.assert_allclose(out_p["us"], out_x["us"], atol=1e-4)
    np.testing.assert_allclose(out_p["final_x"], out_x["final_x"], atol=1e-4)
    assert np.max(np.abs(out_x["us"])) > 0.01  # non-vacuous


def test_pallas_expm_certified_norm_budget():
    """max_squarings=0 + taylor_k=12: the norm-bound fleet budget form
    (benchfleet auto expm budget) - the kernel drops the norm/scale/squaring
    chain entirely under the caller's ||A||_1 <= 0.8 certificate."""
    rng = np.random.default_rng(2)
    A = (rng.normal(size=(4, 3, 3)) + 1j * rng.normal(size=(4, 3, 3)))
    A = A * (0.75 / np.max(np.sum(np.abs(A), axis=-2), axis=-1)).reshape(4, 1, 1)
    out = np.asarray(expm_pallas(jnp.asarray(A, jnp.complex64), max_squarings=0,
                                 taylor_k=12, tile_b=128, interpret=True))
    for i in range(4):
        ref = scipy.linalg.expm(A[i])
        np.testing.assert_allclose(out[i], ref, atol=2e-6 * max(1, np.abs(ref).max()))
