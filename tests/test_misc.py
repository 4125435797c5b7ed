"""Coverage for small parity helpers: clock, filename encoding, trimming,
real/complex embeddings, and the QP-failure exit path."""

import numpy as np
import jax
import jax.numpy as jnp

import mpc4quantum_tpu as m4q
from mpc4quantum_tpu.mpc.clock import StepClock, val_to_str
from mpc4quantum_tpu.mpc.driver import trim
from mpc4quantum_tpu.utils.linalg import (
    complex_to_real, real_to_complex, complex_to_real_op, real_to_complex_op,
    isqrt, split_blocks, cx_solve,
)
from test_mpc_e2e import make_not_state_problem


def test_val_to_str_reference_format():
    # reference mpc.py:64-68: 2.0 -> '2d0e00', -0.5 -> 'm5d0em01'
    assert val_to_str(2.0) == "2d0e00"
    assert val_to_str(-0.5) == "m5d0em01"
    assert val_to_str(1e-3) == "1d0em03"


def test_step_clock_windows():
    clock = StepClock(dt=0.5, horizon=4, n_steps=10, measure_freq=2)
    np.testing.assert_allclose(clock.ts, np.arange(10) * 0.5)
    # ts_step spans the last measure_freq steps ending at (step+1)*dt
    np.testing.assert_allclose(clock.ts_step(3), [1.0, 1.5, 2.0])
    np.testing.assert_allclose(clock.ts_horizon(2), [1.0, 1.5, 2.0, 2.5])
    assert clock.to_string().startswith("mf_2d0e00_dt_5d0em01")


def test_complex_real_embeddings_roundtrip():
    rng = np.random.default_rng(0)
    z = rng.normal(size=6) + 1j * rng.normal(size=6)
    np.testing.assert_allclose(np.asarray(real_to_complex(complex_to_real(z))), z)
    P = rng.normal(size=(3, 3)) + 1j * rng.normal(size=(3, 3))
    P_r = complex_to_real_op(P)
    np.testing.assert_allclose(np.asarray(real_to_complex_op(P_r)), P)
    # operator embedding represents complex matvec
    x = rng.normal(size=3) + 1j * rng.normal(size=3)
    np.testing.assert_allclose(
        np.asarray(real_to_complex(P_r @ complex_to_real(x))), P @ x, atol=1e-12
    )


def test_isqrt_and_split_blocks():
    assert isqrt(16) == 4 and isqrt(1) == 1
    M = np.arange(16).reshape(4, 4)
    blocks = np.asarray(split_blocks(jnp.asarray(M), 2, 2))
    assert blocks.shape == (4, 2, 2)
    np.testing.assert_array_equal(blocks[0], [[0, 1], [4, 5]])
    np.testing.assert_array_equal(blocks[1], [[2, 3], [6, 7]])


def test_cx_solve_matches_numpy():
    rng = np.random.default_rng(1)
    A = rng.normal(size=(5, 5)) + 1j * rng.normal(size=(5, 5)) + 5 * np.eye(5)
    B = rng.normal(size=(5, 2)) + 1j * rng.normal(size=(5, 2))
    X = np.asarray(cx_solve(jnp.asarray(A), jnp.asarray(B)))
    np.testing.assert_allclose(A @ X, B, atol=1e-10)


def test_trim_cuts_to_executed_steps():
    rho0, model, plant, X_targ, U_targ, Q, R, Qf, config, sat, du = make_not_state_problem()

    def exit_cond(x_next, x, u):
        return jnp.real(x[3]) > 0.9

    res = m4q.mpc(jnp.asarray(rho0), model, plant, X_targ, U_targ, Q, R, Qf,
                  config, sat=sat, du=du, key=jax.random.PRNGKey(1),
                  exit_condition=exit_cond)
    xs, us = trim(res)
    n = int(res.n_valid)
    assert int(res.exit_code) == 1
    # reference early-exit slicing (mpc.py:298-304): a code-1 exit DROPS the
    # last attempted entry - the control that triggered the exit and the
    # resulting state - so n-1 controls and n states survive
    assert us.shape[1] == n - 1
    assert xs.shape[1] == n
    # a normal completion keeps everything
    res0 = m4q.mpc(jnp.asarray(rho0), model, plant, X_targ, U_targ, Q, R, Qf,
                   config, sat=sat, du=du, key=jax.random.PRNGKey(1))
    xs0, us0 = trim(res0)
    assert us0.shape[1] == int(res0.n_valid) == config.n_steps
    assert xs0.shape[1] == config.n_steps + 1


def test_qp_failure_sets_exit_code_2():
    # poison the model operator with NaN: the QP cannot converge and the
    # driver must stop with exit code 2 (reference mpc.py:193-196) without
    # crashing the (batchable) program
    rho0, model, plant, X_targ, U_targ, Q, R, Qf, config, sat, du = make_not_state_problem()
    bad = model.replace(A=model.A.at[0, 0].set(jnp.nan))
    res = m4q.mpc(jnp.asarray(rho0), bad, plant, X_targ, U_targ, Q, R, Qf,
                  config, sat=sat, du=du, key=jax.random.PRNGKey(1))
    assert int(res.exit_code) in (2, 3)
    assert int(res.n_valid) == 0


def test_not_state_in_f32_tpu_native_precision():
    # the TPU-native dtype path: complex64/f32 end-to-end (the suite
    # otherwise runs x64 for oracle parity)
    jax.config.update("jax_enable_x64", False)
    try:
        rho0, model, plant, X_targ, U_targ, Q, R, Qf, config, sat, du = make_not_state_problem()
        model32 = model.replace(A=jnp.asarray(np.asarray(model.A), jnp.complex64))
        plant32 = jax.tree.map(
            lambda a: jnp.asarray(np.asarray(a), jnp.complex64) if np.iscomplexobj(np.asarray(a))
            else jnp.asarray(np.asarray(a), jnp.float32), plant)
        res = m4q.mpc(jnp.asarray(np.asarray(rho0), jnp.complex64), model32, plant32,
                      jnp.asarray(np.asarray(X_targ), jnp.complex64),
                      jnp.asarray(np.asarray(U_targ), jnp.float32),
                      jnp.asarray(np.asarray(Q), jnp.complex64),
                      jnp.asarray(np.asarray(R), jnp.float32),
                      jnp.asarray(np.asarray(Qf), jnp.complex64),
                      config, sat=sat, du=du, key=jax.random.PRNGKey(1))
        p1 = float(jnp.real(res.xs[3, -1]))
        assert p1 > 0.99, f"f32 path degraded: P1={p1}"
    finally:
        jax.config.update("jax_enable_x64", True)


def test_plot_operator_and_rollout(tmp_path):
    """Diagnostic plotting (reference plot_operator counterpart,
    test_mpc4quantum.py:25-41): figures build and PNGs land on disk."""
    from mpc4quantum_tpu.utils.plotting import plot_operator, plot_rollout

    rho0, model, plant, X_targ, U_targ, Q, R, Qf, config, sat, du = make_not_state_problem()
    op_png = tmp_path / "op.png"
    fig, axes = plot_operator(np.asarray(model.A), 4, path=str(op_png))
    assert op_png.exists() and op_png.stat().st_size > 0
    # one quick closed loop for rollout panels
    res = m4q.mpc(jnp.asarray(rho0), model, plant, X_targ, U_targ, Q, R, Qf,
                  config, sat=sat, du=du, key=jax.random.PRNGKey(1))
    targ = np.zeros(4, complex)
    targ[3] = 1.0
    roll_png = tmp_path / "roll.png"
    ts = np.arange(config.n_steps) * config.dt
    plot_rollout(ts, np.asarray(res.us), xs=np.asarray(res.xs), targ=targ,
                 sat=sat, path=str(roll_png))
    assert roll_png.exists() and roll_png.stat().st_size > 0
