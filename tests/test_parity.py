"""Behavior-parity checks: the engine's closed-loop pulses vs an independent
sequential numpy/scipy implementation of the same receding-horizon algorithm
(the CPU baseline in bench.py - linearize, condense, L-BFGS-B box QP, scipy
expm plant). Pulse-level agreement is the strongest evidence that the
TPU-native control path reproduces the reference algorithm's behavior, not
just its end fidelity."""

import numpy as np
import jax
import jax.numpy as jnp

import mpc4quantum_tpu as m4q
from test_mpc_e2e import make_not_state_problem

import importlib.util
import sys
import pathlib

_spec = importlib.util.spec_from_file_location(
    "bench", pathlib.Path(__file__).resolve().parent.parent / "bench.py"
)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def test_engine_pulse_matches_independent_sequential_solver():
    rho0, model, plant, X_targ, U_targ, Q, R, Qf, config, sat, du = make_not_state_problem(order=2)
    res = m4q.mpc(jnp.asarray(rho0), model, plant, X_targ, U_targ, Q, R, Qf,
                  config, sat=sat, du=du, key=jax.random.PRNGKey(1))
    us_engine = np.asarray(res.us)[0]

    # independent implementation (separate derivation, scipy solvers)
    fid_cpu = bench.cpu_baseline_rollout()
    assert fid_cpu > 0.99

    us_ref = bench_last_pulse()
    # same SQP algorithm, different QP solvers and integrators: pulses agree
    # closely in the saturated/active segments and overall shape
    assert us_ref.shape == us_engine.shape
    err = np.max(np.abs(us_engine - us_ref))
    assert err < 0.25 * sat, f"pulse deviation {err} vs sat {sat}"
    # and both must reach the same physical outcome
    assert float(jnp.real(res.xs[3, -1])) > 0.99


def bench_last_pulse():
    """Re-run the bench baseline capturing its applied pulse sequence."""
    import scipy.linalg

    us = []
    orig = bench.cpu_baseline_rollout

    # simplest capture: reimplement the tail of the baseline loop by calling
    # it with a hook - bench exposes no hook, so replicate via monkeypatch of
    # expm to record u? Instead: re-derive by running the baseline and
    # recording through a wrapped plant propagator.
    recorded = []
    real_expm = scipy.linalg.expm

    def recording_expm(M):
        # the baseline calls expm once per applied control with
        # M = -1j*DT*(H0_true + u*0.5*SX); recover u from the (0,1) entry
        out = real_expm(M)
        recorded.append(M)
        return out

    scipy.linalg.expm = recording_expm
    try:
        bench.cpu_baseline_rollout()
    finally:
        scipy.linalg.expm = real_expm
    u_list = []
    for M in recorded:
        # M[0,1] = -1j*DT*u*0.5 -> u = M[0,1] / (-0.5j*DT)
        u_list.append(float((M[0, 1] / (-0.5j * bench.DT)).real))
    return np.asarray(u_list)
