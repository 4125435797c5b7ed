"""Open-system (Lindblad) plant: generator oracles, ODE ground truth,
closed-loop preset.

The reference's plant class is qutip.mesolve (reference experiment.py:209),
whose capability includes collapse operators even though its tests run
unitarily. These tests pin the dissipative extension against analytic
solutions and an independent scipy ODE integration (the mesolve-parity
strategy of SURVEY.md section 4).
"""
import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import scipy.integrate

import mpc4quantum_tpu as m4q
from mpc4quantum_tpu import presets
from mpc4quantum_tpu.ops.liouville import dissipator, lindblad_generator
from mpc4quantum_tpu.plants.lindblad import (
    LindbladPlant, lindblad_step, lindblad_step_taylor, lindblad_simulate)

SX = np.array([[0, 1], [1, 0]], complex)
SZ = np.array([[1, 0], [0, -1]], complex)
SM = np.array([[0, 1], [0, 0]], complex)  # sigma_minus (|0><1|): decay to |0>


def test_dissipator_matches_definition():
    """D[L] vec(rho) == vec(L rho L+ - 1/2 {L+L, rho}) on random data."""
    rng = np.random.default_rng(0)
    d = 3
    L = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
    rho = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
    rho = rho + rho.conj().T
    D = np.asarray(dissipator(L))
    got = (D @ rho.reshape(-1)).reshape(d, d)
    LdL = L.conj().T @ L
    want = L @ rho @ L.conj().T - 0.5 * (LdL @ rho + rho @ LdL)
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_lindblad_generator_trace_preserving():
    """tr(d rho/dt) = 0: vec(I) is a left null vector of the generator."""
    rng = np.random.default_rng(1)
    d = 3
    H = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
    H = H + H.conj().T
    Ls = [rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
          for _ in range(2)]
    A = np.asarray(lindblad_generator(H, Ls))
    v = np.eye(d).reshape(-1)  # row-major vec of I picks out the trace
    np.testing.assert_allclose(v @ A, 0.0, atol=1e-10)


def test_pure_decay_analytic():
    """H = 0, L = sqrt(g) sigma_minus: P1(t) = P1(0) e^{-gt}, coherences
    decay at g/2 - the amplitude-damping textbook solution, exactly."""
    g = 0.1
    p = LindbladPlant.create(np.zeros((2, 2)), [0.5 * SX], c_ops=[np.sqrt(g) * SM])
    rho0 = np.array([0.2, 0.3 + 0.1j, 0.3 - 0.1j, 0.8], complex)
    xs = np.asarray(lindblad_simulate(p, jnp.asarray(rho0), jnp.zeros((1, 5)), dt=1.0))
    t = np.arange(6)
    np.testing.assert_allclose(xs[3], 0.8 * np.exp(-g * t), atol=1e-12)
    np.testing.assert_allclose(xs[0], 1.0 - 0.8 * np.exp(-g * t), atol=1e-12)
    np.testing.assert_allclose(xs[1], (0.3 + 0.1j) * np.exp(-g * t / 2), atol=1e-12)


def test_driven_dissipative_vs_scipy_ode():
    """Driven + damped propagation == independent scipy integration of the
    master equation with the same ZOH control (exact up to ODE tolerance)."""
    g = 0.05
    H0 = 0.3 * SZ
    H1 = 0.5 * SX
    plant = LindbladPlant.create(H0, [H1], c_ops=[np.sqrt(g) * SM])
    dt, n = 0.5, 8
    us = 0.4 * np.sin(np.arange(n))[None, :]
    rho0 = np.array([1.0, 0, 0, 0], complex)
    xs = np.asarray(lindblad_simulate(plant, jnp.asarray(rho0), jnp.asarray(us), dt=dt))

    def rhs_factory(u):
        Ht = H0 + u * H1
        LdL = (np.sqrt(g) * SM).conj().T @ (np.sqrt(g) * SM)

        def rhs(t, y):
            rho = y.reshape(2, 2)
            drho = (-1j * (Ht @ rho - rho @ Ht)
                    + g * (SM @ rho @ SM.conj().T)
                    - 0.5 * (LdL @ rho + rho @ LdL))
            return drho.reshape(-1)
        return rhs

    y = rho0.copy()
    for k in range(n):
        sol = scipy.integrate.solve_ivp(rhs_factory(us[0, k]), (0, dt), y,
                                        rtol=1e-10, atol=1e-12)
        y = sol.y[:, -1]
        np.testing.assert_allclose(xs[:, k + 1], y, atol=1e-7)


def test_taylor_step_matches_pade():
    g = 0.02
    plant = LindbladPlant.create(0.2 * SZ, [0.5 * SX], c_ops=[np.sqrt(g) * SM])
    x = jnp.asarray(np.array([0.6, 0.2 - 0.1j, 0.2 + 0.1j, 0.4], complex))
    a = lindblad_step(plant, x, jnp.asarray([0.3]), 1.0)
    b = lindblad_step_taylor(plant, x, jnp.asarray([0.3]), 1.0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)


def test_exact_model_predicts_plant():
    """The order-2 discretized Lindblad model tracks the exact dissipative
    plant over a rollout (tolerance band, mirroring test_vectorization)."""
    sc = presets.lindblad_state(detune=1.0)  # nominal plant == model physics
    us = 0.3 * np.cos(0.7 * np.arange(10))[None, :]
    xs_plant = np.asarray(lindblad_simulate(
        sc.plant, jnp.asarray(sc.x0), jnp.asarray(us), dt=sc.config.dt))
    A = np.asarray(sc.model.A)
    dim_x = 4
    x = np.asarray(sc.x0, complex)
    for k in range(10):
        lift_u = np.array([1.0, us[0, k], us[0, k] ** 2])
        x = A @ np.kron(lift_u, x)
        assert np.max(np.abs(x - xs_plant[:, k + 1])) < 5e-3


def test_lindblad_state_closed_loop():
    """Closed-loop T1-limited state prep: the controller reaches the
    decay-limited fidelity. Physics floor: coherent drive cannot hold
    P(|1>) against amplitude damping (the driven-damped steady state
    saturates at 1/2), so the final fidelity rides the decay envelope from
    the pulse end, ~e^{-gamma (T - t_pi)} ~ 0.91 at gamma=0.005."""
    sc = presets.lindblad_state()
    res = m4q.mpc(**sc.mpc_args(), key=jax.random.PRNGKey(0))
    targ = np.asarray(sc.target_state)
    fid = float(np.real(np.asarray(res.xs)[:, -1] @ targ.conj()))
    assert int(res.exit_code) == 0
    assert fid > 0.90, fid
    # and the controller beats doing nothing after a perfect instant pi
    # pulse at t=0 (pure decay for all 20 steps). The margin is thin by
    # physics: the real pulse takes ~5 steps during which coherences decay
    # too, and the plant is 1% detuned - measured 0.9067 vs 0.9048.
    assert fid > np.exp(-0.005 * sc.config.n_steps)


def test_lindblad_hostloop_fleet():
    """The production hostloop engine runs the dissipative preset (Taylor
    superoperator steps, NS-ADMM QPs) at fleet scale with per-lane
    detunings."""
    from mpc4quantum_tpu.benchfleet import run_hostloop_fleet

    sc = presets.lindblad_state()
    sc = dataclasses.replace(sc, config=dataclasses.replace(
        sc.config, qp_params=sc.config.qp_params.replace(unroll=False)))
    m, _ = run_hostloop_fleet(sc, 8, cpu=True, warm_sqp_iters=(8, 1),
                              granularity="sqp", steady_fuse=1)
    assert m["qp_fail_frac"] == 0.0, m
    assert m["completed_frac"] == 1.0, m
    # worse-detuned lanes transfer slower and ride the decay envelope
    # longer, so the fleet tail sits below the single-rollout fidelity
    # (measured: min 0.878 / mean 0.909 at batch 8)
    assert m["fidelity_min"] > 0.85, m
    assert m["fidelity_mean"] > 0.90, m
