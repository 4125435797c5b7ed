"""Plant oracles: expm propagation vs scipy adaptive ODE integration,
lift/proj adapter exactness (the reference's test_partialTrace contract),
and gate-synthesis process-space round trips."""

import numpy as np
import scipy.integrate
import scipy.linalg
import jax
import jax.numpy as jnp

from mpc4quantum_tpu.plants.quantum import (
    QuantumPlant,
    LiftKind,
    lift_state,
    proj_state,
    quantum_step,
    quantum_simulate,
    partial_trace_lift,
    tensor_proj,
    truncate_lift,
)
from mpc4quantum_tpu.plants.synthesis import (
    SynthesisPlant,
    lift_unitary,
    proj_process,
    synthesis_simulate,
)
from mpc4quantum_tpu.plants.classical import VanDerPol, Rotor, rk4_simulate

SX = np.array([[0, 1], [1, 0]], dtype=complex)
SY = np.array([[0, -1j], [1j, 0]], dtype=complex)
SZ = np.array([[1, 0], [0, -1]], dtype=complex)


def random_dm(rng, d):
    M = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
    rho = M @ M.conj().T
    return rho / np.trace(rho)


def test_quantum_simulate_matches_ode():
    # ZOH expm propagation vs scipy adaptive integration of the master eq.
    H0 = 0.3 * SZ
    H1 = 0.5 * SX
    plant = QuantumPlant.create(H0, [H1])
    dt = 0.4
    n = 10
    rng = np.random.default_rng(0)
    us = rng.normal(size=(1, n))
    rho0 = random_dm(rng, 2)

    xs = np.asarray(quantum_simulate(plant, jnp.asarray(rho0.flatten()), jnp.asarray(us), dt))

    def rhs(t, y):
        rho = y.reshape(2, 2)
        k = min(int(t / dt), n - 1)
        H = H0 + us[0, k] * H1
        return (-1j * (H @ rho - rho @ H)).flatten()

    sol = scipy.integrate.solve_ivp(rhs, [0, n * dt], rho0.flatten(), t_eval=np.arange(n + 1) * dt,
                                    rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(xs, sol.y, atol=1e-6)


def test_quantum_simulate_linear_interp_matches_ode():
    """interp='linear' (reference experiment.py:87 interp1d kind='linear'
    control stitching into mesolve) vs scipy integration of the master
    equation under the SAME linearly-interpolated drive, plus: second-order
    substep convergence, and exact collapse to the ZOH path on a constant
    drive."""
    H0 = 0.3 * SZ
    H1 = 0.5 * SX
    plant = QuantumPlant.create(H0, [H1])
    dt = 0.4
    n = 10
    rng = np.random.default_rng(1)
    us = rng.normal(size=(1, n))
    rho0 = random_dm(rng, 2)

    def rhs(t, y):
        rho = y.reshape(2, 2)
        k = min(int(t / dt), n - 1)
        u0 = us[0, k]
        u1 = us[0, min(k + 1, n - 1)]  # last segment holds u_{n-1}
        u = u0 + (u1 - u0) * (t / dt - k)
        H = H0 + u * H1
        return (-1j * (H @ rho - rho @ H)).flatten()

    sol = scipy.integrate.solve_ivp(rhs, [0, n * dt], rho0.flatten(),
                                    t_eval=np.arange(n + 1) * dt,
                                    rtol=1e-11, atol=1e-13)

    errs = {}
    for S in (8, 16, 32):
        xs = np.asarray(quantum_simulate(plant, jnp.asarray(rho0.flatten()),
                                         jnp.asarray(us), dt,
                                         interp="linear", substeps=S))
        errs[S] = np.max(np.abs(xs - sol.y))
        # trace/unitarity preserved exactly by construction
        tr = xs.reshape(2, 2, n + 1)[(0, 1), (0, 1), :].sum(axis=0)
        np.testing.assert_allclose(tr, 1.0, atol=1e-12)
    assert errs[32] < 1e-5, errs
    # exponential-midpoint rule: O(substeps^-2) convergence
    assert errs[8] / errs[32] > 8.0, errs

    # a constant drive makes linear == zoh exactly (same propagator chain)
    uc = np.full((1, n), 0.37)
    x_lin = np.asarray(quantum_simulate(plant, jnp.asarray(rho0.flatten()),
                                        jnp.asarray(uc), dt,
                                        interp="linear", substeps=4))
    x_zoh = np.asarray(quantum_simulate(plant, jnp.asarray(rho0.flatten()),
                                        jnp.asarray(uc), dt))
    np.testing.assert_allclose(x_lin, x_zoh, atol=1e-12)


def test_quantum_simulate_preserves_trace_and_hermiticity():
    plant = QuantumPlant.create(0.1 * SZ, [0.5 * SX, 0.5 * SY])
    rng = np.random.default_rng(1)
    us = rng.normal(size=(2, 20))
    rho0 = random_dm(rng, 2)
    xs = np.asarray(quantum_simulate(plant, jnp.asarray(rho0.flatten()), jnp.asarray(us), 0.3))
    for t in range(xs.shape[1]):
        rho = xs[:, t].reshape(2, 2)
        assert abs(np.trace(rho) - 1) < 1e-10
        np.testing.assert_allclose(rho, rho.conj().T, atol=1e-10)


def test_quantum_step_consistent_with_simulate():
    plant = QuantumPlant.create(0.2 * SZ, [0.5 * SX])
    rng = np.random.default_rng(2)
    rho0 = random_dm(rng, 2).flatten()
    u = np.array([0.7])
    one = np.asarray(quantum_step(plant, jnp.asarray(rho0), jnp.asarray(u), 0.5))
    traj = np.asarray(quantum_simulate(plant, jnp.asarray(rho0), jnp.asarray(u[:, None]), 0.5))
    np.testing.assert_allclose(one, traj[:, 1], atol=1e-12)


def test_measurement_noise_scale():
    plant = QuantumPlant.create(0 * SZ, [SX], sigma=1e-2)
    rho0 = np.eye(2, dtype=complex).flatten() / 2
    us = jnp.zeros((1, 5))
    key = jax.random.PRNGKey(0)
    noisy = np.asarray(quantum_simulate(plant, jnp.asarray(rho0), us, 0.1, key=key))
    clean = np.asarray(quantum_simulate(plant, jnp.asarray(rho0), us, 0.1))
    err = np.abs(noisy - clean)
    assert err.max() > 1e-4 and err.max() < 1e-1


def test_partial_trace_exact_on_product_states():
    # reference test_partialTrace contract (test_mpc4quantum.py:190-213)
    rng = np.random.default_rng(3)
    for d in (2, 4):
        a, b = random_dm(rng, d), random_dm(rng, d)
        c = np.kron(a, b)
        ab = np.asarray(partial_trace_lift(jnp.asarray(c.flatten())))
        np.testing.assert_allclose(ab, np.concatenate([a.flatten(), b.flatten()]), atol=1e-12)
        back = np.asarray(tensor_proj(jnp.asarray(ab)))
        np.testing.assert_allclose(back, c.flatten(), atol=1e-12)


def test_partial_trace_lossy_on_entangled_states():
    rng = np.random.default_rng(4)
    for d in (2, 4):
        rho = random_dm(rng, d * d)  # generically entangled
        ab = np.asarray(partial_trace_lift(jnp.asarray(rho.flatten())))
        back = np.asarray(tensor_proj(jnp.asarray(ab)))
        assert not np.allclose(back, rho.flatten(), atol=1e-6)


def test_truncate_lift():
    rng = np.random.default_rng(5)
    rho3 = random_dm(rng, 3)
    out = np.asarray(truncate_lift(jnp.asarray(rho3.flatten()), 3, 2))
    sub = rho3[:2, :2]
    np.testing.assert_allclose(out.reshape(2, 2), sub / np.trace(sub), atol=1e-12)


def test_plant_lift_proj_dispatch():
    plant = QuantumPlant.create(np.zeros((4, 4), complex), [np.kron(SX, np.eye(2))],
                                lift_kind=LiftKind.PARTIAL_TRACE)
    rng = np.random.default_rng(6)
    a, b = random_dm(rng, 2), random_dm(rng, 2)
    c = np.kron(a, b).flatten()
    z = np.asarray(lift_state(plant, jnp.asarray(c)))
    assert z.shape == (8,)
    back = np.asarray(proj_state(plant, jnp.asarray(z)))
    np.testing.assert_allclose(back, c, atol=1e-12)


def test_synthesis_lift_proj_roundtrip():
    rng = np.random.default_rng(7)
    M = rng.normal(size=(2, 2)) + 1j * rng.normal(size=(2, 2))
    U = scipy.linalg.expm(-1j * (M + M.conj().T))  # random unitary
    p = np.asarray(lift_unitary(jnp.asarray(U.flatten())))
    V = np.asarray(proj_process(jnp.asarray(p))).reshape(2, 2)
    # recover up to global phase: align phases then compare
    phase = (V.conj() * U).sum()
    phase /= abs(phase)
    np.testing.assert_allclose(V * phase, U, atol=1e-10)
    # and the process matrices must agree exactly
    p2 = np.asarray(lift_unitary(jnp.asarray(V.flatten())))
    np.testing.assert_allclose(p2, p, atol=1e-10)


def test_synthesis_simulate_matches_propagator():
    H0 = 0.5 * np.pi * SZ * 0  # zero drift
    H1 = 0.5 * SX
    plant = SynthesisPlant.create(H0, [H1])
    dt = 0.2
    us = np.array([[1.0, 0.5, -0.3]])
    p0 = np.asarray(lift_unitary(jnp.asarray(np.eye(2, dtype=complex).flatten())))
    ps = np.asarray(synthesis_simulate(plant, jnp.asarray(p0), jnp.asarray(us), dt))
    # ground truth: sequential expm products
    U = np.eye(2, dtype=complex)
    for t in range(3):
        U = scipy.linalg.expm(-1j * dt * (H0 + us[0, t] * H1)) @ U
        pt = np.kron(U, U.conj()).flatten()
        # process matrices are phase-invariant - compare directly
        np.testing.assert_allclose(ps[:, t + 1], pt, atol=1e-9)


def test_vanderpol_rk4_matches_scipy():
    plant = VanDerPol(mu=1.5, substeps=32)
    x0 = np.array([0.5, -0.2])
    us = np.array([[0.3, -0.1, 0.0, 0.2]])
    dt = 0.25
    xs = np.asarray(rk4_simulate(plant, jnp.asarray(x0), jnp.asarray(us), dt))

    def rhs(t, y):
        k = min(int(t / dt), 3)
        u = us[0, k]
        return [y[1], -y[0] + 1.5 * (1 - y[0] ** 2) * y[1] + u]

    sol = scipy.integrate.solve_ivp(rhs, [0, 1.0], x0, t_eval=np.arange(5) * dt,
                                    rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(xs, sol.y, atol=1e-6)


def test_rotor_energy_conservation():
    plant = Rotor(epsilon=0.1, substeps=16)
    x0 = np.array([1.0, 0.0])
    us = np.zeros((1, 10))
    xs = np.asarray(rk4_simulate(plant, jnp.asarray(x0), jnp.asarray(us), 0.3))
    radii = np.linalg.norm(xs, axis=0)
    np.testing.assert_allclose(radii, 1.0, atol=1e-8)


# ---------------------------------------------------------------------------
# e_ops expectation-value observation (reference experiment.py:196-211)
# ---------------------------------------------------------------------------


def _paulis():
    si = np.eye(2, dtype=complex)
    sx = np.array([[0, 1], [1, 0]], dtype=complex)
    sy = np.array([[0, -1j], [1j, 0]], dtype=complex)
    sz = np.array([[1, 0], [0, -1]], dtype=complex)
    return [si, sx, sy, sz]


def test_e_ops_expectations_match_trace_formula():
    """quantum_expectations == tr(E_i rho) computed directly."""
    from mpc4quantum_tpu.plants.quantum import QuantumPlant, quantum_expectations

    rng = np.random.default_rng(0)
    M = rng.normal(size=(2, 2)) + 1j * rng.normal(size=(2, 2))
    rho = M @ M.conj().T
    rho = rho / np.trace(rho)
    e_ops = _paulis()
    plant = QuantumPlant.create(np.zeros((2, 2)), [0.5 * e_ops[1]], e_ops=e_ops)
    exps = np.asarray(quantum_expectations(plant, jnp.asarray(rho.flatten())))
    expected = np.array([np.trace(E @ rho) for E in e_ops])
    np.testing.assert_allclose(exps, expected, atol=1e-12)


def test_e_ops_simulate_returns_expectation_trajectory():
    """With e_ops set, quantum_simulate returns the (n_e, n+1) expectation
    trajectory instead of states (reference res.expect mode)."""
    from mpc4quantum_tpu.plants.quantum import QuantumPlant, quantum_simulate

    sx = _paulis()[1]
    sz = _paulis()[3]
    plant_st = QuantumPlant.create(0.3 * sz, [0.5 * sx])
    plant_eo = QuantumPlant.create(0.3 * sz, [0.5 * sx], e_ops=[sz])
    rho0 = np.diag([1.0, 0.0]).astype(complex).flatten()
    us = jnp.asarray(0.2 * np.ones((1, 5)))
    xs = np.asarray(quantum_simulate(plant_st, jnp.asarray(rho0), us, 0.5))
    ez = np.asarray(quantum_simulate(plant_eo, jnp.asarray(rho0), us, 0.5))
    assert ez.shape == (1, 6)
    # <sz> from the state trajectory
    expected = np.array([np.trace(sz @ xs[:, t].reshape(2, 2)) for t in range(6)])
    np.testing.assert_allclose(ez[0], expected, atol=1e-10)


def test_e_ops_observe_reconstructs_state_when_complete():
    """quantum_observe with an informationally complete e_ops list (Pauli
    basis) reconstructs vec(rho) exactly (noiseless), and with noise sigma the
    deviation scales with sigma through the dual frame."""
    from mpc4quantum_tpu.plants.quantum import QuantumPlant, quantum_observe

    rng = np.random.default_rng(1)
    M = rng.normal(size=(2, 2)) + 1j * rng.normal(size=(2, 2))
    rho = M @ M.conj().T
    rho = rho / np.trace(rho)
    x = jnp.asarray(rho.flatten())
    plant = QuantumPlant.create(np.zeros((2, 2)), [0.5 * _paulis()[1]],
                                sigma=0.0, e_ops=_paulis())
    x_rec = np.asarray(quantum_observe(plant, x))
    np.testing.assert_allclose(x_rec, rho.flatten(), atol=1e-12)

    # incomplete list -> projection, trace information survives via identity
    plant_inc = QuantumPlant.create(np.zeros((2, 2)), [0.5 * _paulis()[1]],
                                    e_ops=[_paulis()[0], _paulis()[3]])
    x_inc = np.asarray(quantum_observe(plant_inc, x))
    rho_inc = x_inc.reshape(2, 2)
    np.testing.assert_allclose(np.trace(rho_inc), 1.0, atol=1e-12)
    np.testing.assert_allclose(np.diag(rho_inc), np.diag(rho), atol=1e-12)

    # noisy observation deviates ~ sigma
    plant_n = QuantumPlant.create(np.zeros((2, 2)), [0.5 * _paulis()[1]],
                                  sigma=1e-3, e_ops=_paulis())
    x_noisy = np.asarray(quantum_observe(plant_n, x, key=jax.random.PRNGKey(0)))
    dev = np.max(np.abs(x_noisy - np.asarray(x)))
    assert 1e-5 < dev < 1e-1
