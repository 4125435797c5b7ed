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
