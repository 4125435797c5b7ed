"""Oracle tests for Liouville lifting and Dyson discretization.

Oracles mirror the reference test strategy (reference
tests/test_mpc4quantum.py:147-188 `test_discretization` and :215-274
`test_vectorization`), rebuilt without qutip: scipy.linalg.expm and an
adaptive scipy ODE integration serve as independent ground truth.
"""

import numpy as np
import scipy.linalg
import jax.numpy as jnp

from mpc4quantum_tpu.ops.liouville import (
    vectorize_me,
    liouville_generator,
    discretize_homogeneous,
)
from mpc4quantum_tpu.ops.library import control_powers, lift_controls, krtimes

SX = np.array([[0, 1], [1, 0]], dtype=complex)
SY = np.array([[0, -1j], [1j, 0]], dtype=complex)
SZ = np.array([[1, 0], [0, -1]], dtype=complex)


def matrix_units(d):
    basis = []
    for i in range(d):
        for j in range(d):
            e = np.zeros((d, d), dtype=complex)
            e[i, j] = 1.0
            basis.append(e)
    return basis


def test_vectorize_me_matches_kron_formula():
    # With the full |i><j| matrix-unit basis (row-major vec convention),
    # the projected generator equals -i (H (x) I - I (x) H^T).
    rng = np.random.default_rng(0)
    for d in (2, 3):
        M = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
        H = M + M.conj().T  # Hermitian
        A_proj = np.asarray(vectorize_me(H, matrix_units(d)))
        A_kron = np.asarray(liouville_generator(H))
        np.testing.assert_allclose(A_proj, A_kron, atol=1e-10)


def test_vectorize_me_dynamics_match_density_matrix_ode():
    # dx/dt = A x must reproduce d rho/dt = -i[H, rho] entrywise.
    H = 0.3 * SZ + 0.7 * SX
    A = np.asarray(vectorize_me(H, matrix_units(2)))
    rho = np.array([[0.6, 0.2 - 0.1j], [0.2 + 0.1j, 0.4]], dtype=complex)
    lhs = (A @ rho.flatten()).reshape(2, 2)
    rhs = -1j * (H @ rho - rho @ H)
    np.testing.assert_allclose(lhs, rhs, atol=1e-12)


def test_discretize_order1_is_euler():
    # Order-1, dt=1: blocks must equal [I + A0, A1, ..., Au] exactly
    # (the reference's exactness oracle, test_mpc4quantum.py:147-188).
    dt = 1.0
    A0 = np.asarray(vectorize_me(0 * SZ, matrix_units(2)))
    A1 = np.asarray(vectorize_me(SX, matrix_units(2)))
    A2 = np.asarray(vectorize_me(SY, matrix_units(2)))
    A_dst = np.asarray(discretize_homogeneous([A0, A1, A2], dt, order=1))
    expect = np.hstack([np.eye(4) + A0 * dt, A1 * dt, A2 * dt])
    np.testing.assert_allclose(A_dst.real, expect.real, atol=1e-12)
    np.testing.assert_allclose(A_dst.imag, expect.imag, atol=1e-12)


def test_discretize_order_matches_frozen_expm():
    # For frozen u, the Dyson series re-assembled over the monomial library
    # must converge to expm(dt (A0 + u A1)) as order grows.
    H0 = 0.5 * 0.1 * SZ
    H1 = 0.5 * SX
    A0 = np.asarray(liouville_generator(H0))
    A1 = np.asarray(liouville_generator(H1))
    dt = 0.2
    u = 0.7
    exact = scipy.linalg.expm(dt * (A0 + u * A1))
    prev_err = np.inf
    for order in (1, 2, 3, 4):
        A_dst = np.asarray(discretize_homogeneous([A0, A1], dt, order))
        powers = control_powers(order, 1)
        monos = np.array([u ** p[0] for p in powers])
        # reassemble: sum_l f_l(u) * block_l
        approx = sum(monos[l] * A_dst[:, 4 * l : 4 * (l + 1)] for l in range(len(powers)))
        err = np.abs(approx - exact).max()
        assert err < prev_err or err < 1e-12
        prev_err = err
    assert prev_err < 1e-6


def test_discretized_rollout_tracks_ode_truth():
    # Tolerance-band rollout oracle (reference test_vectorization semantics):
    # propagate the order-2 discrete model under a smooth pulse and compare to
    # scipy piecewise-exact propagation of the continuous bilinear system.
    order = 2
    dt = 0.5
    n_steps = 25
    H0 = 0 * SZ
    H1 = 0.5 * SX
    A0 = np.asarray(liouville_generator(H0))
    A1 = np.asarray(liouville_generator(H1))
    A_dst = np.asarray(discretize_homogeneous([A0, A1], dt, order))

    ts = np.arange(n_steps) * dt
    pulse_width = n_steps * dt
    us = (np.blackman(n_steps) * np.cos(0 * ts))[None, :]

    # discrete model rollout: x+ = A_dst @ [x; f(u) (kr) x]
    powers = control_powers(order, 1)[1:]
    lift_us = np.asarray(lift_controls(jnp.asarray(us), powers))
    x = np.zeros(4, dtype=complex)
    x[0] = 1.0  # rho = |0><0|
    xs = [x]
    for i in range(n_steps):
        ux = np.asarray(krtimes(lift_us[:, i : i + 1], xs[-1][:, None]))[:, 0]
        xs.append(A_dst @ np.concatenate([xs[-1], ux]))
    xs = np.stack(xs, axis=1)

    # ground truth: exact ZOH propagation with scipy expm
    x = xs[:, 0].copy()
    xs_true = [x]
    for i in range(n_steps):
        U = scipy.linalg.expm(dt * (A0 + us[0, i] * A1))
        xs_true.append(U @ xs_true[-1])
    xs_true = np.stack(xs_true, axis=1)

    frac_close = np.mean(np.abs(xs - xs_true) < 0.1)
    assert frac_close > 0.9
