"""Batched expm vs scipy.linalg.expm."""

import numpy as np
import scipy.linalg
import jax.numpy as jnp

from mpc4quantum_tpu.ops.expm import expm_pade, propagators_from_controls, step_generators


def test_expm_matches_scipy_small_norm():
    rng = np.random.default_rng(1)
    A = rng.normal(size=(4, 4)) + 1j * rng.normal(size=(4, 4))
    out = np.asarray(expm_pade(jnp.asarray(A)))
    np.testing.assert_allclose(out, scipy.linalg.expm(A), rtol=1e-10, atol=1e-10)


def test_expm_matches_scipy_large_norm():
    rng = np.random.default_rng(2)
    A = 50.0 * (rng.normal(size=(6, 6)) + 1j * rng.normal(size=(6, 6)))
    out = np.asarray(expm_pade(jnp.asarray(A)))
    ref = scipy.linalg.expm(A)
    np.testing.assert_allclose(out, ref, rtol=1e-8, atol=1e-8 * np.abs(ref).max())


def test_expm_batched_heterogeneous_norms():
    rng = np.random.default_rng(3)
    A = rng.normal(size=(5, 4, 4)) * np.array([0.01, 0.1, 1, 10, 100])[:, None, None]
    out = np.asarray(expm_pade(jnp.asarray(A)))
    for i in range(5):
        np.testing.assert_allclose(
            out[i], scipy.linalg.expm(A[i]), rtol=1e-9, atol=1e-9 * np.abs(scipy.linalg.expm(A[i])).max()
        )


def test_expm_unitarity():
    # expm(-i dt H) for Hermitian H must be unitary
    rng = np.random.default_rng(4)
    M = rng.normal(size=(3, 3)) + 1j * rng.normal(size=(3, 3))
    H = M + M.conj().T
    U = np.asarray(expm_pade(jnp.asarray(-1j * 0.7 * H)))
    np.testing.assert_allclose(U @ U.conj().T, np.eye(3), atol=1e-12)


def test_propagators_from_controls():
    SX = np.array([[0, 1], [1, 0]], dtype=complex)
    SZ = np.array([[1, 0], [0, -1]], dtype=complex)
    H0 = 0.3 * SZ
    H1s = np.stack([0.5 * SX])
    us = np.array([[0.2, -0.8, 1.5]])
    dt = 0.4
    Us = np.asarray(propagators_from_controls(jnp.asarray(H0), jnp.asarray(H1s), jnp.asarray(us), dt))
    assert Us.shape == (3, 2, 2)
    for t in range(3):
        H = H0 + us[0, t] * H1s[0]
        np.testing.assert_allclose(Us[t], scipy.linalg.expm(-1j * dt * H), atol=1e-11)


def test_step_generators_shapes():
    H0 = np.zeros((3, 3), dtype=complex)
    H1s = np.stack([np.eye(3, dtype=complex), 2 * np.eye(3, dtype=complex)])
    us = np.array([[1.0, 2.0], [3.0, 4.0]])
    G = np.asarray(step_generators(jnp.asarray(H0), jnp.asarray(H1s), jnp.asarray(us)))
    np.testing.assert_allclose(G[0], np.eye(3) * (1 + 6))
    np.testing.assert_allclose(G[1], np.eye(3) * (2 + 8))
