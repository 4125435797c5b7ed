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
