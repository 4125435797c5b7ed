"""Lane-batched Pallas box-QP kernel vs the XLA ADMM solver and scipy
(interpret mode on CPU; small n to bound the unrolled kernel size)."""

import os

import numpy as np
import pytest
import jax.numpy as jnp
import scipy.optimize

from mpc4quantum_tpu.ops.pallas_qp import boxqp_pallas

# interpret-mode execution of the fully-unrolled ADMM kernel takes minutes;
# the pallas test runs with RUN_SLOW=1 (or on real TPU hardware)
slow = pytest.mark.skipif(not os.environ.get("RUN_SLOW"),
                          reason="interpret-mode kernel test is slow; set RUN_SLOW=1")


def make_batch(B, n, seed):
    rng = np.random.default_rng(seed)
    G = rng.normal(size=(B, n, n)).astype(np.float32)
    P = np.einsum("bij,bkj->bik", G, G) + 0.5 * np.eye(n, dtype=np.float32)
    q = rng.normal(size=(B, n)).astype(np.float32) * 2
    lb = -np.abs(rng.normal(size=(B, n))).astype(np.float32)
    ub = np.abs(rng.normal(size=(B, n))).astype(np.float32)
    return P, q, lb, ub


def scipy_ref(P, q, lb, ub):
    out = np.zeros_like(q)
    for b in range(P.shape[0]):
        fun = lambda x: 0.5 * x @ P[b] @ x + q[b] @ x
        jac = lambda x: P[b] @ x + q[b]
        res = scipy.optimize.minimize(fun, np.clip(np.zeros_like(q[b]), lb[b], ub[b]),
                                      jac=jac, method="L-BFGS-B",
                                      bounds=list(zip(lb[b], ub[b])),
                                      options={"ftol": 1e-14, "maxiter": 3000})
        out[b] = res.x
    return out


@slow
def test_pallas_qp_matches_scipy_batch():
    P, q, lb, ub = make_batch(4, 5, seed=0)
    x = np.asarray(boxqp_pallas(jnp.asarray(P), jnp.asarray(q), jnp.asarray(lb),
                                jnp.asarray(ub), iters=200, tile_b=128, interpret=True))
    x_ref = scipy_ref(P, q, lb, ub)
    # feasibility
    assert np.all(x >= lb - 1e-5) and np.all(x <= ub + 1e-5)
    # objective within tolerance of the reference optimum
    for b in range(4):
        f = 0.5 * x[b] @ P[b] @ x[b] + q[b] @ x[b]
        f_ref = 0.5 * x_ref[b] @ P[b] @ x_ref[b] + q[b] @ x_ref[b]
        assert f <= f_ref + 1e-3 * (1 + abs(f_ref)), (b, f, f_ref)
    np.testing.assert_allclose(x, x_ref, atol=5e-3)


def _admm_mirror(P, q, lb, ub, iters=200, rho_scale=0.1, sigma=1e-6, alpha=1.6):
    """Plain-numpy mirror of exactly the kernel's algorithm (unpivoted
    Gauss-Jordan inverse + fixed-iteration relaxed ADMM)."""
    n = P.shape[0]
    rho = max(rho_scale * np.trace(P) / n, 1e-8)
    Kinv = np.linalg.inv(P + (sigma + rho) * np.eye(n))
    x = np.clip(np.zeros(n), lb, ub)
    z = x.copy()
    y = np.zeros(n)
    for _ in range(iters):
        x = Kinv @ (sigma * x - q + rho * z - y)
        z_arg = alpha * x + (1 - alpha) * z
        z = np.clip(z_arg + y / rho, lb, ub)
        y = y + rho * (z_arg - z)
    return z


def test_kernel_algorithm_numpy_mirror_matches_scipy():
    # validates the kernel's *algorithm* (the pallas wiring is exercised by
    # the slow interpret test / real hardware)
    P, q, lb, ub = make_batch(4, 6, seed=3)
    for b in range(4):
        x = _admm_mirror(P[b].astype(np.float64), q[b].astype(np.float64),
                         lb[b].astype(np.float64), ub[b].astype(np.float64))
        ref = scipy_ref(P[b:b+1].astype(np.float64), q[b:b+1].astype(np.float64),
                        lb[b:b+1].astype(np.float64), ub[b:b+1].astype(np.float64))[0]
        np.testing.assert_allclose(x, ref, atol=2e-3)



