"""Scratch: riccati_kinv vs numpy inverse of the condensed Hessian (x64)."""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

from mpc4quantum_tpu.solvers.condense import qp_data
from mpc4quantum_tpu.solvers.riccati import (
    embed_ltv, embed_costs, riccati_kinv_shifted)

rng = np.random.default_rng(0)

for (H, dx, du) in [(5, 3, 2), (10, 4, 1), (7, 2, 3), (4, 3, 4)]:
    n = H * du
    A_s = 0.3 * (rng.standard_normal((H, dx, dx)) + 1j * rng.standard_normal((H, dx, dx)))
    A_s += np.eye(dx)
    B_s = 0.5 * (rng.standard_normal((H, dx, du)) + 1j * rng.standard_normal((H, dx, du)))
    D_s = 0.1 * (rng.standard_normal((H, dx)) + 1j * rng.standard_normal((H, dx)))
    x0 = rng.standard_normal(dx) + 1j * rng.standard_normal(dx)
    # Hermitian PSD Q (singular sometimes), terminal different
    Qs = []
    for t in range(H + 1):
        W = rng.standard_normal((dx, dx)) + 1j * rng.standard_normal((dx, dx))
        Q = W @ W.conj().T
        if t % 2 == 0:
            Q[0, :] = 0; Q[:, 0] = 0  # singular rows like leakage costs
        Qs.append(Q)
    Q_s = np.stack(Qs)
    Rs = []
    for t in range(H):
        W = rng.standard_normal((du, du))
        Rs.append(W @ W.T + 0.1 * np.eye(du))
    R_s = np.stack(Rs)
    X_bm = rng.standard_normal((dx, H + 1)) + 1j * rng.standard_normal((dx, H + 1))
    U_bm = rng.standard_normal((du, H))

    P, q, lb, ub, w, M = qp_data(jnp.asarray(x0), jnp.asarray(X_bm), jnp.asarray(U_bm),
                                 jnp.asarray(Q_s), jnp.asarray(R_s),
                                 jnp.asarray(A_s), jnp.asarray(B_s), jnp.asarray(D_s),
                                 sat=1.0)
    P = np.asarray(P)
    P = 0.5 * (P + P.T)
    sigma, rho = 1e-6, 0.37
    K = P + (sigma + rho) * np.eye(n)
    Kinv_np = np.linalg.inv(K)

    Ar, Br = embed_ltv(jnp.asarray(A_s), jnp.asarray(B_s))
    Qr, Rr = embed_costs(jnp.asarray(Q_s), jnp.asarray(R_s))
    for unroll in (False, True):
        Kinv_r = np.asarray(riccati_kinv_shifted(Ar, Br, Qr, Rr, rho, sigma,
                                                 unroll=unroll))
        err = np.max(np.abs(Kinv_r - Kinv_np))
        res = np.max(np.abs(np.eye(n) - K @ Kinv_r))
        print(f"H={H} dx={dx} du={du} unroll={unroll}: "
              f"max|dKinv|={err:.2e}  ||I-K Kinv||={res:.2e}")
        assert res < 1e-9, res

    # scaled variant
    dg = np.sqrt(np.maximum(np.diag(P), 1e-12))
    d = 1.0 / dg
    Ks = np.diag(d) @ P @ np.diag(d) + (sigma + rho) * np.eye(n)
    Kinv_s_np = np.linalg.inv(Ks)
    Kinv_s = np.asarray(riccati_kinv_shifted(Ar, Br, Qr, Rr, rho, sigma,
                                             d=jnp.asarray(d), unroll=False))
    res = np.max(np.abs(np.eye(n) - Ks @ Kinv_s))
    print(f"  scaled: ||I-K Kinv||={res:.2e}")
    assert res < 1e-9, res

print("ALL OK")
