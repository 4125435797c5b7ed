"""Analytic Jacobians of the bilinear model vs jax.jacfwd autodiff."""

import numpy as np
import jax
import jax.numpy as jnp

from mpc4quantum_tpu.ops.liouville import liouville_generator, discretize_homogeneous
from mpc4quantum_tpu.ops.bilinear import (
    BilinearModel,
    bilinear_f,
    bilinear_df_dx,
    bilinear_df_du,
    model_along_traj,
    model_from_initial,
)

SX = np.array([[0, 1], [1, 0]], dtype=complex)
SY = np.array([[0, -1j], [1j, 0]], dtype=complex)
SZ = np.array([[1, 0], [0, -1]], dtype=complex)


def make_model(order=2, dim_u=2, dt=0.3):
    A0 = np.asarray(liouville_generator(0.1 * SZ))
    A1 = np.asarray(liouville_generator(0.5 * SX))
    A2 = np.asarray(liouville_generator(0.5 * SY))
    ops = [A0, A1, A2][: dim_u + 1]
    A_dst = np.asarray(discretize_homogeneous(ops, dt, order))
    dim_x = 4
    A_op = jnp.asarray(A_dst[:, :dim_x])
    N_op = jnp.asarray(A_dst[:, dim_x:])
    return BilinearModel.from_stacked(A_op, N_op, dim_u, order)


def test_from_stacked_validates_library_dim():
    model = make_model()
    try:
        BilinearModel.from_stacked(model.A, model.N.reshape(model.dim_x, -1), dim_u=1, order=1)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_df_dx_matches_autodiff():
    model = make_model()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=4) + 1j * rng.normal(size=4))
    u = jnp.asarray(rng.normal(size=2))
    J_analytic = np.asarray(bilinear_df_dx(model, u))
    # holomorphic in x: jacfwd on the complex state
    J_auto = np.asarray(jax.jacfwd(lambda xx: bilinear_f(model, xx, u), holomorphic=True)(x))
    np.testing.assert_allclose(J_analytic, J_auto, atol=1e-11)


def test_df_du_matches_autodiff():
    model = make_model()
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=4) + 1j * rng.normal(size=4))
    u = jnp.asarray(rng.normal(size=2))
    J_analytic = np.asarray(bilinear_df_du(model, x, u))
    J_auto = np.asarray(jax.jacfwd(lambda uu: bilinear_f(model, x, uu))(u))
    np.testing.assert_allclose(J_analytic, J_auto, atol=1e-11)


def test_affine_model_is_exact_at_linearization_point():
    # Delta + A x + B u must equal f(x, u) exactly at the linearization point.
    model = make_model()
    rng = np.random.default_rng(2)
    H = 5
    X = jnp.asarray(rng.normal(size=(4, H)) + 1j * rng.normal(size=(4, H)))
    U = jnp.asarray(rng.normal(size=(2, H)))
    A_s, B_s, D_s = model_along_traj(model, X, U)
    assert A_s.shape == (H, 4, 4) and B_s.shape == (H, 4, 2) and D_s.shape == (H, 4)
    for t in range(H):
        pred = np.asarray(D_s[t] + A_s[t] @ X[:, t] + B_s[t] @ U[:, t].astype(A_s.dtype))
        np.testing.assert_allclose(pred, np.asarray(bilinear_f(model, X[:, t], U[:, t])), atol=1e-11)


def test_model_from_initial_freezes_step0():
    model = make_model()
    rng = np.random.default_rng(3)
    X = jnp.asarray(rng.normal(size=(4, 4)) + 1j * rng.normal(size=(4, 4)))
    U = jnp.asarray(rng.normal(size=(2, 4)))
    A_s, B_s, D_s = model_from_initial(model, X, U)
    A_ref, B_ref, D_ref = model_along_traj(model, X, U)
    for t in range(4):
        np.testing.assert_allclose(np.asarray(A_s[t]), np.asarray(A_ref[0]), atol=1e-13)
        np.testing.assert_allclose(np.asarray(B_s[t]), np.asarray(B_ref[0]), atol=1e-13)
        np.testing.assert_allclose(np.asarray(D_s[t]), np.asarray(D_ref[0]), atol=1e-13)


def test_order1_linearization_recovers_affine_structure():
    # At order 1 the model is x+ = A x + sum_i u_i N_i x: df_dx = A + sum u_i N_i.
    model = make_model(order=1, dim_u=1)
    u = jnp.asarray(np.array([0.37]))
    J = np.asarray(bilinear_df_dx(model, u))
    expect = np.asarray(model.A) + 0.37 * np.asarray(model.N[:, 0, :])
    np.testing.assert_allclose(J, expect, atol=1e-13)
