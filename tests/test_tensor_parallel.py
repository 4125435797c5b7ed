"""Tensor-parallel operator sharding (parallel/tensor.py) on the virtual
8-device mesh: row-sharded contractions must equal the dense forms exactly,
communicate via all_gather only, and compose with the scenario axis."""

import numpy as np
import jax
import jax.numpy as jnp

from mpc4quantum_tpu.ops.bilinear import BilinearModel
from mpc4quantum_tpu.parallel.tensor import (
    op_mesh, row_sharded_predict, row_sharded_rollout, dp_tp_rollout)


def make_problem(dim_x=64, dim_u=2, order=1, seed=0):
    """A 3-qubit-scale (dim 4^3) random stable bilinear model."""
    rng = np.random.default_rng(seed)
    L = BilinearModel.library_size(order, dim_u) if hasattr(BilinearModel, "library_size") else None
    from mpc4quantum_tpu.ops.library import size_of_library

    L = size_of_library(order, dim_u)
    A = rng.normal(size=(dim_x, dim_x * L)) + 1j * rng.normal(size=(dim_x, dim_x * L))
    A = A / (2.0 * dim_x)  # keep rollouts bounded
    A[:, :dim_x] += 0.5 * np.eye(dim_x)
    bm = BilinearModel.from_stacked(jnp.asarray(A[:, :dim_x]),
                                    jnp.asarray(A[:, dim_x:]), dim_u, order)
    x0 = rng.normal(size=dim_x) + 1j * rng.normal(size=dim_x)
    x0 = x0 / np.linalg.norm(x0)
    return jnp.asarray(A), bm, jnp.asarray(x0)


def dense_rollout(A, bm, x0, us):
    from mpc4quantum_tpu.ops.library import krtimes

    xs = [x0]
    for t in range(us.shape[1]):
        fu = bm.lift_u(us[:, t].reshape(-1, 1))[:, 0]
        ux = krtimes(fu.reshape(-1, 1).astype(x0.dtype), xs[-1].reshape(-1, 1))[:, 0]
        xs.append(A @ jnp.concatenate([xs[-1], ux]))
    return jnp.stack(xs, axis=1)


def test_row_sharded_predict_matches_dense():
    A, bm, x0 = make_problem()
    mesh = op_mesh()  # 1-D over all 8 virtual devices
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.normal(size=(2,)))
    fu = bm.lift_u(u.reshape(-1, 1))[:, 0]
    from mpc4quantum_tpu.ops.library import krtimes

    ux = krtimes(fu.reshape(-1, 1).astype(x0.dtype), x0.reshape(-1, 1))[:, 0]
    out = row_sharded_predict(mesh, A, x0, ux)
    ref = A @ jnp.concatenate([x0, ux])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-12)


def test_row_sharded_predict_uses_all_gather():
    A, bm, x0 = make_problem(dim_x=16)
    mesh = op_mesh()
    ux = jnp.zeros(16 * 2, x0.dtype)
    jaxpr = jax.make_jaxpr(
        lambda a, x, u: row_sharded_predict(mesh, a, x, u))(A[:16, :48], x0[:16], ux)
    assert "all_gather" in str(jaxpr), "row-parallel predict must gather over ICI"


def test_row_sharded_rollout_matches_dense():
    A, bm, x0 = make_problem()
    mesh = op_mesh()
    rng = np.random.default_rng(2)
    us = jnp.asarray(rng.normal(size=(2, 7)) * 0.3)
    out = row_sharded_rollout(mesh, A, bm.lift_u, x0, us)
    ref = dense_rollout(A, bm, x0, us)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-10)


def test_dp_tp_rollout_matches_dense():
    """2-D (scenarios=4, op=2) mesh: DP x TP composition, scenario shards
    never communicate, op shards gather."""
    A, bm, x0 = make_problem()
    mesh = op_mesh(n_scenario=4, n_op=2)
    rng = np.random.default_rng(3)
    B = 8
    us_batch = jnp.asarray(rng.normal(size=(B, 2, 5)) * 0.3)
    out = dp_tp_rollout(mesh, A, bm.lift_u, x0, us_batch)
    for b in range(B):
        ref = dense_rollout(A, bm, x0, us_batch[b])
        np.testing.assert_allclose(np.asarray(out[b]), np.asarray(ref), atol=1e-10)
