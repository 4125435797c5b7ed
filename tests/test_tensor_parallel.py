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


# ---------------------------------------------------------------------------
# TP through the ACTUAL MPC driver (round 4): a dim-64 3-qubit scenario runs
# closed-loop with the model contraction row-sharded over the op axis, and
# must equal the unsharded run exactly.
# ---------------------------------------------------------------------------


def make_3q_scenario(detune=0.99, coupling=0.1):
    """3-qubit (dim_s=8, dim_x=64) state prep |000> -> |111| with ZZ
    couplings and per-qubit X drives - the 4^n-dim workload class the TP
    axis exists for (SURVEY.md section 2.4)."""
    import mpc4quantum_tpu as m4q
    from mpc4quantum_tpu.models.dmdc import dmdc_from_operator
    from mpc4quantum_tpu.plants.quantum import QuantumPlant
    from mpc4quantum_tpu.mpc.driver import MPCConfig
    from mpc4quantum_tpu.ops.liouville import liouville_generator

    X = np.array([[0, 1], [1, 0]], complex)
    Z = np.array([[1, 0], [0, -1]], complex)
    I = np.eye(2, dtype=complex)
    kron3 = lambda a, b, c: np.kron(np.kron(a, b), c)
    H0 = 0.5 * coupling * (kron3(Z, Z, I) + kron3(I, Z, Z))
    H1s = [0.5 * kron3(X, I, I), 0.5 * kron3(I, X, I), 0.5 * kron3(I, I, X)]

    dt, Hh, n_steps, order = 0.5, 8, 6, 1
    A_cts = [np.asarray(liouville_generator(H0))] + [
        np.asarray(liouville_generator(h)) for h in H1s]
    A_dst = np.asarray(m4q.discretize_homogeneous(A_cts, dt, order))
    model = dmdc_from_operator(jnp.asarray(A_dst), 64, 64, A_dst.shape[1] - 64)
    plant = QuantumPlant.create(detune * H0, H1s)

    # perturb the initial state (an exactly diagonal rho has zero
    # population gradient and the QP correctly returns u = 0)
    th = 1e-2
    R1 = np.array([[np.cos(th / 2), -1j * np.sin(th / 2)],
                   [-1j * np.sin(th / 2), np.cos(th / 2)]])
    R = kron3(R1, R1, R1)
    rho0 = np.zeros((8, 8), complex)
    rho0[0, 0] = 1.0
    rho0 = R @ rho0 @ R.conj().T
    targ = np.zeros((8, 8), complex)
    targ[7, 7] = 1.0
    Qd = np.zeros(64)
    Qd[0] = 1.0
    Qd[63] = 1.0
    X_targ = jnp.asarray(np.tile(targ.flatten()[:, None],
                                 (1, n_steps + Hh + 1)))
    U_targ = jnp.zeros((3, n_steps + Hh))
    cfg = MPCConfig(horizon=Hh, n_steps=n_steps, dt=dt, dim_u=3, order=order)
    return dict(x0=jnp.asarray(rho0.flatten()), model_state=model, plant=plant,
                X_targ=X_targ, U_targ=U_targ,
                Q=jnp.asarray(np.diag(Qd).astype(complex)),
                R=jnp.eye(3) * 1e-2, Qf=jnp.asarray(np.diag(Qd).astype(complex)),
                config=cfg, sat=2.5, du=None), targ.flatten()


def test_tp_mpc_closed_loop_matches_dense():
    """Full closed-loop MPC at dim 64 with row-sharded linearize+predict
    (tp_model_fns over a 4-device op mesh) == the unsharded driver."""
    import mpc4quantum_tpu as m4q
    from mpc4quantum_tpu.parallel.tensor import tp_model_fns

    args, targ = make_3q_scenario()
    key = jax.random.PRNGKey(3)
    res_dense = m4q.mpc(**args, key=key)

    mesh = op_mesh(n_op=4)  # 64 rows / 4 shards
    fns = tp_model_fns(mesh, dim_u=3, order=1, dim_x=64)
    res_tp = m4q.mpc(**args, key=key, model_fns=fns)

    assert int(res_tp.exit_code) == int(res_dense.exit_code) == 0
    np.testing.assert_allclose(np.asarray(res_tp.us), np.asarray(res_dense.us),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(res_tp.xs), np.asarray(res_dense.xs),
                               atol=1e-9)
    # and the run actually prepared the state (physics sanity, not parity)
    fid = float(np.real(np.asarray(res_dense.xs)[:, -1] @ targ.conj()))
    assert fid > 0.5, fid


def test_dp_tp_mpc_fleet_matches_dense():
    """DP x TP: a scenario fleet vmapped over lanes WITH the op axis manual
    inside (2-D ("scenarios", "op") mesh; jax shard_map axis_names keeps the
    scenario axis auto) == the unsharded vmapped fleet."""
    import mpc4quantum_tpu as m4q
    from mpc4quantum_tpu.parallel.tensor import op_mesh, tp_model_fns

    args, _ = make_3q_scenario()
    B = 4
    keys = jax.random.split(jax.random.PRNGKey(7), B)
    detunes = 1.0 + 0.01 * np.asarray([-1.0, -0.3, 0.4, 1.2])
    plants = jax.vmap(lambda d: args["plant"].replace(
        H0=args["plant"].H0 * d.astype(args["plant"].H0.dtype)))(
            jnp.asarray(detunes))
    base = {k: v for k, v in args.items() if k != "plant"}

    def run(fns):
        def one(p, k):
            return m4q.mpc(**base, plant=p, key=k, model_fns=fns)
        return jax.vmap(one)(plants, keys)

    res_dense = run(None)
    mesh = op_mesh(n_scenario=2, n_op=4)
    fns = tp_model_fns(mesh, dim_u=3, order=1, dim_x=64)
    res_tp = run(fns)
    np.testing.assert_allclose(np.asarray(res_tp.us), np.asarray(res_dense.us),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(res_tp.xs), np.asarray(res_dense.xs),
                               atol=1e-9)
