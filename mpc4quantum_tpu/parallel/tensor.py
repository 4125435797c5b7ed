"""Tensor-parallel layer: shard the Liouville operator contraction.

The scenario fleet (parallel/fleet.py) is the data-parallel axis. This
module opens the second mesh axis SURVEY.md section 2.4 reserves for large
state spaces: an n-qubit Liouville operator has dim_x = 4^n (64 at 3 qubits,
1024 at 5), and the bilinear model application

    x+ = A_x x + A_u (f(u) (x) x)      (models/dmdc.predict)

is a (dim_x, dim_x * L) contraction whose FLOPs and weights grow as 16^n.
Sharding: the stacked operator A is split by ROWS over the "op" mesh axis
(weights never replicated), the state x is replicated; each device computes
its row block of x+ and one `all_gather` over ICI re-forms the full state
for the next step. This is the standard megatron-style row-parallel pattern
- one collective per application, traffic O(dim_x) vs O(dim_x^2 L) compute.

Composes with the fleet: a 2-D ("scenarios", "op") mesh runs DP x TP -
scenario shards on one axis, operator rows on the other.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.library import krtimes


def op_mesh(n_scenario: int | None = None, n_op: int | None = None,
            devices: Sequence | None = None) -> Mesh:
    """Build a ("scenarios", "op") 2-D mesh (or 1-D ("op",) when
    n_scenario is None) over the given/available devices."""
    devices = jax.devices() if devices is None else list(devices)
    if n_scenario is None:
        n_op = len(devices) if n_op is None else n_op
        return Mesh(np.asarray(devices[:n_op]), ("op",))
    n_op = len(devices) // n_scenario if n_op is None else n_op
    grid = np.asarray(devices[: n_scenario * n_op]).reshape(n_scenario, n_op)
    return Mesh(grid, ("scenarios", "op"))


def row_sharded_predict(mesh: Mesh, A, lift_x, lift_ux, axis_name: str = "op"):
    """One row-parallel bilinear model application.

    :param A: (dim_x, dim_x * L) stacked operator; rows sharded over
        `axis_name` (dim_x divisible by the axis size).
    :param lift_x: (dim_x,) lifted state (replicated).
    :param lift_ux: (dim_x * (L - 1),) control-state Khatri-Rao lift.
    :return: (dim_x,) next lifted state, fully replicated on exit.
    """
    n_shards = dict(zip(mesh.axis_names, mesh.devices.shape))[axis_name]
    if lift_x.shape[0] % n_shards != 0:
        raise ValueError(
            f"dim_x={lift_x.shape[0]} not divisible by the '{axis_name}' "
            f"axis size {n_shards}")

    def fn(A_blk, x, ux):
        z = jnp.concatenate([x, ux])
        local = A_blk @ z  # my row block of x+
        return jax.lax.all_gather(local, axis_name, tiled=True)

    return shard_map(
        fn, mesh=mesh,
        in_specs=(P(axis_name, None), P(), P()),
        out_specs=P(),
        # the all_gather over the only axis makes the output replicated, but
        # the static checker cannot always infer that - same opt-out as
        # parallel/fleet.py
        check_vma=False,
    )(A, lift_x, lift_ux)


def row_sharded_rollout(mesh: Mesh, A, lift_u_fn, x0, us,
                        axis_name: str = "op"):
    """Closed model rollout with the operator row-sharded over the mesh.

    The scan stays on-chip; each step is (local row-block matmul) +
    (one tiled all_gather over ICI). Weights are loaded once, never
    replicated - the memory-capacity axis for 4^n-dim operators.

    :param A: (dim_x, dim_x * L) stacked operator.
    :param lift_u_fn: (dim_u, 1) -> (L, 1) monomial lift (BilinearModel.lift_u).
    :param x0: (dim_x,) initial lifted state.
    :param us: (dim_u, n) controls.
    :return: (dim_x, n + 1) trajectory (replicated).
    """
    dim_x = x0.shape[0]
    # precompute the control lifts outside the shard (tiny)
    lifts = jax.vmap(lambda u: lift_u_fn(u.reshape(-1, 1))[:, 0], in_axes=1)(us)  # (n, L)

    def fn(A_blk, x0_r, lifts_r):
        def step(x, fu):
            ux = krtimes(fu.reshape(-1, 1).astype(x.dtype), x.reshape(-1, 1))[:, 0]
            z = jnp.concatenate([x, ux])
            local = A_blk @ z
            x_next = jax.lax.all_gather(local, axis_name, tiled=True)
            return x_next, x_next

        _, xs = jax.lax.scan(step, x0_r, lifts_r)
        return jnp.concatenate([x0_r[None, :], xs], axis=0).T

    return shard_map(
        fn, mesh=mesh,
        in_specs=(P(axis_name, None), P(), P()),
        out_specs=P(),
        check_vma=False,
    )(A, x0, lifts)


def tp_model_fns(mesh: Mesh, dim_u: int, order: int, dim_x: int,
                 axis_name: str = "op"):
    """Row-sharded implementations of the driver's operator contractions.

    Returns a `mpc.driver.ModelApplyFns` whose `linearize` and `predict`
    run with the stacked model operator A (dim_x, dim_x * L) split by ROWS
    over the `axis_name` mesh axis - the megatron-style row-parallel
    pattern of `row_sharded_predict`, applied to the two contraction sites
    inside the MPC step itself (VERDICT r3 item 7: TP through the ACTUAL
    driver, not just an open-loop rollout). Every output row of the
    per-step Jacobians (A_t, B_t, Delta_t) and of the model prediction
    depends only on the same row of A (ops/bilinear.py math), so each
    device computes its row block and one all_gather per application
    re-forms the full arrays; the QP, plant, and costs downstream are
    unchanged driver code.

    With a 2-D ("scenarios", "op") mesh, pass axis_names-restricted manual
    collectives: only `axis_name` is manual here (jax 0.9 shard_map
    `axis_names`), so an outer scenario vmap/sharding composes - DP x TP.

    :param dim_x: full model-space dimension (rows of A; must divide by the
        op-axis size).
    """
    from ..ops.library import (control_powers, lift_controls,
                               diff_library_powers, diff_lift_controls)
    from ..utils.linalg import cx_mm
    from ..mpc.driver import ModelApplyFns

    powers = control_powers(order, dim_u)[1:]
    Lm = len(powers)
    dpowers, dcoefs = diff_library_powers(order, dim_u)
    lift_u = lambda us: lift_controls(us, powers)
    manual = frozenset({axis_name})

    def linearize(model_A, X, U):
        """(A_s, B_s, D_s) == ops/bilinear.model_along_traj on the full A,
        computed row-block-locally + one all_gather per output."""
        H = U.shape[1]
        polyu = lift_u(U)                              # (Lm, H) real
        dpolyu = diff_lift_controls(U, dpowers, dcoefs)  # (dim_u, Lm, H)

        def fn(A_blk):
            dxl = A_blk.shape[0]
            A_loc = A_blk[:, :dim_x]                      # (dxl, dim_x)
            N_loc = A_blk[:, dim_x:].reshape(dxl, Lm, dim_x)
            # A_t rows: A + sum_l f_l(u_t) N_l     (H, dxl, dim_x)
            N_flat = jnp.transpose(N_loc, (1, 0, 2)).reshape(Lm, dxl * dim_x)
            A_s = A_loc[None] + cx_mm(polyu.T, N_flat).reshape(H, dxl, dim_x)
            # B_t rows via (N x)_t                  (H, dxl, dim_u)
            NX = cx_mm(N_loc.reshape(dxl * Lm, dim_x), X)
            NX = jnp.transpose(NX.reshape(dxl, Lm, H), (2, 0, 1))
            B_s = cx_mm(NX, jnp.transpose(dpolyu, (2, 1, 0)))
            D_s = -cx_mm(B_s, jnp.transpose(U, (1, 0))[:, :, None])[:, :, 0]
            g = lambda a, ax: jax.lax.all_gather(a, axis_name, axis=ax, tiled=True)
            return g(A_s, 1), g(B_s, 1), g(D_s, 1)

        return shard_map(
            fn, mesh=mesh, in_specs=(P(axis_name, None),),
            out_specs=(P(), P(), P()), axis_names=manual, check_vma=False,
        )(model_A)

    def predict(model_A, lift_x, ux):
        def fn(A_blk, x, uxr):
            local = (cx_mm(A_blk[:, :dim_x], x.reshape(-1, 1))
                     + cx_mm(A_blk[:, dim_x:], uxr.reshape(-1, 1)))[:, 0]
            return jax.lax.all_gather(local, axis_name, tiled=True)

        return shard_map(
            fn, mesh=mesh, in_specs=(P(axis_name, None), P(), P()),
            out_specs=P(), axis_names=manual, check_vma=False,
        )(model_A, lift_x, ux)

    return ModelApplyFns(linearize=linearize, predict=predict, lift_u=lift_u)


def dp_tp_rollout(mesh: Mesh, A, lift_u_fn, x0, us_batch,
                  scenario_axis: str = "scenarios", op_axis: str = "op"):
    """DP x TP: scenario batch sharded over one mesh axis, operator rows over
    the other. Each (scenario-shard, op-shard) device computes its row block
    for its scenarios; the all_gather runs over the op axis only (subgroups
    of the 2-D mesh), so scenario shards never communicate.

    :param us_batch: (B, dim_u, n) per-scenario controls (B divisible by the
        scenario axis size).
    :return: (B, dim_x, n + 1) trajectories.
    """
    lifts = jax.vmap(jax.vmap(lambda u: lift_u_fn(u.reshape(-1, 1))[:, 0], in_axes=1))(
        us_batch)  # (B, n, L)

    def fn(A_blk, x0_r, lifts_b):
        def one(lifts_r):
            def step(x, fu):
                ux = krtimes(fu.reshape(-1, 1).astype(x.dtype), x.reshape(-1, 1))[:, 0]
                z = jnp.concatenate([x, ux])
                local = A_blk @ z
                x_next = jax.lax.all_gather(local, op_axis, tiled=True)
                return x_next, x_next

            _, xs = jax.lax.scan(step, x0_r, lifts_r)
            return jnp.concatenate([x0_r[None, :], xs], axis=0).T

        return jax.vmap(one)(lifts_b)

    return shard_map(
        fn, mesh=mesh,
        in_specs=(P(op_axis, None), P(), P(scenario_axis)),
        out_specs=P(scenario_axis),
        check_vma=False,
    )(A, x0, lifts)
