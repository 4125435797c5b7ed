"""Fleet layer: scenario-batch parallelism over a TPU device mesh.

This is the axis the reference does not have (it is single-process,
single-scenario; SURVEY.md section 2.4): thousands of MPC rollouts -
parameter draws, noise realizations, initial states - run as one batched
program. Composition:

    mpc (lax.scan driver)  --vmap-->  batched_mpc  --shard_map-->  sharded_mpc

Per-lane plant parameters (detunings, crosstalk, noise scale) are pytree
*data*, so a scenario batch is just a stacked QuantumPlant. Heterogeneous
early exits are masked per lane inside the driver (exit codes are data), so
the fleet never diverges. Cross-chip reductions for summary metrics ride ICI
collectives (`psum` inside shard_map).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..mpc.driver import mpc, MPCConfig, MPCResult


def scenario_mesh(devices=None, axis_name: str = "scenarios") -> Mesh:
    """1-D device mesh over all (or the given) devices."""
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), (axis_name,))


def make_scenario_batch(key, base_plant, n: int, detune_scale: float = 0.01,
                        drive_scale: float = 0.0):
    """Build a batch of plants with perturbed Hamiltonian parameters.

    Draws per-scenario drift perturbations H0 -> H0 * (1 + eps_detune) and
    optional drive-amplitude perturbations H1 -> H1 * (1 + eps_drive) -
    the "1k sampled detuning/amplitude perturbations" workload
    (BASELINE.json config 2; reference analogue: the hand-coded 1% detuning
    at test_mpc4quantum.py:637-639).

    :return: (plants, keys): a stacked plant pytree with leading axis n and a
        (n, 2) array of per-scenario PRNG keys.
    """
    k_det, k_drv, k_sim = jax.random.split(key, 3)
    eps_det = detune_scale * jax.random.normal(k_det, (n,))
    eps_drv = drive_scale * jax.random.normal(k_drv, (n,))

    if hasattr(base_plant, "AH0"):
        # LindbladPlant: perturb the COHERENT drift/drive superoperators (the
        # Liouville commutators are linear in H, so scaling them == scaling
        # the Hamiltonians); the dissipator stays physical.
        def make(eps_d, eps_a):
            return base_plant.replace(
                AH0=base_plant.AH0 * (1.0 + eps_d).astype(base_plant.AH0.dtype),
                A1s=base_plant.A1s * (1.0 + eps_a).astype(base_plant.A1s.dtype),
            )
    else:
        def make(eps_d, eps_a):
            return base_plant.replace(
                H0=base_plant.H0 * (1.0 + eps_d).astype(base_plant.H0.dtype),
                H1s=base_plant.H1s * (1.0 + eps_a).astype(base_plant.H1s.dtype),
            )

    plants = jax.vmap(make)(eps_det, eps_drv)
    keys = jax.random.split(k_sim, n)
    return plants, keys


def batched_mpc(x0, model_state, plants, X_targ, U_targ, Q, R, Qf,
                config: MPCConfig, sat, du=None, keys=None, **mpc_kwargs) -> MPCResult:
    """vmap the full MPC rollout over a scenario batch.

    Batched axes: plants (stacked pytree) and keys; x0 may be (dim_e,) shared
    or (n, dim_e) per-scenario. Model/targets/costs are broadcast.
    """
    n = jax.tree.leaves(plants)[0].shape[0]
    keys = jax.random.split(jax.random.PRNGKey(0), n) if keys is None else keys
    x0 = jnp.asarray(x0)
    x0_axis = 0 if x0.ndim == 2 else None

    def run(x0_i, plant_i, key_i):
        return mpc(x0_i, model_state, plant_i, X_targ, U_targ, Q, R, Qf,
                   config, sat=sat, du=du, key=key_i, **mpc_kwargs)

    return jax.vmap(run, in_axes=(x0_axis, 0, 0))(x0, plants, keys)


def sharded_mpc(mesh: Mesh, x0, model_state, plants, X_targ, U_targ, Q, R, Qf,
                config: MPCConfig, sat, du=None, keys=None, axis_name: str = "scenarios",
                **mpc_kwargs) -> MPCResult:
    """Shard the scenario batch over a device mesh with shard_map.

    The batch axis must be divisible by the mesh size. Each device runs its
    shard of scenarios with the per-lane vmap; no cross-device communication
    is needed in the rollout itself (embarrassingly parallel over ICI-attached
    chips) - collectives appear only in summary reductions (fleet_summary).
    """
    n = jax.tree.leaves(plants)[0].shape[0]
    n_dev = mesh.devices.size
    if n % n_dev != 0:
        raise ValueError(f"scenario batch {n} not divisible by mesh size {n_dev}")
    keys = jax.random.split(jax.random.PRNGKey(0), n) if keys is None else keys
    x0 = jnp.asarray(x0)
    x0_spec = P(axis_name) if x0.ndim == 2 else P()

    def shard_fn(x0_s, plants_s, keys_s):
        return batched_mpc(x0_s, model_state, plants_s, X_targ, U_targ, Q, R, Qf,
                           config, sat, du=du, keys=keys_s, **mpc_kwargs)

    out_specs = MPCResult(
        xs=P(axis_name), us=P(axis_name), exit_code=P(axis_name), n_valid=P(axis_name),
        objs=P(axis_name), sqp_iters=P(axis_name), model_A=P(axis_name),
        model_state=jax.tree.map(lambda _: P(axis_name), model_state),
    )
    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(x0_spec, P(axis_name), P(axis_name)),
        out_specs=out_specs,
        # replicated inputs (shared x0/model) mix with per-lane plants inside
        # the scan carry; skip the varying-axis check rather than pcast every
        # carry leaf
        check_vma=False,
    )
    return fn(x0, plants, keys)


def fleet_summary(result: MPCResult, target, axis_name: Optional[str] = None):
    """Batch summary metrics, reduced with ICI collectives when sharded.

    Called plainly (axis_name=None), reduces over the local batch axis with
    jnp reductions. Called *inside shard_map* with the mesh axis name, each
    device reduces its shard locally and the shards are combined with
    `lax.pmean`/`lax.pmin` over the named axis - the cross-chip reduction
    rides ICI (equal shard sizes make pmean-of-means exact).

    :param target: (dim_e,) target state; fidelity proxy is
        Re <target, x_final> (exact population overlap for diagonal targets).
    :param axis_name: mesh axis to psum over when called inside shard_map.
    :return: dict of scalars: mean/min fidelity, completion fraction,
        mean SQP iterations.
    """
    xf = result.xs[..., -1]
    fid = jnp.real(jnp.einsum("...d,d->...", xf, jnp.conj(jnp.asarray(target))))
    ok = (result.exit_code == 0) | (result.exit_code == 1)

    def _mean(v):
        m = jnp.mean(v)
        return jax.lax.pmean(m, axis_name) if axis_name is not None else m

    def _min(v):
        m = jnp.min(v)
        return jax.lax.pmin(m, axis_name) if axis_name is not None else m

    return {
        "fidelity_mean": _mean(fid),
        "fidelity_min": _min(fid),
        "completed_frac": _mean(ok.astype(jnp.float32)),
        "sqp_iters_mean": _mean(result.sqp_iters.astype(jnp.float32)),
    }


def sharded_fleet_summary(mesh: Mesh, result: MPCResult, target,
                          axis_name: str = "scenarios"):
    """Summary metrics of a fleet result with the cross-device reduction done
    by ICI collectives: each device reduces its scenario shard locally, then
    one `pmean`/`pmin` per metric combines the shards over the mesh axis.

    This is the communication pattern SURVEY.md section 5.8 prescribes - the
    rollouts themselves are embarrassingly parallel; only O(1) scalars per
    metric cross the interconnect.
    """
    fid_target = jnp.asarray(target)

    def fn(xs, code, iters):
        partial_res = MPCResult(
            xs=xs, us=xs, exit_code=code, n_valid=code,
            objs=xs, sqp_iters=iters, model_A=xs, model_state=None,
        )
        return fleet_summary(partial_res, fid_target, axis_name=axis_name)

    shf = shard_map(
        fn, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(axis_name)),
        out_specs=P(),
    )
    return shf(result.xs, result.exit_code, result.sqp_iters)
