"""Weak-scaling harness on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

import mpc4quantum_tpu as m4q
from mpc4quantum_tpu.parallel.fleet import make_scenario_batch, sharded_mpc
from mpc4quantum_tpu.parallel.mesh import fleet_mesh, scaling_report
from test_parallel import small_problem


def test_scaling_report_runs_and_scales():
    rho0, model, base_plant, X_targ, U_targ, Q, R, Qf, config, sat, targ = small_problem(
        H=4, n_steps=4
    )

    def run_shard(mesh, batch):
        plants, keys = make_scenario_batch(jax.random.PRNGKey(0), base_plant, batch)
        res = sharded_mpc(mesh, jnp.asarray(rho0), model, plants, X_targ, U_targ,
                          Q, R, Qf, config, sat, keys=keys)
        jax.block_until_ready(res.us)
        return res

    rows = scaling_report(run_shard, batch_per_device=2, device_counts=[1, 2, 4], reps=2)
    assert [r["devices"] for r in rows] == [1, 2, 4]
    assert rows[0]["efficiency"] == 1.0
    for r in rows:
        assert r["best_s"] > 0
    print("weak-scaling efficiencies:", [(r["devices"], round(r["efficiency"], 3)) for r in rows])
    # real teeth on the virtual mesh (4 physical cores): >= 50% weak-scaling
    # efficiency at every mesh size. The >= 80% @ N >= 2 hosts target of
    # BASELINE.md applies to real multi-chip ICI, which this host cannot
    # emulate faithfully; 0.5 catches per-device pathologies (resharding,
    # accidental replication of the rollout) without flaking on CPU noise.
    for r in rows:
        assert r["efficiency"] >= 0.5, rows
