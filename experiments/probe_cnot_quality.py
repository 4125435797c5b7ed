"""CPU probe: is cnot_state's weak detune lane SQP-limited or physics-limited?

Runs the cnot fleet (batch 64, same PRNGKey(1) detune draws as the bench)
through the SCAN driver, whose while-loop SQP runs to convergence at every
step - the semantic ceiling for the hostloop's fixed warm(8)/steady(1)
iteration schedule. If min-fidelity stays ~0.97 here too, the weak lane is
physics/conditioning (gate must be recalibrated with documentation); if it
reaches >= 0.98, the hostloop needs a wider warm window / more steady SQP
iterations for ramped-target scenarios.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

import dataclasses

from mpc4quantum_tpu import presets
from mpc4quantum_tpu.parallel.fleet import make_scenario_batch, batched_mpc
from mpc4quantum_tpu.plants.quantum import quantum_step_taylor

sc = presets.PRESETS["cnot_state"]()
cfg = dataclasses.replace(
    sc.config,
    qp_backend="ns",
    qp_params=sc.config.qp_params.replace(unroll=False),
    traj_mode="none",
    max_iter=int(sys.argv[1]) if len(sys.argv) > 1 else 8,
)
batch = 64
with jax.default_device(jax.devices("cpu")[0]):
    plants, keys = make_scenario_batch(jax.random.PRNGKey(1), sc.plant, batch,
                                       detune_scale=0.01)
    plants = jax.tree.map(np.asarray, plants)
    keys = np.asarray(keys)
    model_np = jax.tree.map(np.asarray, sc.model)

t0 = time.time()
res = batched_mpc(jnp.asarray(sc.x0), model_np, plants,
                  np.asarray(sc.X_targ), np.asarray(sc.U_targ),
                  np.asarray(sc.Q), np.asarray(sc.R), np.asarray(sc.Qf),
                  cfg, sc.sat, du=sc.du, keys=keys,
                  plant_step_fn=quantum_step_taylor)
fid = np.real(np.asarray(res.xs)[:, :, -1] @ np.conj(sc.target_state))
codes = np.asarray(res.exit_code)
print(f"scan-driver to-convergence (max_iter={cfg.max_iter}): "
      f"fid_mean={fid.mean():.5f} fid_min={fid.min():.5f} "
      f"qp_fail={np.mean(codes == 2):.4f} "
      f"completed={np.mean((codes == 0) | (codes == 1)):.4f} "
      f"elapsed={time.time() - t0:.0f}s", flush=True)
print("worst 5 lanes:", np.sort(fid)[:5], flush=True)
