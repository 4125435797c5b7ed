"""TPU probe I: the real-EMBEDDED host-loop on the chip (plan B).

Every program is pure-real batched matmul chains except the plant step's
internal complex reassembly (verified pattern). Same digest-after-each-call
structure as probe H.

Env: PB_BATCH (default 1024), PB_STEPS (default 20).
"""
import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, "/root/repo")

batch = int(os.environ.get("PB_BATCH", "1024"))
n_steps = int(os.environ.get("PB_STEPS", "20"))

import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")

import mpc4quantum_tpu as m4q
from mpc4quantum_tpu.mpc.hostloop import HostLoopMPC
from mpc4quantum_tpu.mpc.embedded import embed_problem
from mpc4quantum_tpu.models.dmdc import dmdc_from_operator
from mpc4quantum_tpu.solvers.boxqp import BoxQPParams
from probe_tpu_safe import build, H, DT, ORDER, SAT, DU


def main():
    print("device:", jax.devices()[0], flush=True)
    model, plants, keys, rho0, X_targ, U_targ, Q, R = build(batch)
    prob, observe_emb = embed_problem(rho0, np.asarray(model.A), X_targ, Q, Q, dim_x=4)
    model_e = dmdc_from_operator(prob.model_A, 8, 8, prob.model_A.shape[1] - 8)
    cfg = m4q.MPCConfig(horizon=H, n_steps=n_steps, dt=DT, dim_u=1, order=ORDER,
                        qp_backend="ns", qp_params=BoxQPParams(max_iter=60, n_rounds=2))
    runner = HostLoopMPC(cfg, SAT, du=DU, plant_step_fn=prob.plant_step_fn,
                         lift_fn=prob.lift_fn, proj_fn=prob.proj_fn,
                         observe_fn=observe_emb, warm_sqp_iters=8)

    t0 = time.time()
    out = runner.run(prob.x0, model_e, plants, prob.X_targ, U_targ,
                     prob.Q, R, prob.Qf, keys, record=False)
    first = time.time() - t0
    fid = out["final_x"][:, 3].real  # embedded: slot 3 = Re(x[3])
    print(f"first run (compile): {first:.1f}s fid_mean={fid.mean():.5f} "
          f"fid_min={fid.min():.5f} codes_nonzero={(out['exit_code'] != 0).sum()}",
          flush=True)

    times = []
    for _ in range(3):
        t0 = time.time()
        out = runner.run(prob.x0, model_e, plants, prob.X_targ, U_targ,
                         prob.Q, R, prob.Qf, keys, record=False)
        times.append(time.time() - t0)
    best = min(times)
    print(f"steady: {best * 1e3:.0f} ms -> {batch / best:.1f} rollouts/s", flush=True)
    print("PROBE_I_OK", flush=True)


if __name__ == "__main__":
    main()
