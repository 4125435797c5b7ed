"""TPU probe J: HostLoopMPC with qp_impl="pallas" on the chip, timed against
qp_impl="xla" - the kernel-vs-XLA comparison on the flagship fleet workload.

Env: PB_BATCH (default 1024).
"""
import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, "/root/repo")

batch = int(os.environ.get("PB_BATCH", "1024"))

import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")

import mpc4quantum_tpu as m4q
from mpc4quantum_tpu.mpc.hostloop import HostLoopMPC
from mpc4quantum_tpu.plants.quantum import quantum_step_taylor
from mpc4quantum_tpu.solvers.boxqp import BoxQPParams
from probe_tpu_safe import build, H, DT, ORDER, SAT, DU


def run_impl(name, qp_impl, model, plants, keys, rho0, X_targ, U_targ, Q, R):
    cfg = m4q.MPCConfig(horizon=H, n_steps=20, dt=DT, dim_u=1, order=ORDER,
                        qp_backend="ns", qp_params=BoxQPParams(max_iter=60, n_rounds=2))
    runner = HostLoopMPC(cfg, SAT, du=DU, plant_step_fn=quantum_step_taylor,
                         warm_sqp_iters=8, qp_impl=qp_impl)
    t0 = time.time()
    out = runner.run(rho0, model, plants, X_targ, U_targ, Q, R, Q, keys, record=False)
    first = time.time() - t0
    fid = out["final_x"][:, 3].real
    times = []
    for _ in range(3):
        t0 = time.time()
        out = runner.run(rho0, model, plants, X_targ, U_targ, Q, R, Q, keys, record=False)
        times.append(time.time() - t0)
    best = min(times)
    print(f"[{name}] first={first:.1f}s steady={best * 1e3:.0f}ms "
          f"-> {batch / best:.1f} rollouts/s fid_mean={fid.mean():.5f} "
          f"fid_min={fid.min():.5f} fails={(out['exit_code'] != 0).sum()}", flush=True)
    return out


def main():
    print("device:", jax.devices()[0], flush=True)
    model, plants, keys, rho0, X_targ, U_targ, Q, R = build(batch)
    try:
        run_impl("pallas", "pallas", model, plants, keys, rho0, X_targ, U_targ, Q, R)
    except Exception:
        print("[pallas] FAIL", flush=True)
        traceback.print_exc()
        return
    try:
        run_impl("xla", "xla", model, plants, keys, rho0, X_targ, U_targ, Q, R)
    except Exception:
        print("[xla] FAIL", flush=True)
        traceback.print_exc()
    print("PROBE_J_DONE", flush=True)


if __name__ == "__main__":
    main()
