"""TPU probe N: batch-size scaling of the tuned fleet config (mixed +
pallas QP + pallas plant + 3x20 ADMM) - find the throughput-optimal batch.

Env: PN_BATCHES (comma list, default "512,1024,2048,4096,8192").
"""
import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_default_matmul_precision", "highest")

import mpc4quantum_tpu as m4q
from mpc4quantum_tpu.mpc.hostloop import HostLoopMPC
from mpc4quantum_tpu.plants.quantum import quantum_step_taylor
from mpc4quantum_tpu.solvers.boxqp import BoxQPParams
from probe_tpu_safe import build, H, DT, ORDER, SAT, DU

batches = [int(b) for b in os.environ.get("PN_BATCHES", "512,1024,2048,4096,8192").split(",")]


def main():
    print("device:", jax.devices()[0], flush=True)
    cfg = m4q.MPCConfig(horizon=H, n_steps=20, dt=DT, dim_u=1, order=ORDER,
                        qp_backend="ns",
                        qp_params=BoxQPParams(max_iter=20, n_rounds=3))
    for batch in batches:
        try:
            model, plants, keys, rho0, X_targ, U_targ, Q, R = build(batch)
            runner = HostLoopMPC(cfg, SAT, du=DU, plant_step_fn=quantum_step_taylor,
                                 warm_sqp_iters=8, granularity="mixed",
                                 qp_impl="pallas", plant_impl="pallas")
            t0 = time.time()
            out = runner.run(rho0, model, plants, X_targ, U_targ, Q, R, Q, keys,
                             record=False)
            first = time.time() - t0
            fid = out["final_x"][:, 3].real
            times = []
            for _ in range(3):
                t0 = time.time()
                out = runner.run(rho0, model, plants, X_targ, U_targ, Q, R, Q, keys,
                                 record=False)
                times.append(time.time() - t0)
            best = min(times)
            print(f"[B={batch}] first={first:.0f}s steady={best*1e3:.0f}ms "
                  f"-> {batch/best:.0f} r/s fid={fid.mean():.5f}/{fid.min():.5f} "
                  f"fails={(out['exit_code'] != 0).sum()}", flush=True)
        except Exception:
            print(f"[B={batch}] FAIL", flush=True)
            traceback.print_exc()
    print("PROBE_N_DONE", flush=True)


if __name__ == "__main__":
    main()
