"""TPU probe Q: steady_fuse sweep - k steady steps per dispatch on the
tuned fleet config. Env: PQ_BATCH (default 8192), PQ_FUSES ("1,2,3,6").
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

batch = int(os.environ.get("PQ_BATCH", "8192"))
fuses = [int(k) for k in os.environ.get("PQ_FUSES", "1,2,3,6").split(",")]


def main():
    print("device:", jax.devices()[0], flush=True)
    model, plants, keys, rho0, X_targ, U_targ, Q, R = build(batch)
    cfg = m4q.MPCConfig(horizon=H, n_steps=20, dt=DT, dim_u=1, order=ORDER,
                        qp_backend="ns",
                        qp_params=BoxQPParams(max_iter=20, n_rounds=3))
    for k in fuses:
        try:
            runner = HostLoopMPC(cfg, SAT, du=DU, plant_step_fn=quantum_step_taylor,
                                 warm_sqp_iters=8, granularity="mixed",
                                 qp_impl="pallas", plant_impl="pallas",
                                 steady_fuse=k)
            t0 = time.time()
            out = runner.run(rho0, model, plants, X_targ, U_targ, Q, R, Q, keys,
                             record=False)
            first = time.time() - t0
            fid = out["final_x"][:, 3].real
            times = []
            for _ in range(3):
                t0 = time.time()
                out = runner.run(rho0, model, plants, X_targ, U_targ, Q, R, Q,
                                 keys, record=False)
                times.append(time.time() - t0)
            best = min(times)
            print(f"[fuse={k}] first={first:.0f}s steady={best*1e3:.0f}ms "
                  f"-> {batch/best:.0f} r/s fid={fid.mean():.5f}/{fid.min():.5f} "
                  f"fails={(out['exit_code'] != 0).sum()}", flush=True)
        except Exception:
            print(f"[fuse={k}] FAIL", flush=True)
            traceback.print_exc()
    print("PROBE_Q_DONE", flush=True)


if __name__ == "__main__":
    main()
