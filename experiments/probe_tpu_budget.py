"""TPU probe M: dispatch-granularity and ADMM-budget sweep on the flagship
fleet workload - finds the throughput/quality frontier for bench defaults.

Env: PM_BATCH (default 1024).
"""
import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, "/root/repo")

batch = int(os.environ.get("PM_BATCH", "1024"))

import jax

jax.config.update("jax_default_matmul_precision", "highest")

import mpc4quantum_tpu as m4q
from mpc4quantum_tpu.mpc.hostloop import HostLoopMPC
from mpc4quantum_tpu.plants.quantum import quantum_step_taylor
from mpc4quantum_tpu.solvers.boxqp import BoxQPParams
from probe_tpu_safe import build, H, DT, ORDER, SAT, DU


def run_case(name, model, plants, keys, rho0, X_targ, U_targ, Q, R,
             granularity="sqp", qp_impl="pallas", plant_impl="xla",
             max_iter=60, n_rounds=2, warm_iters=8):
    cfg = m4q.MPCConfig(horizon=H, n_steps=20, dt=DT, dim_u=1, order=ORDER,
                        qp_backend="ns",
                        qp_params=BoxQPParams(max_iter=max_iter, n_rounds=n_rounds))
    runner = HostLoopMPC(cfg, SAT, du=DU, plant_step_fn=quantum_step_taylor,
                         warm_sqp_iters=warm_iters, granularity=granularity,
                         qp_impl=qp_impl, plant_impl=plant_impl)
    t0 = time.time()
    out = runner.run(rho0, model, plants, X_targ, U_targ, Q, R, Q, keys, record=False)
    first = time.time() - t0
    fid = out["final_x"][:, 3].real
    times = []
    for _ in range(3):
        t0 = time.time()
        out = runner.run(rho0, model, plants, X_targ, U_targ, Q, R, Q, keys,
                         record=False)
        times.append(time.time() - t0)
    best = min(times)
    print(f"[{name}] first={first:.0f}s steady={best*1e3:.0f}ms "
          f"-> {batch/best:.0f} r/s fid={fid.mean():.5f}/{fid.min():.5f} "
          f"fails={(out['exit_code'] != 0).sum()}", flush=True)


def main():
    print("device:", jax.devices()[0], flush=True)
    model, plants, keys, rho0, X_targ, U_targ, Q, R = build(batch)
    cases = [
        ("sqp 2x60", dict()),
        ("mixed 2x60", dict(granularity="mixed")),
        ("mixed 2x60 plant-pallas", dict(granularity="mixed", plant_impl="pallas")),
        ("mixed 2x30", dict(granularity="mixed", max_iter=30)),
        ("mixed 3x20", dict(granularity="mixed", max_iter=20, n_rounds=3)),
        ("mixed 2x30 warm6", dict(granularity="mixed", max_iter=30, warm_iters=6)),
    ]
    for name, kw in cases:
        try:
            run_case(name, model, plants, keys, rho0, X_targ, U_targ, Q, R, **kw)
        except Exception:
            print(f"[{name}] FAIL", flush=True)
            traceback.print_exc()
    print("PROBE_M_DONE", flush=True)


if __name__ == "__main__":
    main()
