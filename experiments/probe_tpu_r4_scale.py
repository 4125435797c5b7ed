"""TPU probe (round 4, stage 2): batch/fuse sweep of the flagship with the
winning kernel from probe_tpu_r4_kernels.py, one process.

Env: PW_KERNEL (small), PW_BATCHES (4096,8192,16384,32768), PW_FUSES (3,6).
"""
import os, sys, time, traceback
import numpy as np
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")
import jax
jax.config.update("jax_default_matmul_precision", "highest")
import mpc4quantum_tpu as m4q
from mpc4quantum_tpu.mpc.hostloop import HostLoopMPC
from mpc4quantum_tpu.plants.quantum import quantum_step_taylor
from mpc4quantum_tpu.solvers.boxqp import BoxQPParams
from probe_tpu_safe import build, H, DT, ORDER, SAT, DU

N_STEPS = 20


def run_form(tag, data, batch, kernel, fuse):
    model, plants, keys, rho0, X_targ, U_targ, Q, R = data
    cfg = m4q.MPCConfig(horizon=H, n_steps=N_STEPS, dt=DT, dim_u=1, order=ORDER,
                        qp_backend="ns", qp_warm_duals=True,
                        qp_params=BoxQPParams(max_iter=15, n_rounds=3,
                                              ns_iters=20))
    steady_qp = BoxQPParams(max_iter=10, n_rounds=2, ns_iters=20,
                            accept_abs=4e-3, accept_rel=4e-3)
    try:
        r = HostLoopMPC(cfg, SAT, du=DU, plant_step_fn=quantum_step_taylor,
                        warm_sqp_iters=(8, 1), granularity="step",
                        steady_fuse=fuse, qp_impl="pallas", plant_impl="pallas",
                        steady_qp_params=steady_qp, qp_kernel=kernel)
        t0 = time.time()
        out = r.run(rho0, model, plants, X_targ, U_targ, Q, R, Q, keys,
                    record=False)
        first = time.time() - t0
        times = []
        for _ in range(3):
            t0 = time.time()
            out = r.run(rho0, model, plants, X_targ, U_targ, Q, R, Q, keys,
                        record=False)
            times.append(time.time() - t0)
        best = min(times)
        fid = out["final_x"][:, 3].real
        print(f"[{tag:>20s}] first={first:.0f}s best={best*1e3:.0f}ms "
              f"-> {batch/best:.0f} r/s fid={fid.mean():.5f}/{fid.min():.5f} "
              f"fails={(out['exit_code'] != 0).sum()}", flush=True)
        return batch / best
    except Exception:
        print(f"[{tag}] FAIL", flush=True)
        traceback.print_exc()
        return 0.0


def main():
    print("device:", jax.devices()[0], flush=True)
    kernel = os.environ.get("PW_KERNEL", "small")
    batches = [int(b) for b in
               os.environ.get("PW_BATCHES", "8192,16384,32768").split(",")]
    fuses = [int(f) for f in os.environ.get("PW_FUSES", "3,6").split(",")]
    best = (0.0, None)
    for b in batches:
        data = build(b)
        for f in fuses:
            rps = run_form(f"B={b} fuse={f}", data, b, kernel, f)
            if rps > best[0]:
                best = (rps, (b, f))
    print(f"best: {best[1]} -> {best[0]:.0f} r/s", flush=True)
    print("PROBE_R4_SCALE_DONE", flush=True)


if __name__ == "__main__":
    main()
