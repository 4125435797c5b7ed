"""TPU probe R3b: remaining dispatch-latency levers on the PRODUCTION
flagship config (warm duals 2x10 steady, qp_kernel=auto -> big_unroll,
granularity='step'), all in ONE process so the ±20% tunnel variance
cancels.

Sweeps, in order (each new (fuse,batch) shape is a fresh remote compile,
30-60 s warm cache / minutes cold - keep the grid small):
  1. steady_fuse 3 vs 6 at B=8192  - round-2 found k=6 regresses, but that
     was the cold 3x15 budget; warm 2x10 programs are ~3x shorter, so the
     dispatch/compute balance moved.
  2. B=16384 at the winning fuse   - round-2 put the knee at 8192; shorter
     programs may shift it up.

Env: PR_BATCH (8192), PR_FUSES ("3,6"), PR_BIG (16384, 0 to skip).
"""
import os, sys, time, traceback
import numpy as np
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_default_matmul_precision", "highest")
import mpc4quantum_tpu as m4q
from mpc4quantum_tpu.mpc.hostloop import HostLoopMPC
from mpc4quantum_tpu.plants.quantum import quantum_step_taylor
from mpc4quantum_tpu.solvers.boxqp import BoxQPParams
from probe_tpu_safe import build, H, DT, ORDER, SAT, DU

N_STEPS = 20


def run_cfg(tag, batch, fuse, data):
    model, plants, keys, rho0, X_targ, U_targ, Q, R = data
    cfg = m4q.MPCConfig(horizon=H, n_steps=N_STEPS, dt=DT, dim_u=1, order=ORDER,
                        qp_backend="ns", qp_warm_duals=True,
                        qp_params=BoxQPParams(max_iter=15, n_rounds=3))
    steady_qp = BoxQPParams(max_iter=10, n_rounds=2,
                            accept_abs=4e-3, accept_rel=4e-3)
    try:
        r = HostLoopMPC(cfg, SAT, du=DU, plant_step_fn=quantum_step_taylor,
                        warm_sqp_iters=8, granularity="step", steady_fuse=fuse,
                        qp_impl="pallas", plant_impl="pallas",
                        steady_qp_params=steady_qp, qp_kernel="auto")
        t0 = time.time()
        out = r.run(rho0, model, plants, X_targ, U_targ, Q, R, Q, keys, record=False)
        first = time.time() - t0
        times = []
        for _ in range(3):
            t0 = time.time()
            out = r.run(rho0, model, plants, X_targ, U_targ, Q, R, Q, keys,
                        record=False)
            times.append(time.time() - t0)
        best = min(times)
        fid = out["final_x"][:, 3].real
        print(f"[{tag}] B={batch} fuse={fuse} first={first:.0f}s "
              f"steady={best*1e3:.0f}ms -> {batch/best:.0f} r/s "
              f"fid={fid.mean():.5f}/{fid.min():.5f} "
              f"fails={(out['exit_code'] != 0).sum()}", flush=True)
        return batch / best
    except Exception:
        print(f"[{tag}] B={batch} fuse={fuse} FAIL", flush=True)
        traceback.print_exc()
        return 0.0


def main():
    print("device:", jax.devices()[0], flush=True)
    batch = int(os.environ.get("PR_BATCH", "8192"))
    fuses = [int(f) for f in os.environ.get("PR_FUSES", "3,6").split(",")]
    bigs = [int(b) for b in os.environ.get("PR_BIG", "16384,32768").split(",") if b]

    data = build(batch)
    results = {}
    for fuse in fuses:
        results[fuse] = run_cfg("fuse", batch, fuse, data)
    best_fuse = max(results, key=results.get)
    print(f"best fuse at B={batch}: {best_fuse} ({results[best_fuse]:.0f} r/s)",
          flush=True)
    for big in bigs:
        data_big = build(big)
        run_cfg("bigbatch", big, best_fuse, data_big)
    print("PROBE_R3B_DONE", flush=True)


if __name__ == "__main__":
    main()
