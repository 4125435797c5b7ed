"""TPU probe T: fuse the WARM steps too (granularity='step' vs 'mixed') at
the tuned config - warm dispatches are now ~75% of all launches.
Env: PT_BATCH (8192).
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

batch = int(os.environ.get("PT_BATCH", "8192"))

def main():
    print("device:", jax.devices()[0], flush=True)
    model, plants, keys, rho0, X_targ, U_targ, Q, R = build(batch)
    cfg = m4q.MPCConfig(horizon=H, n_steps=20, dt=DT, dim_u=1, order=ORDER,
                        qp_backend="ns",
                        qp_params=BoxQPParams(max_iter=15, n_rounds=3))
    for gran in ("mixed", "step"):
        try:
            r = HostLoopMPC(cfg, SAT, du=DU, plant_step_fn=quantum_step_taylor,
                            warm_sqp_iters=8, granularity=gran, steady_fuse=3,
                            qp_impl="pallas", plant_impl="pallas")
            t0 = time.time()
            out = r.run(rho0, model, plants, X_targ, U_targ, Q, R, Q, keys, record=False)
            first = time.time() - t0
            fid = out["final_x"][:, 3].real
            times = []
            for _ in range(3):
                t0 = time.time()
                out = r.run(rho0, model, plants, X_targ, U_targ, Q, R, Q, keys, record=False)
                times.append(time.time() - t0)
            best = min(times)
            print(f"[{gran}] first={first:.0f}s steady={best*1e3:.0f}ms "
                  f"-> {batch/best:.0f} r/s fid={fid.mean():.5f}/{fid.min():.5f} "
                  f"fails={(out['exit_code'] != 0).sum()}", flush=True)
        except Exception:
            print(f"[{gran}] FAIL", flush=True)
            traceback.print_exc()
    print("PROBE_T_DONE", flush=True)

if __name__ == "__main__":
    main()
