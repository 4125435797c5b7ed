"""TPU probe: the VERDICT r2 item-3 comparison proper — the round-2 engine
form (qp_kernel='small', cold 3x15 everywhere) vs the round-3 production
form (qp_kernel='auto' -> big_unroll, warm-dual 2x10 steady), ONE process,
same data, full flagship rollouts at B=8192.
"""
import os, sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")
import jax
jax.config.update("jax_default_matmul_precision", "highest")
from probe_tpu_safe import build
import mpc4quantum_tpu as m4q
from mpc4quantum_tpu.mpc.hostloop import HostLoopMPC
from mpc4quantum_tpu.plants.quantum import quantum_step_taylor
from mpc4quantum_tpu.solvers.boxqp import BoxQPParams
from probe_tpu_safe import H, DT, ORDER, SAT, DU
import time, traceback

N_STEPS = 20


def run_form(tag, warm, kernel, data, batch):
    model, plants, keys, rho0, X_targ, U_targ, Q, R = data
    cfg = m4q.MPCConfig(horizon=H, n_steps=N_STEPS, dt=DT, dim_u=1, order=ORDER,
                        qp_backend="ns", qp_warm_duals=warm,
                        qp_params=BoxQPParams(max_iter=15, n_rounds=3))
    steady_qp = (BoxQPParams(max_iter=10, n_rounds=2,
                             accept_abs=4e-3, accept_rel=4e-3) if warm else None)
    try:
        r = HostLoopMPC(cfg, SAT, du=DU, plant_step_fn=quantum_step_taylor,
                        warm_sqp_iters=8, granularity="step", steady_fuse=3,
                        qp_impl="pallas", plant_impl="pallas",
                        steady_qp_params=steady_qp, qp_kernel=kernel)
        t0 = time.time()
        out = r.run(rho0, model, plants, X_targ, U_targ, Q, R, Q, keys, record=False)
        first = time.time() - t0
        times = []
        for _ in range(4):
            t0 = time.time()
            out = r.run(rho0, model, plants, X_targ, U_targ, Q, R, Q, keys,
                        record=False)
            times.append(time.time() - t0)
        best = min(times)
        fid = out["final_x"][:, 3].real
        print(f"[{tag}] first={first:.0f}s steady={best*1e3:.0f}ms "
              f"-> {batch/best:.0f} r/s fid={fid.mean():.5f}/{fid.min():.5f} "
              f"fails={(out['exit_code'] != 0).sum()}", flush=True)
        return batch / best, float(fid.min())
    except Exception:
        print(f"[{tag}] FAIL", flush=True)
        traceback.print_exc()
        return 0.0, 0.0


def main():
    print("device:", jax.devices()[0], flush=True)
    batch = int(os.environ.get("PW_BATCH", "8192"))
    data = build(batch)
    r2, m2 = run_form("round2: small+cold3x15", False, "small", data, batch)
    r3, m3 = run_form("round3: auto+warm2x10", True, "auto", data, batch)
    if r2 and r3:
        print(f"round3/round2 = {r3/r2:.2f}x  (min fid {m3:.5f} vs {m2:.5f})",
              flush=True)
    print("PROBE_R2R3_DONE", flush=True)


if __name__ == "__main__":
    main()
