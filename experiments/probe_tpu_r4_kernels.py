"""TPU probe (round 4): the kernel A/B the advisor demanded - small vs
big_unroll vs big at the ROLLOUT level, ONE process, same data, flagship
B=8192 - plus the r4-tuned vs r3-flat warm-budget A/B.

Round-3 evidence conflicted: session-1 kernel-level timings favored
big_unroll 2.2-2.7x (logs lost with /tmp); the committed within-process
rollout A/B (r3b_r2r3.log) favored small 2.8x. This probe settles the
qp_kernel default with fresh rollout-level numbers in one process.

Forms (all warm-dual steady 2x10, acceptance 4e-3):
  r4(kernel):  warm (8,1), ns_iters=20   x {small, big_unroll, big}
  r3-flat:     warm 8 flat, ns_iters=30, winner kernel (isolates the
               round-4 warm/ns tuning gain from the kernel choice)

Env: PW_BATCH (8192), PW_REPS (3).
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
REPS = int(os.environ.get("PW_REPS", "3"))


def run_form(tag, data, batch, kernel, warm_iters, ns_iters):
    model, plants, keys, rho0, X_targ, U_targ, Q, R = data
    cfg = m4q.MPCConfig(horizon=H, n_steps=N_STEPS, dt=DT, dim_u=1, order=ORDER,
                        qp_backend="ns", qp_warm_duals=True,
                        qp_params=BoxQPParams(max_iter=15, n_rounds=3,
                                              ns_iters=ns_iters))
    steady_qp = BoxQPParams(max_iter=10, n_rounds=2, ns_iters=ns_iters,
                            accept_abs=4e-3, accept_rel=4e-3)
    try:
        r = HostLoopMPC(cfg, SAT, du=DU, plant_step_fn=quantum_step_taylor,
                        warm_sqp_iters=warm_iters, granularity="step",
                        steady_fuse=3, qp_impl="pallas", plant_impl="pallas",
                        steady_qp_params=steady_qp, qp_kernel=kernel)
        t0 = time.time()
        out = r.run(rho0, model, plants, X_targ, U_targ, Q, R, Q, keys,
                    record=False)
        first = time.time() - t0
        times = []
        for _ in range(REPS):
            t0 = time.time()
            out = r.run(rho0, model, plants, X_targ, U_targ, Q, R, Q, keys,
                        record=False)
            times.append(time.time() - t0)
        best = min(times)
        med = float(np.median(times))
        fid = out["final_x"][:, 3].real
        print(f"[{tag:>22s}] first={first:.0f}s best={best*1e3:.0f}ms "
              f"med={med*1e3:.0f}ms -> {batch/best:.0f} r/s "
              f"fid={fid.mean():.5f}/{fid.min():.5f} "
              f"fails={(out['exit_code'] != 0).sum()}", flush=True)
        return batch / best
    except Exception:
        print(f"[{tag}] FAIL", flush=True)
        traceback.print_exc()
        return 0.0


def main():
    print("device:", jax.devices()[0], flush=True)
    batch = int(os.environ.get("PW_BATCH", "8192"))
    data = build(batch)
    r = {}
    r["small"] = run_form("r4 small (8,1) ns20", data, batch,
                          "small", (8, 1), 20)
    r["big_unroll"] = run_form("r4 big_unroll (8,1) ns20", data, batch,
                               "big_unroll", (8, 1), 20)
    r["big"] = run_form("r4 big (8,1) ns20", data, batch, "big", (8, 1), 20)
    if any(r.values()):
        win = max(r, key=r.get)
        print(f"winner: {win} ({r[win]:.0f} r/s); ratios vs small: "
              f"big_unroll {r['big_unroll']/max(r['small'],1e-9):.2f}x, "
              f"big {r['big']/max(r['small'],1e-9):.2f}x", flush=True)
        r3 = run_form(f"r3-flat {win} 8 ns30", data, batch, win, 8, 30)
        if r3:
            print(f"r4-tuning gain ({win}): {r[win]/r3:.2f}x", flush=True)
    print("PROBE_R4_KERNELS_DONE", flush=True)


if __name__ == "__main__":
    main()
