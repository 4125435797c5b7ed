"""TPU probe R: the remaining driver features on silicon through the
host-loop fleet - streaming online (RLS) model refits, e_ops
expectation-value observation, measurement noise, and the LQR solver mode.

Env: PR_BATCH (default 1024), PR_CASES ("stream,eops,lqr").
"""
import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")

import dataclasses
import mpc4quantum_tpu as m4q
from mpc4quantum_tpu.mpc.hostloop import HostLoopMPC
from mpc4quantum_tpu.plants.quantum import quantum_step_taylor, quantum_observe
from mpc4quantum_tpu.models.dmdc import online_from_bootstrap, online_fit_iteration
from mpc4quantum_tpu.solvers.boxqp import BoxQPParams
from mpc4quantum_tpu.parallel.fleet import make_scenario_batch
from probe_tpu_safe import build, H, DT, ORDER, SAT, DU

batch = int(os.environ.get("PR_BATCH", "1024"))
cases = os.environ.get("PR_CASES", "stream,eops,lqr").split(",")


def report(name, runner, rho0, model, plants, keys, X_targ, U_targ, Q, R,
           check_model_moved=None):
    t0 = time.time()
    out = runner.run(rho0, model, plants, X_targ, U_targ, Q, R, Q, keys,
                     record=False)
    first = time.time() - t0
    t0 = time.time()
    out = runner.run(rho0, model, plants, X_targ, U_targ, Q, R, Q, keys,
                     record=False)
    best = time.time() - t0
    fid = out["final_x"][:, 3].real
    extra = ""
    if check_model_moved is not None:
        dA = float(np.max(np.abs(np.asarray(out["model_state"].A) - check_model_moved)))
        extra = f" max|dA|={dA:.2e}"
    print(f"[{name} B={batch}] first={first:.0f}s steady={best*1e3:.0f}ms "
          f"-> {batch/best:.0f} r/s fid={fid.mean():.5f}/{fid.min():.5f} "
          f"fails={(out['exit_code'] != 0).sum()}{extra}", flush=True)


def main():
    print("device:", jax.devices()[0], flush=True)
    model, plants, keys, rho0, X_targ, U_targ, Q, R = build(batch)
    base_cfg = m4q.MPCConfig(horizon=H, n_steps=20, dt=DT, dim_u=1, order=ORDER,
                             qp_backend="ns",
                             qp_params=BoxQPParams(max_iter=20, n_rounds=3))

    if "stream" in cases:
        alphas = [float(a) for a in
                  os.environ.get("PR_ALPHAS", "1e2").split(",")]
        for alpha in alphas:
            try:
                cpu = jax.devices("cpu")[0]
                with jax.default_device(cpu):
                    m0 = online_from_bootstrap(jnp.asarray(np.asarray(model.A)), 4, 4,
                                               model.A.shape[1] - 4, alpha=alpha)
                    m0 = jax.tree.map(np.asarray, m0)
                cfg = dataclasses.replace(base_cfg, streaming=True)
                runner = HostLoopMPC(cfg, SAT, du=DU, plant_step_fn=quantum_step_taylor,
                                     model_update_fn=online_fit_iteration,
                                     warm_sqp_iters=8, granularity="mixed",
                                     qp_impl="pallas", plant_impl="pallas")
                report(f"stream-rls a={alpha:g}", runner, rho0, m0, plants, keys,
                       X_targ, U_targ, Q, R, check_model_moved=np.asarray(m0.A))
            except Exception:
                print(f"[stream a={alpha:g}] FAIL", flush=True)
                traceback.print_exc()

    if "eops" in cases:
        try:
            # informationally complete e_ops (matrix-unit expectations) +
            # measurement noise: the device-shaped observation path
            cpu = jax.devices("cpu")[0]
            with jax.default_device(cpu):
                units = [np.zeros((2, 2), complex) for _ in range(4)]
                for k, (i, j) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
                    units[k][i, j] = 1.0
                plant_e = jax.tree.map(
                    np.asarray,
                    m4q.QuantumPlant.create(
                        np.asarray(plants.H0[0]), [np.asarray(plants.H1s[0, 0])],
                        sigma=1e-4, e_ops=units))
                pl_b, keys_e = make_scenario_batch(
                    jax.random.PRNGKey(1), plant_e, batch, detune_scale=0.01)
                pl_b = jax.tree.map(np.asarray, pl_b)
                keys_e = np.asarray(keys_e)
            runner = HostLoopMPC(base_cfg, SAT, du=DU,
                                 plant_step_fn=quantum_step_taylor,
                                 observe_fn=quantum_observe,
                                 warm_sqp_iters=8, granularity="mixed",
                                 qp_impl="pallas", plant_impl="pallas")
            report("e_ops+noise", runner, rho0, model, pl_b, keys_e,
                   X_targ, U_targ, Q, R)
        except Exception:
            print("[eops] FAIL", flush=True)
            traceback.print_exc()

    if "lqr" in cases:
        try:
            cfg = dataclasses.replace(base_cfg, solver="lqr")
            runner = HostLoopMPC(cfg, SAT, du=DU, plant_step_fn=quantum_step_taylor,
                                 warm_sqp_iters=8, granularity="mixed")
            report("lqr", runner, rho0, model, plants, keys, X_targ, U_targ, Q, R)
        except Exception:
            print("[lqr] FAIL", flush=True)
            traceback.print_exc()

    print("PROBE_R_DONE", flush=True)


if __name__ == "__main__":
    main()
