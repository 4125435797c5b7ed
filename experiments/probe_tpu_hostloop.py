"""TPU probe H: the REAL HostLoopMPC programs on the chip, one dispatch at a
time with an immediate digest fetch after each (execution errors defer to
first transfer on axon). This is exactly what bench.py's hostloop path runs.

Env: PB_BATCH (default 1024), PB_STEPS (default 20).
"""
import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, "/root/repo")

batch = int(os.environ.get("PB_BATCH", "1024"))
n_steps = int(os.environ.get("PB_STEPS", "20"))

import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")

import mpc4quantum_tpu as m4q
from mpc4quantum_tpu.mpc.hostloop import HostLoopMPC
from mpc4quantum_tpu.plants.quantum import quantum_step_taylor
from mpc4quantum_tpu.solvers.boxqp import BoxQPParams
from probe_tpu_safe import build, H, DT, ORDER, SAT, DU


def digest(x):
    return float(np.asarray(jnp.mean(jnp.abs(jnp.asarray(x))).astype(jnp.float32).reshape(1))[0])


def main():
    print("device:", jax.devices()[0], flush=True)
    model, plants, keys, rho0, X_targ, U_targ, Q, R = build(batch)
    cfg = m4q.MPCConfig(horizon=H, n_steps=n_steps, dt=DT, dim_u=1, order=ORDER,
                        qp_backend="ns", qp_params=BoxQPParams(max_iter=60, n_rounds=2))
    runner = HostLoopMPC(cfg, SAT, du=DU, plant_step_fn=quantum_step_taylor,
                         warm_sqp_iters=8)

    # drive run() manually so each program call gets a digest fetch
    import dataclasses
    from mpc4quantum_tpu.utils.cxio import split_cx

    B = batch
    cdtype = np.complex64 if jnp.zeros(0).dtype == jnp.float32 else np.complex128
    x0 = np.tile(rho0[None, :], (B, 1)).astype(cdtype)
    Xg = np.repeat(x0[:, :, None], H + 1, axis=2)
    Ug = np.zeros((B, 1, H), x0.real.dtype)
    u_last = np.tile(np.asarray(U_targ)[None, :, 0], (B, 1)).astype(x0.real.dtype)
    carry = split_cx((x0, x0.copy(), Xg, Ug, u_last, np.asarray(keys),
                      np.zeros((B,), np.int32), np.zeros((B,), bool)))
    model_b = jax.tree.map(lambda l: np.tile(np.asarray(l)[None], (B,) + (1,) * np.asarray(l).ndim), model)
    args = (split_cx(plants), split_cx(model_b), split_cx(np.asarray(X_targ)),
            np.asarray(U_targ), split_cx(np.asarray(Q)), R, split_cx(np.asarray(Q)))
    progs = runner._programs
    model_s = args[1]

    t_start = time.time()
    for step in range(n_steps):
        warm = step <= 1
        it_prog = progs["iter_warm"] if warm else progs["iter_steady"]
        n_it = 8 if warm else 1
        step_arr = np.asarray(step, np.int32)
        t0 = time.time()
        try:
            s = progs["init"](carry)
            d = digest(s[0].re)
        except Exception:
            print(f"step {step} INIT FAIL", flush=True)
            traceback.print_exc()
            return
        for j in range(n_it):
            t1 = time.time()
            try:
                s = it_prog(carry, s, step_arr, args[0], model_s, *args[2:])
                d = digest(s[0].re)
                print(f"  step {step} iter {j}: ok d={d:.5f} ({time.time() - t1:.1f}s)", flush=True)
            except Exception:
                print(f"  step {step} iter {j}: FAIL ({time.time() - t1:.1f}s)", flush=True)
                traceback.print_exc()
                return
        try:
            carry, model_s, outs = progs["advance"](carry, s, step_arr, args[0], model_s, *args[2:])
            d = digest(carry[0].re)
            print(f"step {step} advance: ok x_d={d:.5f} ({time.time() - t0:.1f}s total)", flush=True)
        except Exception:
            print(f"step {step} advance: FAIL", flush=True)
            traceback.print_exc()
            return

    fid = np.asarray(carry[0].re)[:, 3]
    codes = np.asarray(jnp.asarray(carry[6]).astype(jnp.float32))
    print(f"DONE in {time.time() - t_start:.1f}s: fid_mean={fid.mean():.5f} "
          f"fid_min={fid.min():.5f} codes_nonzero={(codes != 0).sum()}", flush=True)

    # steady-state timing through the public runner
    t0 = time.time()
    out = runner.run(rho0, model, plants, X_targ, U_targ, Q, R, Q, keys, record=False)
    wall = time.time() - t0
    print(f"runner.run: {wall * 1e3:.0f} ms -> {batch / wall:.1f} rollouts/s "
          f"fid={np.real(out['final_x'][:, 3]).mean():.5f}", flush=True)
    print("PROBE_H_OK", flush=True)


if __name__ == "__main__":
    main()
