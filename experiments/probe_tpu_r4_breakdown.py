"""TPU probe (round 4, stage 4): per-dispatch wall breakdown of the
flagship rollout at the knee config (B=16384, small kernel, fuse 3) - the
quantitative gap analysis for the 1000x north star.

Times each program launch of the production hostloop individually
(block_until_ready between dispatches adds sync overhead, so the summed
breakdown is an upper bound on the fused-run time; relative shares are the
signal): init, warm step 0 (8 SQP iters fused), warm step 1 (1 iter),
each 3-step steady chunk. Also measures the steady-chunk program at
batch 1024 to split latency-vs-throughput.

Env: PW_BATCH (16384).
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
from mpc4quantum_tpu.utils.cxio import split_cx, CxPair
from probe_tpu_safe import build, H, DT, ORDER, SAT, DU

N_STEPS = 20


def sync(tree):
    leaves = jax.tree.leaves(tree)
    jax.block_until_ready(leaves[0])
    return tree


def run_breakdown(batch):
    data = build(batch)
    model, plants, keys, rho0, X_targ, U_targ, Q, R = data
    cfg = m4q.MPCConfig(horizon=H, n_steps=N_STEPS, dt=DT, dim_u=1, order=ORDER,
                        qp_backend="ns", qp_warm_duals=True,
                        qp_params=BoxQPParams(max_iter=15, n_rounds=3,
                                              ns_iters=20))
    steady_qp = BoxQPParams(max_iter=10, n_rounds=2, ns_iters=20,
                            accept_abs=4e-3, accept_rel=4e-3)
    r = HostLoopMPC(cfg, SAT, du=DU, plant_step_fn=quantum_step_taylor,
                    warm_sqp_iters=(8, 1), granularity="step", steady_fuse=3,
                    qp_impl="pallas", plant_impl="pallas",
                    steady_qp_params=steady_qp, qp_kernel="small")
    # one full warm run (compiles everything)
    t0 = time.time()
    r.run(rho0, model, plants, X_targ, U_targ, Q, R, Q, keys, record=False)
    print(f"[B={batch}] first full run {time.time() - t0:.0f}s", flush=True)

    # hand-driven loop, timing each dispatch (mirrors HostLoopMPC.run)
    B = batch
    cdtype = np.complex64
    x0 = np.tile(np.asarray(rho0)[None, :], (B, 1)).astype(cdtype)
    Xg = np.repeat(x0[:, :, None], H + 1, axis=2)
    Ug = np.zeros((B, 1, H), np.float32)
    u_last = np.tile(np.asarray(U_targ)[None, :, 0], (B, 1)).astype(np.float32)
    carry = split_cx((x0, x0.copy(), Xg, Ug, u_last, np.asarray(keys),
                      np.zeros((B,), np.int32), np.zeros((B,), bool)))
    model_b = jax.tree.map(
        lambda l: np.tile(np.asarray(l)[None], (B,) + (1,) * np.asarray(l).ndim),
        model)
    args = (split_cx(jax.tree.map(np.asarray, plants)), split_cx(model_b),
            split_cx(np.asarray(X_targ)), np.asarray(U_targ),
            split_cx(np.asarray(Q)), np.asarray(R), split_cx(np.asarray(Q)))
    progs = r._programs
    model_s = args[1]
    duals = (np.zeros((B, H), np.float32), np.zeros((B,), np.float32))

    t_total = 0.0
    rows = []
    step = 0
    while step < N_STEPS:
        warm = step <= 1
        sarr = np.asarray(step, np.int32)
        if warm:
            prog = progs[f"step_warm_{r._warm_iters_for(step)}"]
            t0 = time.time()
            carry, model_s, outs = sync(prog(carry, duals, sarr, args[0],
                                             model_s, *args[2:]))
            dt_ms = (time.time() - t0) * 1e3
            rows.append((f"warm{step} ({r._warm_iters_for(step)} iters)", dt_ms))
            duals = outs[5]
            step += 1
        else:
            t0 = time.time()
            carry, model_s, outs = sync(progs["step_steady_k"](
                carry, duals, sarr, args[0], model_s, *args[2:]))
            dt_ms = (time.time() - t0) * 1e3
            rows.append((f"steady chunk @{step}", dt_ms))
            duals = outs[5]
            step += 3
        t_total += dt_ms
    for tag, ms in rows:
        print(f"  {tag:>24s}: {ms:7.1f} ms ({100 * ms / t_total:4.1f}%)",
              flush=True)
    print(f"  {'sum (sync-bounded)':>24s}: {t_total:7.1f} ms", flush=True)
    fid = (np.asarray(carry[0].re)[:, 3])
    print(f"  fid check: {fid.mean():.5f}", flush=True)


def main():
    print("device:", jax.devices()[0], flush=True)
    run_breakdown(int(os.environ.get("PW_BATCH", "16384")))
    run_breakdown(1024)
    print("PROBE_R4_BREAKDOWN_DONE", flush=True)


if __name__ == "__main__":
    main()
