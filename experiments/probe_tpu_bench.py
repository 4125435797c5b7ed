"""TPU probe: the full vmapped MPC bench program with an all-f32 >=1-d
output boundary (round-1 failure was UNIMPLEMENTED at fetch of 0-d/int32
outputs; CLAUDE.md probe list). One program, one question: does the batched
rollout execute AND fetch on the axon chip when only a (3,) f32 crosses back?

Env: PB_BATCH (default 1024), PB_TRAJ (default none).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

batch = int(os.environ.get("PB_BATCH", "1024"))

import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")

import mpc4quantum_tpu as m4q
from mpc4quantum_tpu.models.dmdc import dmdc_from_operator
from mpc4quantum_tpu.parallel.fleet import make_scenario_batch, batched_mpc, fleet_summary
from mpc4quantum_tpu.utils.cxio import cx_jit

SX = np.array([[0, 1], [1, 0]], dtype=complex)
SZ = np.array([[1, 0], [0, -1]], dtype=complex)
DT, H, N_STEPS, ORDER = 1.0, 10, 20, 2
SAT = 2 * np.pi * 0.1
DU = 0.5 * SAT
WQ = 2 * np.pi * 4


def matrix_units(d):
    out = []
    for i in range(d):
        for j in range(d):
            e = np.zeros((d, d), complex)
            e[i, j] = 1
            out.append(e)
    return out


def perturbed_rho0(theta=1e-4):
    Rx = np.array([[np.cos(theta / 2), -1j * np.sin(theta / 2)],
                   [-1j * np.sin(theta / 2), np.cos(theta / 2)]])
    return (Rx @ np.diag([1.0, 0.0]).astype(complex) @ Rx.conj().T).flatten()


def main():
    device = jax.devices()[0]
    cpu = jax.devices("cpu")[0]
    print("device:", device, flush=True)

    with jax.default_device(cpu):
        units = matrix_units(2)
        A0 = m4q.vectorize_me(np.zeros((2, 2)), units)
        A1 = m4q.vectorize_me(0.5 * SX, units)
        A_dst = np.asarray(m4q.discretize_homogeneous([A0, A1], DT, ORDER))
        model = dmdc_from_operator(A_dst, 4, 4, A_dst.shape[1] - 4)
        base_plant = m4q.QuantumPlant.create(0.5 * (WQ * 0.99 - WQ) * SZ, [0.5 * SX])
        plants, keys = make_scenario_batch(jax.random.PRNGKey(0), base_plant, batch,
                                           detune_scale=0.01)
        plants = jax.tree.map(np.asarray, plants)
        keys = np.asarray(keys)

    rho0 = perturbed_rho0()
    targ = np.zeros(4, complex)
    targ[3] = 1.0
    X_targ = np.tile(targ[:, None], (1, N_STEPS + H + 1))
    U_targ = np.zeros((1, N_STEPS + H))
    Q = np.diag([1.0, 0, 0, 1]).astype(complex)
    R = np.eye(1) * (1e-2 / SAT**2)
    config = m4q.MPCConfig(horizon=H, n_steps=N_STEPS, dt=DT, dim_u=1, order=ORDER,
                           traj_mode=os.environ.get("PB_TRAJ", "none"))

    def run_fn(x0, model, plants, X_targ, U_targ, Q, R, keys, targ):
        res = batched_mpc(x0, model, plants, X_targ, U_targ, Q, R, Q,
                          config, SAT, du=DU, keys=keys)
        summ = fleet_summary(res, targ)
        nv = jnp.mean(res.n_valid.astype(jnp.float32))
        # single (3,) f32 output: the only thing that crosses the boundary
        return jnp.concatenate([
            jnp.reshape(summ["fidelity_mean"], (1,)),
            jnp.reshape(summ["completed_frac"], (1,)),
            jnp.reshape(nv, (1,)),
        ]).astype(jnp.float32)

    run = cx_jit(run_fn)
    args = (rho0, model, plants, X_targ, U_targ, Q, R, keys, targ)

    t0 = time.time()
    out = run(*args)
    print(f"compile+run: {time.time() - t0:.1f}s out={out}", flush=True)

    times = []
    for _ in range(3):
        t0 = time.time()
        out = run(*args)
        times.append(time.time() - t0)
    best = min(times)
    print(f"steady: {best * 1e3:.1f} ms -> {batch / best:.1f} rollouts/s", flush=True)
    print("PROBE_OK", out, flush=True)


if __name__ == "__main__":
    main()
