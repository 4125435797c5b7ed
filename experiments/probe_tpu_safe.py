"""TPU probe E: the matmul-only batched MPC step on the chip.

The safe configuration removes every construct whose *batched* lowering is
suspect on the axon backend: qp_backend="ns" (Newton-Schulz inverse +
fixed-iteration unrolled ADMM - no Cholesky/triangular solves, no
while_loop), sqp_unroll (no SQP while_loop), quantum_step_taylor with static
squarings (no LU solve, no fori_loop), unrolled condensing (no scan).
The driver loop runs on the HOST: two compiled programs (multi-SQP for steps
0-1, single-shot for steps 2+), carries device-resident as CxPairs.

Env: PB_BATCH (default 1024).
"""
import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, "/root/repo")

batch = int(os.environ.get("PB_BATCH", "1024"))

import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")

import mpc4quantum_tpu as m4q
from mpc4quantum_tpu.models.dmdc import dmdc_from_operator
from mpc4quantum_tpu.mpc.driver import make_mpc_step
from mpc4quantum_tpu.plants.quantum import quantum_step_taylor
from mpc4quantum_tpu.solvers.boxqp import BoxQPParams
from mpc4quantum_tpu.parallel.fleet import make_scenario_batch
from mpc4quantum_tpu.utils.cxio import split_cx, merge_cx, CxPair

SX = np.array([[0, 1], [1, 0]], dtype=complex)
SZ = np.array([[1, 0], [0, -1]], dtype=complex)
DT, H, N_STEPS, ORDER = 1.0, 10, 20, 2
SAT = 2 * np.pi * 0.1
DU = 0.5 * SAT
WQ = 2 * np.pi * 4

QP = BoxQPParams(max_iter=60, n_rounds=2)
CFG_WARM = m4q.MPCConfig(horizon=H, n_steps=N_STEPS, dt=DT, dim_u=1, order=ORDER,
                         traj_mode="none", qp_backend="ns", sqp_unroll=8,
                         single_shot=False, qp_params=QP)
CFG_STEADY = m4q.MPCConfig(horizon=H, n_steps=N_STEPS, dt=DT, dim_u=1, order=ORDER,
                           traj_mode="none", qp_backend="ns", sqp_unroll=1,
                           single_shot=True, qp_params=QP)


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


def build(batch_n):
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        units = matrix_units(2)
        A0 = m4q.vectorize_me(np.zeros((2, 2)), units)
        A1 = m4q.vectorize_me(0.5 * SX, units)
        A_dst = np.asarray(m4q.discretize_homogeneous([A0, A1], DT, ORDER))
        model = dmdc_from_operator(A_dst, 4, 4, A_dst.shape[1] - 4)
        base_plant = m4q.QuantumPlant.create(0.5 * (WQ * 0.99 - WQ) * SZ, [0.5 * SX])
        plants, keys = make_scenario_batch(jax.random.PRNGKey(0), base_plant, batch_n,
                                           detune_scale=0.01)
        plants = jax.tree.map(np.asarray, plants)
        keys = np.asarray(keys)

    rho0 = perturbed_rho0()
    targ = np.zeros(4, complex)
    targ[3] = 1.0
    X_targ = np.tile(targ[:, None], (1, N_STEPS + H + 1))
    U_targ = np.zeros((1, N_STEPS + H))
    Q = np.asarray(np.diag([1.0, 0, 0, 1]).astype(complex))
    R = np.eye(1) * (1e-2 / SAT**2)
    return model, plants, keys, rho0, X_targ, U_targ, Q, R


def make_carry0(rho0, U_targ, keys, batch_n, cdtype):
    x0 = np.tile(rho0[None, :], (batch_n, 1)).astype(cdtype)
    Xg = np.tile(rho0[None, :, None], (batch_n, 1, H + 1)).astype(cdtype)
    Ug = np.zeros((batch_n, 1, H), x0.real.dtype)
    u_last = np.tile(U_targ[None, :, 0], (batch_n, 1)).astype(x0.real.dtype)
    code = np.zeros((batch_n,), np.int32)
    done = np.zeros((batch_n,), bool)
    return (x0, x0.copy(), Xg, Ug, u_last, keys, code, done)


def make_prog(config):
    def run(carry_s, step, plants_s, model_s, Xt_s, Ut, Q_s_, R):
        carry = merge_cx(carry_s)
        plants = merge_cx(plants_s)
        model = merge_cx(model_s)
        Xt = merge_cx(Xt_s)
        Q = merge_cx(Q_s_)
        cdtype = Q.dtype
        Q_s = jnp.concatenate([jnp.tile(Q[None], (H, 1, 1)), Q[None]], axis=0)
        R_s = jnp.tile(jnp.asarray(R)[None], (H, 1, 1))
        step_fn = make_mpc_step(config, Q_s, R_s, SAT, DU,
                                plant_step_fn=quantum_step_taylor)

        def one(c, p):
            c_new, _, _ = step_fn(c, step, p, model, jnp.asarray(Xt, cdtype), jnp.asarray(Ut))
            return c_new

        carry_new = jax.vmap(one, in_axes=(0, 0))(carry, plants)
        return jax.tree.map(
            lambda x: CxPair(re=jnp.real(x), im=jnp.imag(x))
            if jnp.issubdtype(x.dtype, jnp.complexfloating) else x,
            carry_new,
        )

    return jax.jit(run)


def main():
    print("device:", jax.devices()[0], flush=True)
    model, plants, keys, rho0, X_targ, U_targ, Q, R = build(batch)
    cdtype = np.complex64 if jnp.zeros(0).dtype == jnp.float32 else np.complex128
    carry0 = make_carry0(rho0, U_targ, keys, batch, cdtype)
    args = (split_cx(plants), split_cx(model), split_cx(X_targ), U_targ, split_cx(Q), R)

    prog_warm = make_prog(CFG_WARM)
    prog_steady = make_prog(CFG_STEADY)

    def rollout(cs):
        for k in range(N_STEPS):
            prog = prog_warm if k <= 1 else prog_steady
            cs = prog(cs, np.asarray(k, np.int32), *args)
        jax.block_until_ready(cs[0].re)
        return cs

    t0 = time.time()
    cs = rollout(split_cx(carry0))
    compile_s = time.time() - t0
    fid = np.asarray(cs[0].re)[:, 3]
    codes = np.asarray(cs[6].astype(jnp.float32))
    print(f"compile+first: {compile_s:.1f}s", flush=True)
    print(f"fid_mean={fid.mean():.5f} fid_min={fid.min():.5f} "
          f"codes_nonzero={(codes != 0).sum()}", flush=True)

    times = []
    for _ in range(3):
        t0 = time.time()
        rollout(split_cx(carry0))
        times.append(time.time() - t0)
    best = min(times)
    print(f"steady: {best * 1e3:.1f} ms -> {batch / best:.1f} rollouts/s", flush=True)
    print("PROBE_E_OK", flush=True)


if __name__ == "__main__":
    main()
