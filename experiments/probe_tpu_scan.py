"""TPU probe B: the vmapped scan-of-MPC-steps with carry-only outputs and
NO result assembly (no complex concat, no einsum, no int outputs). Binary
question: does vmap(scan(step_fn)) itself execute on the chip?

Stages (each its own program; later stages only run if earlier ones pass):
  B1: vmap over PB_BATCH lanes of scan(step_fn), return re/im of final x.
  B2: B1 + fidelity reduction to (3,) f32 on device.

Env: PB_BATCH (default 1024).
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
from mpc4quantum_tpu.mpc.driver import make_mpc_step
from mpc4quantum_tpu.parallel.fleet import make_scenario_batch
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
    Q = np.asarray(np.diag([1.0, 0, 0, 1]).astype(complex))
    R = np.eye(1) * (1e-2 / SAT**2)
    config = m4q.MPCConfig(horizon=H, n_steps=N_STEPS, dt=DT, dim_u=1, order=ORDER,
                           traj_mode="none")

    def single_rollout_carry(x0, model_state, plant, X_targ, U_targ, Q, R, key):
        """The driver's scan with the flat 8-carry, NO trailing assembly."""
        cdtype = model_state.A.dtype
        Q_s = jnp.concatenate(
            [jnp.tile(jnp.asarray(Q, cdtype)[None], (H, 1, 1)),
             jnp.asarray(Q, cdtype)[None]], axis=0)
        R_s = jnp.tile(jnp.asarray(R)[None], (H, 1, 1))
        step_fn = make_mpc_step(config, Q_s, R_s, SAT, DU)
        lift_x0 = x0
        X_guess0 = jnp.tile(lift_x0[:, None].astype(cdtype), (1, H + 1))
        U_guess0 = jnp.zeros((1, H), X_guess0.real.dtype)
        Xt = jnp.asarray(X_targ, cdtype)
        Ut = jnp.asarray(U_targ)
        carry0 = (
            x0.astype(cdtype), x0.astype(cdtype), X_guess0, U_guess0,
            Ut[:, 0].astype(U_guess0.dtype), key,
            jnp.asarray(0, jnp.int32), jnp.asarray(False),
        )

        def body(carry, step):
            carry_new, _, _ = step_fn(carry, step, plant, model_state, Xt, Ut)
            return carry_new, None

        carry_f, _ = jax.lax.scan(body, carry0, jnp.arange(N_STEPS))
        return carry_f

    def b1(x0, model, plants, X_targ, U_targ, Q, R, keys):
        carry_f = jax.vmap(
            lambda p, k: single_rollout_carry(jnp.asarray(x0), model, p, X_targ, U_targ, Q, R, k)
        )(plants, keys)
        xf = carry_f[0]                      # (batch, 4) complex
        code = carry_f[6]                    # (batch,) int32
        return (jnp.real(xf).astype(jnp.float32),
                jnp.imag(xf).astype(jnp.float32),
                code.astype(jnp.float32))

    run1 = cx_jit(b1)
    args = (rho0, model, plants, X_targ, U_targ, Q, R, keys)
    t0 = time.time()
    re_f, im_f, code = run1(*args)
    print(f"B1 compile+run: {time.time() - t0:.1f}s", flush=True)
    fid = re_f[:, 3]
    print(f"B1 OK: fid_mean={fid.mean():.5f} fid_min={fid.min():.5f} "
          f"codes: {np.unique(code, return_counts=True)}", flush=True)

    times = []
    for _ in range(3):
        t0 = time.time()
        out = run1(*args)
        times.append(time.time() - t0)
    best = min(times)
    print(f"B1 steady: {best * 1e3:.1f} ms -> {batch / best:.1f} rollouts/s", flush=True)
    print("PROBE_B1_OK", flush=True)

    # B2: on-device reduction to (3,) f32
    def b2(x0, model, plants, X_targ, U_targ, Q, R, keys):
        re_f, im_f, code = b1(x0, model, plants, X_targ, U_targ, Q, R, keys)
        fid = re_f[:, 3]
        ok = (code == 0).astype(jnp.float32)
        return jnp.concatenate([
            jnp.reshape(jnp.mean(fid), (1,)),
            jnp.reshape(jnp.min(fid), (1,)),
            jnp.reshape(jnp.mean(ok), (1,)),
        ])

    run2 = cx_jit(b2)
    t0 = time.time()
    out2 = run2(*args)
    print(f"B2 compile+run: {time.time() - t0:.1f}s out={out2}", flush=True)
    print("PROBE_B2_OK", flush=True)


if __name__ == "__main__":
    main()
