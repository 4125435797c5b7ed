"""TPU probe C: escape routes around the broken batched scan.

Probe B established: vmap(scan(step)) raises UNIMPLEMENTED at execution even
with carry-only f32 boundary outputs. Stages here (each try/except'd so later
stages still run):

  C1: ONE batched MPC step as its own program (vmap inside jit), carry in/out
      through a real-only (CxPair) boundary. If this executes, C3 host-loops
      it 20x with device-resident carries - the chunked driver.
  C4: batched scan of length 2 (does ANY batched scan run?).
  C5: 20-step scan at batch=8 (is it batch size or batchedness?).

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
from mpc4quantum_tpu.parallel.fleet import make_scenario_batch
from mpc4quantum_tpu.utils.cxio import split_cx, merge_cx, CxPair

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


CONFIG = m4q.MPCConfig(horizon=H, n_steps=N_STEPS, dt=DT, dim_u=1, order=ORDER,
                       traj_mode="none")


def make_carry0(rho0, U_targ, keys, batch_n):
    """Host-side batched initial carry (the driver's flat 8-tuple)."""
    cdtype = np.complex64 if jnp.zeros(0).dtype == jnp.float32 else np.complex128
    x0 = np.tile(rho0[None, :], (batch_n, 1)).astype(cdtype)
    Xg = np.tile(rho0[None, :, None], (batch_n, 1, H + 1)).astype(cdtype)
    Ug = np.zeros((batch_n, 1, H), x0.real.dtype)
    u_last = np.tile(U_targ[None, :, 0], (batch_n, 1)).astype(x0.real.dtype)
    code = np.zeros((batch_n,), np.int32)
    done = np.zeros((batch_n,), bool)
    return (x0, x0.copy(), Xg, Ug, u_last, keys, code, done)


def run_batched_step(carry_s, step, plants_s, model_s, Xt_s, Ut, Q_s_, R):
    """jit body: merge CxPairs, build step_fn with arg-passed costs, vmap."""
    carry = merge_cx(carry_s)
    plants = merge_cx(plants_s)
    model = merge_cx(model_s)
    Xt = merge_cx(Xt_s)
    Q = merge_cx(Q_s_)
    cdtype = Q.dtype
    Q_s = jnp.concatenate([jnp.tile(Q[None], (H, 1, 1)), Q[None]], axis=0)
    R_s = jnp.tile(jnp.asarray(R)[None], (H, 1, 1))
    step_fn = make_mpc_step(CONFIG, Q_s, R_s, SAT, DU)

    def one(c, p):
        c_new, _, _ = step_fn(c, step, p, model, jnp.asarray(Xt, cdtype), jnp.asarray(Ut))
        return c_new

    carry_new = jax.vmap(one, in_axes=(0, 0))(carry, plants)
    return jax.tree.map(
        lambda x: CxPair(re=jnp.real(x), im=jnp.imag(x))
        if jnp.issubdtype(x.dtype, jnp.complexfloating) else x,
        carry_new,
    )


step_prog = jax.jit(run_batched_step)


def stage(name, fn):
    t0 = time.time()
    try:
        out = fn()
        print(f"{name} OK ({time.time() - t0:.1f}s): {out}", flush=True)
        return True
    except Exception as e:
        print(f"{name} FAIL ({time.time() - t0:.1f}s): {type(e).__name__}", flush=True)
        traceback.print_exc()
        return False


def main():
    print("device:", jax.devices()[0], flush=True)
    model, plants, keys, rho0, X_targ, U_targ, Q, R = build(batch)
    carry0 = make_carry0(rho0, U_targ, keys, batch)

    args_static = (split_cx(plants), split_cx(model), split_cx(X_targ), U_targ,
                   split_cx(Q), R)

    # --- C1: one batched step, fetch a little of the carry ---
    state = {}

    def c1():
        cs = step_prog(split_cx(carry0), np.asarray(0, np.int32), *args_static)
        re3 = np.asarray(cs[0].re)  # (batch, 4) f32/f64
        state["carry"] = cs
        return f"x_re mean={re3.mean():.4f} shape={re3.shape}"

    ok1 = stage("C1_batched_single_step", c1)

    # --- C3: host loop the same program 20x, device-resident carries ---
    if ok1:
        def c3():
            cs = step_prog(split_cx(carry0), np.asarray(0, np.int32), *args_static)
            for k in range(1, N_STEPS):
                cs = step_prog(cs, np.asarray(k, np.int32), *args_static)
            jax.block_until_ready(cs[0].re)
            fid = np.asarray(cs[0].re)[:, 3]
            code = np.asarray(cs[6].astype(jnp.float32))
            return f"fid_mean={fid.mean():.5f} fid_min={fid.min():.5f} codes_nonzero={(code != 0).sum()}"

        ok3 = stage("C3_host_loop_20_steps", c3)

        if ok3:
            def c3_timed():
                # warm start from compiled program; time steady-state
                times = []
                for _ in range(3):
                    t0 = time.time()
                    cs = step_prog(split_cx(carry0), np.asarray(0, np.int32), *args_static)
                    for k in range(1, N_STEPS):
                        cs = step_prog(cs, np.asarray(k, np.int32), *args_static)
                    jax.block_until_ready(cs[0].re)
                    times.append(time.time() - t0)
                best = min(times)
                return f"best={best * 1e3:.1f} ms -> {batch / best:.1f} rollouts/s"

            stage("C3_timing", c3_timed)

    # --- C4: batched scan, length 2 ---
    def c4():
        cfg2 = m4q.MPCConfig(horizon=H, n_steps=2, dt=DT, dim_u=1, order=ORDER,
                             traj_mode="none")

        def prog(carry_s, plants_s, model_s, Xt_s, Ut, Q_s_, R):
            carry = merge_cx(carry_s)
            plants = merge_cx(plants_s)
            model = merge_cx(model_s)
            Xt = merge_cx(Xt_s)
            Q = merge_cx(Q_s_)
            Q_s = jnp.concatenate([jnp.tile(Q[None], (H, 1, 1)), Q[None]], axis=0)
            R_s = jnp.tile(jnp.asarray(R)[None], (H, 1, 1))
            step_fn = make_mpc_step(cfg2, Q_s, R_s, SAT, DU)

            def one(c, p):
                def body(cc, k):
                    cn, _, _ = step_fn(cc, k, p, model, jnp.asarray(Xt, Q.dtype), jnp.asarray(Ut))
                    return cn, None
                cf, _ = jax.lax.scan(body, c, jnp.arange(2))
                return cf

            cf = jax.vmap(one)(carry, plants)
            return jnp.real(cf[0]).astype(jnp.float32)

        out = jax.jit(prog)(split_cx(carry0), *args_static)
        return f"mean={np.asarray(out).mean():.4f}"

    stage("C4_batched_scan_len2", c4)

    # --- C5: 20-step scan at batch=8 ---
    def c5():
        model8, plants8, keys8, rho08, Xt8, Ut8, Q8, R8 = build(8)
        carry8 = make_carry0(rho08, Ut8, keys8, 8)

        def prog(carry_s, plants_s, model_s, Xt_s, Ut, Q_s_, R):
            carry = merge_cx(carry_s)
            plants = merge_cx(plants_s)
            model = merge_cx(model_s)
            Xt = merge_cx(Xt_s)
            Q = merge_cx(Q_s_)
            Q_s = jnp.concatenate([jnp.tile(Q[None], (H, 1, 1)), Q[None]], axis=0)
            R_s = jnp.tile(jnp.asarray(R)[None], (H, 1, 1))
            step_fn = make_mpc_step(CONFIG, Q_s, R_s, SAT, DU)

            def one(c, p):
                def body(cc, k):
                    cn, _, _ = step_fn(cc, k, p, model, jnp.asarray(Xt, Q.dtype), jnp.asarray(Ut))
                    return cn, None
                cf, _ = jax.lax.scan(body, c, jnp.arange(N_STEPS))
                return cf

            cf = jax.vmap(one)(carry, plants)
            return jnp.real(cf[0]).astype(jnp.float32)

        out = jax.jit(prog)(split_cx(carry8), split_cx(plants8), split_cx(model8),
                            split_cx(Xt8), Ut8, split_cx(Q8), R8)
        return f"fid_mean={np.asarray(out)[:, 3].mean():.5f}"

    stage("C5_scan20_batch8", c5)

    print("PROBE_C_DONE", flush=True)


if __name__ == "__main__":
    main()
