"""TPU probe: roofline / time-breakdown of the production rollouts
(VERDICT r4 item 3 - replace "latency-bound" prose with measured fractions).

Method: timed piecewise probes, all within ONE process (the axon tunnel has
no profiler):
  A. flagship (not_state, B=16384) fleet-rollout decomposition by
     budget-delta: full tuned form vs warm_sqp_iters=(1,1) vs steady 1x1
     ADMM. The deltas scale to per-SQP-iter / per-ADMM-iter costs; plant
     and linearize+condense are timed as standalone jitted programs at the
     same batch; dispatch = program count x calib_dispatch.
  B. component micro-benchmarks with analytic FLOP counts -> achieved
     FLOP/s vs the chip's ~49 TF/s f32 MXU peak:
       - small QP kernel (n=10, 20 unrolled ADMM iters) at B=16384
       - big QP kernel NS chain (n=50, ns=16) at B=1024
       - Riccati K-inverse (H=50, m=8, n=50) at B=1024
       - batched Taylor expm plant step (d=4) at B=16384

Writes everything to stdout; run with output redirected to
experiments/logs/r5_roofline.log.
"""
import os, sys, time, traceback

sys.path.insert(0, "/root/repo")
import numpy as np
import jax

jax.config.update("jax_default_matmul_precision", "highest")
try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
except Exception:
    pass

import jax.numpy as jnp

F32_PEAK = 49e12  # TPU v5e MXU, f32 (bf16 ~197 TF/s; matmul precision=highest)


def timed(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    return float(np.median(ts)), out


def part_a():
    from mpc4quantum_tpu import presets
    from mpc4quantum_tpu.benchfleet import run_hostloop_fleet
    from mpc4quantum_tpu.solvers.boxqp import BoxQPParams

    B = int(os.environ.get("PR_BATCH", "16384"))
    with jax.default_device(jax.devices("cpu")[0]):
        sc = presets.PRESETS["not_state"]()
    base_steady = BoxQPParams(
        max_iter=10, n_rounds=2, rho0=sc.config.qp_params.rho0,
        eps_abs=sc.config.qp_params.eps_abs,
        eps_rel=sc.config.qp_params.eps_rel,
        accept_abs=4e-3, accept_rel=4e-3, ns_iters=20,
        unroll=sc.config.qp_params.unroll, scale=False)
    variants = [
        ("full", {}),
        # 6 of 8 warm SQP iterations removed -> delta / 6 per warm iter
        ("warm_1_1", {"warm_sqp_iters": (1, 1)}),
        # 19 of 20 steady ADMM iterations removed -> delta / 19 per iter
        ("steady_1x1", {"steady_qp_params":
                        base_steady.replace(max_iter=1, n_rounds=1)}),
    ]
    res = {}
    for name, kw in variants:
        t0 = time.time()
        m, _ = run_hostloop_fleet(sc, B, reps=4, **kw)
        res[name] = B / m["rollouts_per_s_median"]
        print(f"[A {name:>10s}] {m['rollouts_per_s']:.0f} r/s "
              f"(med {m['rollouts_per_s_median']:.0f}) "
              f"run={res[name]*1e3:.0f}ms first={m['first_run_s']}s "
              f"fid={m['fidelity_mean']:.5f} wall={time.time()-t0:.0f}s",
              flush=True)
    t_full = res["full"]
    warm_iter = max(res["full"] - res["warm_1_1"], 0.0) / 6.0
    warm_share = warm_iter * 8.0
    steady_admm_iter = max(res["full"] - res["steady_1x1"], 0.0) / 19.0
    steady_admm_share = steady_admm_iter * 20.0
    print(f"[A] full={t_full*1e3:.0f}ms  warm(8 SQP iters)="
          f"{warm_share*1e3:.0f}ms ({100*warm_share/t_full:.0f}%)  "
          f"steady ADMM(20 it x 18 steps)={steady_admm_share*1e3:.0f}ms "
          f"({100*steady_admm_share/t_full:.0f}%)", flush=True)
    return t_full, B, sc


def part_b(t_full, B, sc):
    from mpc4quantum_tpu.ops.bilinear import BilinearModel, model_along_traj
    from mpc4quantum_tpu.solvers.condense import qp_data
    from mpc4quantum_tpu.ops.pallas_qp import boxqp_pallas
    from mpc4quantum_tpu.plants.quantum import QuantumPlant, quantum_step_taylor
    from mpc4quantum_tpu.solvers.boxqp import ns_inverse
    from mpc4quantum_tpu.utils.cxio import cx_jit

    H, du, dx = sc.config.horizon, sc.config.dim_u, 4
    n = H * du
    rng_us = np.random.default_rng(7)

    # flagship QP data, captured at step 0 on CPU, tiled to B lanes
    with jax.default_device(jax.devices("cpu")[0]):
        A = sc.model.A
        bm = BilinearModel.from_stacked(A[:, :dx], A[:, dx:], du,
                                        sc.config.order)
        lift_x = jnp.asarray(sc.x0)
        Xg = jnp.tile(lift_x[:, None], (1, H + 1))
        Ug = jnp.zeros((du, H))
        A_s, B_s, D_s = model_along_traj(bm, Xg[:, :H], Ug)
        Q_s = jnp.concatenate(
            [jnp.tile(sc.Q[None], (H, 1, 1)), sc.Qf[None]], axis=0)
        R_s = jnp.tile(sc.R[None], (H, 1, 1))
        P1, q1, lb1, ub1, w, M = qp_data(
            lift_x, sc.X_targ[:, :H + 1], sc.U_targ[:, :H], Q_s, R_s,
            A_s, B_s, D_s, u_prev=sc.U_targ[:, 0], sat=sc.sat, du=sc.du)
        P = np.tile(np.asarray(P1, np.float32)[None], (B, 1, 1))
        q = np.tile(np.asarray(q1, np.float32)[None], (B, 1))
        lb = np.tile(np.asarray(lb1, np.float32)[None], (B, 1))
        ub = np.tile(np.asarray(ub1, np.float32)[None], (B, 1))

    interp = bool(os.environ.get("PR_SMOKE"))
    # interpret-mode compile explodes superlinearly with unrolled program
    # length (CLAUDE.md r2) - smoke runs a 3-iter chain just for the API
    ITERS = 3 if interp else 20
    t_qp, _ = timed(lambda a, b, c, d: boxqp_pallas(a, b, c, d, iters=ITERS,
                                                    interpret=interp),
                    jnp.asarray(P), jnp.asarray(q), jnp.asarray(lb),
                    jnp.asarray(ub))
    # per ADMM iter: Kinv matvec 2n^2 + ~8n vector ops; + one-time
    # K build/inverse in-kernel ~ (2/3)n^3 (Gauss-Jordan) + P symmetrize
    flops_qp = B * (ITERS * (2 * n * n + 8 * n) + (2 / 3) * n ** 3 + n * n)
    print(f"[B qp_small n={n} B={B}] {t_qp*1e3:.1f}ms "
          f"{flops_qp/t_qp/1e9:.1f} GFLOP/s "
          f"({100*flops_qp/t_qp/F32_PEAK:.3f}% of f32 peak) "
          f"-> 26 solves/rollout = {26*t_qp*1e3:.0f}ms/fleet-run "
          f"({100*26*t_qp/t_full:.0f}% of full)", flush=True)

    # plant step (Taylor expm, d=4), 20 steps serial at B lanes
    with jax.default_device(jax.devices("cpu")[0]):
        plant = sc.plant
        H0 = np.asarray(plant.H0)
        H1 = np.asarray(plant.H1s)
        x0 = np.asarray(sc.x0)
    dt = sc.config.dt

    def plant20(H0re, H0im, H1re, H1im, xre, xim, us):
        p = QuantumPlant(H0=jax.lax.complex(H0re, H0im),
                         H1s=jax.lax.complex(H1re, H1im),
                         sigma=jnp.zeros(()))
        x = jax.lax.complex(xre, xim)

        def body(x, u):
            xn = jax.vmap(lambda xi, ui: quantum_step_taylor(p, xi, ui, dt))(
                x, u)
            return xn, ()

        x, _ = jax.lax.scan(body, x, us)
        return jnp.real(x), jnp.imag(x)

    f32 = lambda a: jnp.asarray(a, jnp.float32)
    xs = np.tile(x0[None], (B, 1))
    # varying controls: a constant u would let XLA hoist the loop-invariant
    # expm out of the scan and under-measure the plant
    us20 = jnp.asarray(rng_us.standard_normal((20, B, 1)) * 0.1, jnp.float32)
    t_plant, _ = timed(jax.jit(plant20), f32(H0.real), f32(H0.imag),
                       f32(H1.real), f32(H1.imag), f32(xs.real),
                       f32(xs.imag), us20)
    d = 4
    # taylor expm: ~(6+2*fixed_squarings(4)) complex (d,d) matmuls + 2 for
    # the sandwich; complex matmul = 4 real = 8 d^3 flops
    flops_plant = B * 20 * (16 * (8 * d ** 3))
    print(f"[B plant d={d} 20 steps B={B}] {t_plant*1e3:.1f}ms "
          f"{flops_plant/t_plant/1e9:.1f} GFLOP/s "
          f"({100*t_plant/t_full:.0f}% of full)", flush=True)

    # linearize + condense, 26 invocations at B lanes (per-lane vmap)
    # host-side constants (slicing the concrete arrays inside the trace
    # would stage them into tracers and break the np conversions)
    Xt_np = np.asarray(sc.X_targ)[:, :H + 1]
    Ut_np = np.asarray(sc.U_targ)[:, :H].astype(np.float32)
    Qs_np = np.asarray(Q_s)
    Rs_np = np.asarray(R_s).real.astype(np.float32)

    def lin26(Are, Aim, xre, xim):
        Alift = jax.lax.complex(Are, Aim)
        x = jax.lax.complex(xre, xim)

        def one(xi, Ai):
            bmi = BilinearModel.from_stacked(Ai[:, :dx], Ai[:, dx:],
                                             du, sc.config.order)
            Xgi = jnp.tile(xi[:, None], (1, H + 1))
            Ugi = jnp.zeros((du, H))
            A_s, B_s, D_s = model_along_traj(bmi, Xgi[:, :H], Ugi)
            Pp, qq, *_ = qp_data(
                xi, jax.lax.complex(f32(Xt_np.real), f32(Xt_np.imag)),
                jnp.asarray(Ut_np),
                jax.lax.complex(f32(Qs_np.real), f32(Qs_np.imag)),
                jnp.asarray(Rs_np),
                A_s, B_s, D_s, sat=sc.sat, unroll=True)
            return Pp, qq

        # serial data dependence between the 26 invocations (else XLA CSEs
        # the identical calls into one)
        acc = jnp.zeros((), jnp.float32)
        for _ in range(26):
            Pp, qq = jax.vmap(one)(x, Alift)
            acc = acc + jnp.sum(qq)
            x = x + (1e-30 * acc)
        return acc

    t_lin, _ = timed(jax.jit(lin26), f32(np.tile(np.asarray(A).real[None], (B, 1, 1))),
                     f32(np.tile(np.asarray(A).imag[None], (B, 1, 1))),
                     f32(xs.real), f32(xs.imag))
    print(f"[B lin+condense x26 B={B}] {t_lin*1e3:.1f}ms "
          f"({100*t_lin/t_full:.0f}% of full)", flush=True)

    # big-kernel inverse paths at freq size
    Bf, nf, Hf, mf = 1024, 50, 50, 8
    rng = np.random.default_rng(0)
    Af = np.tile((0.9 * np.eye(mf))[None, None], (Bf, Hf, 1, 1)).astype(np.float32)
    Bfm = rng.standard_normal((Bf, Hf, mf, 1)).astype(np.float32) * 0.3
    Qf_ = np.tile(np.eye(mf)[None], (Hf + 1, 1, 1)).astype(np.float32)
    Rf = np.full((Hf, 1, 1), 0.1, np.float32)
    from mpc4quantum_tpu.solvers.riccati import riccati_kinv_batch

    t_ric, kr = timed(
        jax.jit(lambda a, b: riccati_kinv_batch(
            a, b, jnp.asarray(Qf_), jnp.asarray(Rf),
            jnp.full((Bf,), 1.0, jnp.float32), 1e-6, unroll=True)),
        jnp.asarray(Af), jnp.asarray(Bfm))
    # backward: per step ~ 2 (m,m)@(m,n) + (m,m)@(m,m) + small; forward ~ 2
    flops_ric = Bf * Hf * (3 * 2 * mf * mf * nf + 2 * 2 * mf ** 3)
    K = np.tile(np.eye(nf, dtype=np.float32)[None] * 1.5, (Bf, 1, 1))
    t_ns, _ = timed(jax.jit(lambda k: ns_inverse(k, iters=16)), jnp.asarray(K))
    flops_ns = Bf * 16 * 2 * 2 * nf ** 3
    print(f"[B ns n={nf} iters=16 B={Bf}] {t_ns*1e3:.1f}ms "
          f"{flops_ns/t_ns/1e9:.1f} GFLOP/s "
          f"({100*flops_ns/t_ns/F32_PEAK:.2f}% of f32 peak)", flush=True)
    print(f"[B riccati H={Hf} m={mf} n={nf} B={Bf}] {t_ric*1e3:.1f}ms "
          f"{flops_ric/t_ric/1e9:.1f} GFLOP/s "
          f"({100*flops_ric/t_ric/F32_PEAK:.2f}% of f32 peak) "
          f"ns/riccati={t_ns/t_ric:.2f}x", flush=True)


def main():
    print("device:", jax.devices()[0], flush=True)
    from bench import device_calibration

    chain_ms, disp_ms = device_calibration()
    print(f"[calib] chain={chain_ms}ms dispatch={disp_ms}ms", flush=True)
    try:
        if os.environ.get("PR_SMOKE"):
            # CPU API smoke: skip the fleet decomposition, run part B tiny
            from mpc4quantum_tpu import presets

            with jax.default_device(jax.devices("cpu")[0]):
                sc = presets.PRESETS["not_state"]()
            part_b(1.0, int(os.environ.get("PR_BATCH", "16")), sc)
            print("PROBE_R5_ROOFLINE_SMOKE_OK", flush=True)
            return
        t_full, B, sc = part_a()
        # dispatch share: programs per run = init + 2 warm + 18/6 steady + 1
        n_prog = 1 + 2 + 3 + 1
        print(f"[A dispatch] ~{n_prog} programs x {disp_ms}ms = "
              f"{n_prog*disp_ms:.1f}ms ({100*n_prog*disp_ms/1e3/t_full:.1f}% "
              f"of full)", flush=True)
        part_b(t_full, B, sc)
    except Exception:
        traceback.print_exc()
        return
    print("PROBE_R5_ROOFLINE_DONE", flush=True)


if __name__ == "__main__":
    main()
